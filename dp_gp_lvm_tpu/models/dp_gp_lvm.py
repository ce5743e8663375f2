r"""DP-GP-LVM — Dirichlet-process mixture over output dimensions.

(Lawrence, Ek & Campbell; SURVEY.md section 2a 'DP-GP-LVM', call stack 3.2.)
Each output dimension d carries a latent assignment z_d to one of T
truncation atoms; each atom t owns its own ARD-RBF hyperparameters, noise,
and inducing inputs, while all atoms share the latent posterior q(X). The
model therefore infers *groups of output dimensions with shared dependency
structure* through the atoms' ARD weights.

    ELBO = sum_{d,t} phi_dt F_dt                       (phi-weighted fits)
         + sum_d E_q[log p(z_d | v)] + H[q(z)]          (assignments)
         - KL[q(v) || p(v | alpha)]                     (sticks)
         - KL[q(X) || N(0, I)]                          (latents)

TPU mapping: the per-atom psi statistics, K_uu, Cholesky factorizations and
triangular solves are vmapped over T — XLA lowers them as batched MXU ops —
instead of the reference's per-atom graph unrolling. phi is optimized by
gradient (softmax logits) inside the same single jitted program; closed-form
CAVI updates for (gamma, phi) are provided as optional coordinate steps.

Params (unconstrained pytree):
    qx_mean (N, Q), raw_qx_var (N, Q),
    z (T, M, Q), raw_variance (T,), raw_ard (T, Q), raw_noise (T,),
    phi_logits (D, T), raw_gamma1 (T-1,), raw_gamma2 (T-1,).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.core.transforms import (
    positive,
    positive_inverse,
    positive_noise,
    positive_variational_var,
)
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.distributions import gaussian, stick_breaking
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.models.bound import (
    SuffStats,
    collapsed_bound,
    suff_stats_from_psi,
)
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.train.init import (
    inducing_from_latents,
    near_uniform_assignments,
    pca_latents,
)


class Config(NamedTuple):
    num_latent: int
    num_inducing: int
    truncation: int          # T
    alpha: float = 1.0       # DP concentration
    psi2_block: int | None = None
    # True | False | "auto": the fused Pallas psi2 fwd+bwd kernels beat
    # XLA once the (T, N, M, M) working set is large (measured 2.4x at
    # N=8192, M=128, T=20: 67 vs 163 ms/step); XLA's fusions win slightly
    # at small scale. "auto" switches on above ~5e8 tile elements.
    use_pallas: bool | str = "auto"
    kernel: str = "ard_rbf"
    fast_chol: bool = False    # skip the jitter search in the hot step
    hyperprior_std: float = 0.0    # log-normal prior on hypers (0 = off)
    learn_alpha: bool = False      # learnable DP concentration w/ Gamma prior


def init_params(rng, Y, config: Config):
    dtype = Y.dtype
    t, q = config.truncation, config.num_latent
    d = Y.shape[1]
    r_z, r_phi, r_hyp = jax.random.split(rng, 3)
    x0 = pca_latents(Y, q).astype(dtype)
    z0 = inducing_from_latents(r_z, x0, config.num_inducing)
    # small per-atom jitter on hypers breaks atom symmetry
    ard0 = jnp.ones((t, q), dtype) * (
        1.0 + 0.05 * jax.random.normal(r_hyp, (t, q), dtype)
    )
    params = {
        "qx_mean": x0,
        "raw_qx_var": positive_inverse(0.5 * jnp.ones_like(x0)),
        "z": jnp.broadcast_to(z0, (t,) + z0.shape).copy(),
        "raw_variance": positive_inverse(jnp.ones((t,), dtype)),
        "raw_ard": positive_inverse(jnp.maximum(ard0, 0.1)),
        "raw_noise": positive_inverse(jnp.full((t,), 0.1, dtype)),
        "phi_logits": near_uniform_assignments(r_phi, d, t).astype(dtype),
        "raw_gamma1": positive_inverse(jnp.ones((t - 1,), dtype)),
        "raw_gamma2": positive_inverse(
            jnp.full((t - 1,), config.alpha, dtype)
        ),
    }
    if config.learn_alpha:
        params["raw_alpha"] = positive_inverse(
            jnp.asarray(config.alpha, dtype)
        )
    return params


def constrain(params):
    out = {
        "qx_mean": params["qx_mean"],
        "qx_var": positive_variational_var(params["raw_qx_var"]),
        "z": params["z"],
        "variance": positive(params["raw_variance"]),
        "ard": positive(params["raw_ard"]),
        "noise": positive_noise(params["raw_noise"]),
        "phi": jax.nn.softmax(params["phi_logits"], axis=-1),
        # floor keeps digamma/gammaln away from the 0 pole in f32
        "gamma1": positive(params["raw_gamma1"], 1e-4),
        "gamma2": positive(params["raw_gamma2"], 1e-4),
    }
    if "raw_alpha" in params:
        out["alpha"] = positive(params["raw_alpha"], 1e-3)
    return out


def per_dim_atom_bound(
    hyp, Y, config: Config, policy: JitterPolicy = JitterPolicy()
):
    """F in R^{T x D}: per-atom, per-dimension collapsed free energies.

    vmapped over atoms: batched psi stats, batched chol/solves on the MXU.
    """
    if config.fast_chol:
        policy = JitterPolicy(max_tries=0)
    mu, s = hyp["qx_mean"], hyp["qx_var"]

    t_, m_ = hyp["z"].shape[0], hyp["z"].shape[1]
    use_pallas = config.use_pallas
    if use_pallas == "auto":
        use_pallas = (
            config.kernel == "ard_rbf"
            and t_ * Y.shape[0] * m_ * m_ > int(5e8)
        )
    if use_pallas and config.kernel == "ard_rbf":
        # atom-batched fused Psi2 kernel: one pallas_call with grid
        # (T, N/block) — vmapping the single-atom kernel would lift the
        # whole atom batch into VMEM at once (T x tile > 16 MB)
        import jax as _jax

        from dp_gp_lvm_tpu.ops.pallas.psi import (
            _fwd_block,
            suffstats_batched_fused,
        )

        interpret = _jax.default_backend() in ("cpu", "gpu")
        blk = config.psi2_block or _fwd_block(m_, Y.shape[0])
        # one kernel produces Psi2 AND Psi1^T Y per atom — the (T, N, M)
        # Psi1 tensor never materializes in HBM
        p2_all, p1y_all = suffstats_batched_fused(
            hyp["variance"], hyp["ard"], mu, s, hyp["z"], Y, None,
            blk, interpret,
        )
        n_const = jnp.asarray(Y.shape[0], Y.dtype)
        yty = jnp.sum(Y * Y, axis=0)

        # gram/psi0 per atom are cheap — vmap them; the bound algebra
        # runs ONE batched call so the speculative safe Cholesky keeps
        # a scalar fallback predicate (collapsed_bound docstring: the
        # vmapped jitter search was 77% of the bench-row step)
        def atom_pre(variance, ard, z):
            return (
                dispatch.gram(variance, ard, z, kernel=config.kernel),
                ard_rbf.psi0(variance, mu),
            )

        kuu_b, psi0_b = jax.vmap(atom_pre)(
            hyp["variance"], hyp["ard"], hyp["z"]
        )
        stats = SuffStats(psi0=psi0_b, psi1T_y=p1y_all, psi2=p2_all,
                          yty=yty, n=n_const)
        return collapsed_bound(
            kuu_b, stats, hyp["noise"], policy
        ).per_dim  # (T, D)

    def atom_stats(variance, ard, z):
        with jax.named_scope("psi_stats"):
            p0, p1, p2 = dispatch.psi_stats(
                variance, ard, mu, s, z, block_n=config.psi2_block,
                use_pallas=False, kernel=config.kernel,
            )
        with jax.named_scope("kuu_gram"):
            kuu = dispatch.gram(variance, ard, z, kernel=config.kernel)
        p1y = jnp.dot(p1.T, Y, precision=jax.lax.Precision.HIGHEST)
        return kuu, p0, p1y, p2

    kuu_b, p0_b, p1y_b, p2_b = jax.vmap(atom_stats)(
        hyp["variance"], hyp["ard"], hyp["z"]
    )
    with jax.named_scope("collapsed_bound"):
        # ONE batched bound call (not vmapped): see the pallas branch
        stats = SuffStats(
            psi0=p0_b, psi1T_y=p1y_b, psi2=p2_b,
            yty=jnp.sum(Y * Y, axis=0),
            n=jnp.asarray(Y.shape[0], Y.dtype),
        )
        return collapsed_bound(
            kuu_b, stats, hyp["noise"], policy
        ).per_dim  # (T, D)


def elbo_terms(params, Y, config: Config, policy: JitterPolicy = JitterPolicy()):
    hyp = constrain(params)
    f_td = per_dim_atom_bound(hyp, Y, config, policy)     # (T, D)
    phi = hyp["phi"]                                      # (D, T)
    fit = jnp.sum(phi * f_td.T)
    alpha = hyp.get("alpha", jnp.asarray(config.alpha, Y.dtype))
    dp = stick_breaking.dp_kl_terms(
        phi, hyp["gamma1"], hyp["gamma2"], alpha,
        logits=params["phi_logits"],
    )
    if "alpha" in hyp:
        dp = dp + stick_breaking.alpha_log_prior(alpha)
    kl_x = gaussian.kl_to_standard_normal(hyp["qx_mean"], hyp["qx_var"])
    from dp_gp_lvm_tpu.models.bgplvm import _log_normal_hyperprior

    hp = _log_normal_hyperprior(
        config.hyperprior_std, hyp["variance"], hyp["ard"], hyp["noise"]
    )
    return {
        "elbo": fit + dp - kl_x + hp,
        "hyperprior": hp,
        "fit": fit,
        "dp_terms": dp,
        "kl_x": kl_x,
        "f_td": f_td,
    }


def elbo(params, Y, config: Config, policy: JitterPolicy = JitterPolicy()):
    return elbo_terms(params, Y, config, policy)["elbo"]


def loss(params, Y, config: Config):
    return -elbo(params, Y, config)


def cavi_step(params, Y, config: Config, policy: JitterPolicy = JitterPolicy()):
    """Closed-form coordinate updates for (phi, gamma) at fixed other params.

    Returns params with phi_logits and raw_gamma replaced by their CAVI
    optima — usable interleaved with Adam steps on the remaining params.
    """
    hyp = constrain(params)
    alpha = hyp.get("alpha", jnp.asarray(config.alpha, Y.dtype))
    f_td = per_dim_atom_bound(hyp, Y, config, policy)
    phi = stick_breaking.phi_cavi_update(
        f_td.T, hyp["gamma1"], hyp["gamma2"]
    )
    g1, g2 = stick_breaking.gamma_cavi_update(phi, alpha)
    out = dict(params)
    out["phi_logits"] = jnp.log(jnp.maximum(phi, 1e-30))
    out["raw_gamma1"] = positive_inverse(g1)
    out["raw_gamma2"] = positive_inverse(g2)
    if "raw_alpha" in params:
        out["raw_alpha"] = positive_inverse(
            stick_breaking.alpha_cavi_update(g1, g2)
        )
    return out


def expected_assignments(params):
    """phi (D, T): posterior over output-dimension group assignments."""
    return jax.nn.softmax(params["phi_logits"], axis=-1)
