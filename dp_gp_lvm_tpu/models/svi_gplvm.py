r"""Stochastic (minibatch) variational GP-LVM — the uncollapsed Hensman
bound, whitened.

Beyond-reference capability: the reference (and every collapsed model in
this package — SURVEY.md sections 3.4, 5 "long-context") evaluates the
Titsias bound from FULL-batch sufficient statistics, so one step touches
all N rows. This module keeps an explicit q(u) so the bound decomposes
over data rows and trains from minibatches: per-step cost O(B M^2),
independent of N. N then scales past both HBM and step-time limits on a
single chip (and multiplies with the shard_map data axis).

Math (Hensman et al. 2013, adapted to latent inputs with q(X); whitened
u = L v with L = chol(K_uu), q(v_d) = N(m_d, S) — one S shared across
output dims, which is EXACTLY optimal for homoskedastic noise):

    fit_d = -n/2 log(2 pi s2) - beta/2 [ yty_d - 2 m_d^T a_d
            + m_d^T A2 m_d + tr(S A2) + psi0 - tr(A2) ]
    KL_u  = sum_d 1/2 [ ||m_d||^2 - M ] + D/2 [ tr(S) - logdet S ]
    ELBO  = sum_d fit_d - KL_u - KL(q(X) || N(0, I))

with a = L^{-1} Psi1^T Y and A2 = L^{-1} Psi2 L^{-T} — both assembled
from the SAME SuffStats as the collapsed path (models/bound.py), so the
psi dispatch (ops/dispatch.py) and the shard_map psum story carry over
unchanged. Every data term is a sum over rows: a minibatch estimate just
scales the batch SuffStats (and the batch rows' KL(q(X))) by N/B, which
makes the estimator exactly unbiased (and exact for a disjoint
partition: the mean over the partition's batch bounds equals the
full-batch bound — tests/test_svi.py pins this as an identity).

Closed-form optimum at full-batch stats (the oracle that ties this
module to the collapsed bound): S* = (I + beta A2)^{-1},
m* = beta S* a. Plugging (m*, S*) into the whitened bound recovers the
Titsias collapsed bound exactly — `set_optimal_qu` + the equality test
in tests/test_svi.py.
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
from dp_gp_lvm_tpu.distributions import gaussian
from dp_gp_lvm_tpu.linalg import safe_cholesky, tri_solve
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.train.init import inducing_from_latents, pca_latents

_HIGHEST = lax.Precision.HIGHEST


class Config(NamedTuple):
    """Static model hyperparameters (hashable; safe to close over)."""

    num_latent: int
    num_inducing: int
    batch: int = 256               # minibatch rows per step
    psi2_block: int | None = None
    use_pallas: bool | str = "auto"
    kernel: str = "ard_rbf"
    fast_chol: bool = False
    # amortized=True replaces the free N x Q q(X) table with a shared
    # recognition network q(x_n) = N(mu_w(y_n), s_w(y_n)) — O(encoder)
    # variational state instead of O(N) (models/amortized.py);
    # encoder_hidden=0 is the pure-linear (back-constraint) encoder
    amortized: bool = False
    encoder_hidden: int = 64
    # Lower bound on the noise VARIANCE (0.0 = just the f32 MIN_NOISE
    # floor). Needed in amortized mode: a shared encoder can memorize
    # y->x and drive the noise to its 1e-6 floor, which (a) overfits
    # (held-out imputation degrades ~10x, measured on c8) and (b) makes
    # the f32 bound a difference of beta~1e6-scale terms — catastrophic
    # cancellation, elbo estimates oscillating at +-1e8. A 1e-3 floor
    # on unit-standardized data bounds beta at 1e3 and keeps the
    # encoder's posterior honest.
    noise_floor: float = 0.0
    # Additive lower bound on the AMORTIZED q(X) variance (resident
    # tables are untouched). Collapsed encoder variances (~1e-4; the
    # shared enc_bs head drives one tiny value for every row) make the
    # batch psi statistics hyper-local and the stochastic natgrad q(u)
    # recursion divergent at c8 scale — a floor ~1e-2 restores the
    # smoothing the resident path keeps naturally, and remains a valid
    # ELBO (a restriction of the variational family).
    qx_var_floor: float = 0.0


def init_params(rng, Y, config: Config):
    """PCA latents (full N), k-ish inducing from latents, whitened q(u)
    at the prior (m=0, S=I). amortized=True swaps the q(X) table for
    encoder leaves whose initial encode(Y) EQUALS the resident init
    (PCA means, 0.5 variances — models/amortized.init_encoder)."""
    dtype = Y.dtype
    m, q, d = config.num_inducing, config.num_latent, Y.shape[1]
    # fold_in (not a split) keeps z0 bit-identical to the pre-amortized
    # init while giving the encoder its own independent stream.
    r_enc = jax.random.fold_in(rng, 7)
    x0 = pca_latents(Y, q).astype(dtype)
    z0 = inducing_from_latents(rng, x0, m)
    from dp_gp_lvm_tpu.models import amortized

    return {
        **amortized.qx_leaves_or_encoder(r_enc, Y, q, config),
        "z": z0,
        "raw_variance": positive_inverse(jnp.asarray(1.0, dtype)),
        "raw_ard": positive_inverse(jnp.ones((q,), dtype)),
        "raw_noise": positive_inverse(jnp.asarray(0.1, dtype)),
        # whitened q(u): mean (M, D); S = Ls Ls^T with Ls = tril(raw),
        # diag through softplus (init S = I)
        "u_mean": jnp.zeros((m, d), dtype),
        "raw_u_scale": jnp.zeros((m, m), dtype)
        + jnp.eye(m, dtype=dtype) * positive_inverse(
            jnp.asarray(1.0, dtype)
        ),
    }


def constrain(params, config: Config | None = None):
    """config is optional for external/test callers (floor = MIN_NOISE);
    model-internal paths pass it so Config.noise_floor binds."""
    raw = params["raw_u_scale"]
    ls = jnp.tril(raw, -1) + jnp.diag(positive(jnp.diagonal(raw)))
    floor = config.noise_floor if config is not None else 0.0
    floor = max(floor, MIN_NOISE) if floor else 0.0
    c = {
        "z": params["z"],
        "variance": positive(params["raw_variance"]),
        "ard": positive(params["raw_ard"]),
        "noise": (positive(params["raw_noise"], floor)
                  if floor else positive_noise(params["raw_noise"])),
        "u_mean": params["u_mean"],
        "u_scale": ls,                # chol factor of whitened S
    }
    if "qx_mean" in params:           # resident q(X) table
        c["qx_mean"] = params["qx_mean"]
        c["qx_var"] = positive_variational_var(params["raw_qx_var"])
    has_encoder = False
    for k in params:                  # recognition-network leaves pass
        if k.startswith("enc_"):      # through raw (unconstrained)
            c[k] = params[k]
            has_encoder = True
    if has_encoder and config is not None:
        qx_floor = getattr(config, "qx_var_floor", 0.0)
        if qx_floor:
            c["enc_var_floor"] = qx_floor   # static; amortized.encode
    return c


def _qx_batch(c, y, idx):
    """q(X) moments for data rows: a table gather (resident mode) or a
    recognition-network forward pass (amortized mode — the mode is read
    off the constrained dict, so every bound/serving path below works
    for both). idx=None means "all rows of y" (full-batch paths)."""
    from dp_gp_lvm_tpu.models import amortized

    return amortized.qx_batch(c, y, idx)


def _whitened_terms(c, stats, policy, kernel: str = "ard_rbf"):
    """(a, A2, L) from SuffStats in whitened coordinates. kernel must
    match the SuffStats' kernel (config.kernel) — K_uu and the psi
    statistics must describe the same prior or the whitening is
    inconsistent."""
    kuu = dispatch.gram(c["variance"], c["ard"], c["z"], kernel=kernel)
    L, _ = safe_cholesky(kuu, policy)
    a = tri_solve(L, stats.psi1T_y)                    # (M, D)
    half = tri_solve(L, stats.psi2)
    A2 = tri_solve(L, half.T)                          # (M, M), symmetric
    A2 = 0.5 * (A2 + A2.T)
    return a, A2, L


def _bound_from_stats(c, stats, kl_x, policy, kernel: str = "ard_rbf"):
    """Whitened Hensman bound given (possibly scaled) SuffStats and the
    matching (possibly scaled) KL(q(X)) contribution."""
    bound, _, _ = _bound_and_whitened(c, stats, kl_x, policy, kernel)
    return bound


def _bound_and_whitened(c, stats, kl_x, policy, kernel: str = "ard_rbf"):
    """(bound, a, A2): the bound plus the whitened statistics it was
    built from — lets a natural-gradient step reuse the gradient pass's
    psi statistics instead of recomputing them (blend_at="grad")."""
    beta = 1.0 / c["noise"]
    a, A2, L = _whitened_terms(c, stats, policy, kernel)
    mu, ls = c["u_mean"], c["u_scale"]                 # (M, D), (M, M)
    d = mu.shape[1]
    s_diag_chol = jnp.diagonal(ls)

    log2pi = jnp.log(2.0 * jnp.pi).astype(mu.dtype)
    tr_sa2 = jnp.sum(
        jnp.dot(A2, ls, precision=_HIGHEST) * ls
    )                                                  # tr(S A2)
    quad = jnp.sum(mu * jnp.dot(A2, mu, precision=_HIGHEST), axis=0)
    # tr(S A2), psi0 and tr(A2) are the GP conditional-variance
    # correction — identical for every output dim, so they appear once
    # PER DIM in the bound:
    shared = (
        -0.5 * stats.n * (log2pi + jnp.log(c["noise"]))
        - 0.5 * beta * (tr_sa2 + stats.psi0 - jnp.trace(A2))
    )
    per_dim = shared + (
        -0.5 * beta * (stats.yty - 2.0 * jnp.sum(mu * a, axis=0) + quad)
    )

    kl_u = (
        0.5 * jnp.sum(mu * mu)
        + 0.5 * d * (
            jnp.sum(ls * ls) - mu.shape[0]
            - 2.0 * jnp.sum(jnp.log(s_diag_chol))
        )
    )
    return jnp.sum(per_dim) - kl_u - kl_x, a, A2


def elbo_minibatch(
    params, y_batch, idx, n_total: int, config: Config,
    policy: JitterPolicy | None = None,
):
    """Unbiased minibatch estimate of the full-data ELBO.

    y_batch: (B, D) rows of Y; idx: (B,) their row indices (for the q(X)
    gather); n_total: static N. All row-sum terms (SuffStats and the
    batch rows' KL(q(X))) scale by N/B.
    """
    policy = policy or JitterPolicy()
    if config.fast_chol:
        policy = policy._replace(max_tries=0)
    c = constrain(params, config)
    mu_b, s_b = _qx_batch(c, y_batch, idx)
    scale = jnp.asarray(n_total / y_batch.shape[0], y_batch.dtype)
    stats = dispatch.suff_stats(
        c["variance"], c["ard"], mu_b, s_b, c["z"], y_batch,
        block_n=config.psi2_block, use_pallas=config.use_pallas,
        kernel=config.kernel,
    )
    stats = stats._replace(
        psi0=stats.psi0 * scale,
        psi1T_y=stats.psi1T_y * scale,
        psi2=stats.psi2 * scale,
        yty=stats.yty * scale,
        n=stats.n * scale,
    )
    kl_x = scale * gaussian.kl_to_standard_normal(mu_b, s_b)
    return _bound_from_stats(c, stats, kl_x, policy, config.kernel)


def elbo(params, Y, config: Config, policy: JitterPolicy | None = None):
    """Full-batch whitened Hensman bound (testing / small N)."""
    policy = policy or JitterPolicy()
    if config.fast_chol:
        policy = policy._replace(max_tries=0)
    c = constrain(params, config)
    mu, s = _qx_batch(c, Y, None)
    stats = dispatch.suff_stats(
        c["variance"], c["ard"], mu, s, c["z"], Y,
        block_n=config.psi2_block, use_pallas=config.use_pallas,
        kernel=config.kernel,
    )
    kl_x = gaussian.kl_to_standard_normal(mu, s)
    return _bound_from_stats(c, stats, kl_x, policy, config.kernel)


def loss(params, Y, config: Config):
    return -elbo(params, Y, config)


def loss_minibatch(params, y_batch, idx, n_total: int, config: Config):
    return -elbo_minibatch(params, y_batch, idx, n_total, config)


def optimal_qu(params, Y, config: Config, policy: JitterPolicy | None = None):
    """Closed-form optimal whitened q(u) at FULL-batch statistics:
    S* = (I + beta A2)^{-1}, m* = beta S* a. Returns (m*, chol(S*))."""
    policy = policy or JitterPolicy()
    c = constrain(params, config)
    mu, s = _qx_batch(c, Y, None)
    stats = dispatch.suff_stats(
        c["variance"], c["ard"], mu, s, c["z"], Y,
        block_n=config.psi2_block, use_pallas=config.use_pallas,
        kernel=config.kernel,
    )
    beta = 1.0 / c["noise"]
    a, A2, _ = _whitened_terms(c, stats, policy, config.kernel)
    return optimal_qu_from_whitened(a, A2, beta)


def optimal_qu_from_whitened(a, A2, beta):
    """Closed-form optimal whitened q(u) from whitened statistics
    (a, A2) and precision beta: S* = (I + beta A2)^{-1}, m* = beta S* a.
    Shared with the multi-view SVI path (models/mrd_svi.py)."""
    m = A2.shape[0]
    # B = I + beta A2 has eigenvalues >= 1 — always PD, so chol it
    # UNJITTERED: the oracle identity (Hensman(m*, S*) == collapsed
    # bound) needs S* to invert exactly the B the bound's terms imply;
    # a jittered inverse leaves an O(jitter)-relative gap.
    B = jnp.eye(m, dtype=A2.dtype) + beta * A2
    LB = jnp.linalg.cholesky(B)
    eye = jnp.eye(m, dtype=A2.dtype)
    b_inv = tri_solve(LB, eye)
    s_star = jnp.dot(b_inv.T, b_inv, precision=_HIGHEST)   # B^{-1}
    ls_star = jnp.linalg.cholesky(s_star)
    m_star = beta * jnp.dot(s_star, a, precision=_HIGHEST)
    return m_star, ls_star


def set_optimal_qu(params, Y, config: Config):
    """Return params with q(u) set to the full-batch optimum (useful as
    a warm start and for the collapsed-bound equality oracle)."""
    m_star, ls_star = optimal_qu(params, Y, config)
    diag = jnp.diagonal(ls_star)
    raw = jnp.tril(ls_star, -1) + jnp.diag(positive_inverse(diag))
    return {**params, "u_mean": m_star, "raw_u_scale": raw}


def _latent_row_pieces(c, L, x_mean, x_var, config: Config):
    """Per-row psi-moment contractions shared by every q(u)-serving path
    (single-view predict/infer and the multi-view mrd_svi paths):

      phi    (N*, M): whitened feature L^{-1} psi1_n per row
      gp_var (N*,)  : E[k_nn] - tr(A2_n) + tr(S A2_n) — the GP
                      conditional-variance correction (dim-independent)
      m_quad (N*, D): m_d^T A2_n m_d

    with A2_n = L^{-1} Psi2_n L^{-T} the per-row second-moment tile."""
    p0, p1, _ = dispatch.psi_stats(
        c["variance"], c["ard"], x_mean, x_var, c["z"],
        use_pallas=False, kernel=config.kernel,
    )
    phi = tri_solve(L, p1.T).T                       # (N*, M)
    ls = c["u_scale"]
    mu_u = c["u_mean"]

    def row_pieces(mu_n, s_n):
        _, _, p2n = dispatch.psi_stats(
            c["variance"], c["ard"], mu_n[None], s_n[None], c["z"],
            use_pallas=False, kernel=config.kernel,
        )
        half = tri_solve(L, p2n)
        a2n = tri_solve(L, half.T)                   # (M, M)
        t_s = jnp.sum(jnp.dot(a2n, ls, precision=_HIGHEST) * ls)
        t_m = jnp.sum(
            mu_u * jnp.dot(a2n, mu_u, precision=_HIGHEST), axis=0
        )                                            # (D,)
        return t_s - jnp.trace(a2n), t_m

    gp_var, m_quad = jax.vmap(row_pieces)(x_mean, x_var)  # (N*,), (N*, D)
    k_diag = dispatch.expected_gram_diag(
        c["variance"], c["ard"], x_mean, x_var, kernel=config.kernel
    )                                                # per-row E[k_nn]
    return phi, gp_var + k_diag, m_quad


def predict_from_latent(params, x_mean, x_var, config: Config,
                        policy: JitterPolicy | None = None):
    """Predictive mean/variance at q(x*) = N(x_mean, diag(x_var)) rows,
    directly from the explicit q(u) (no training data needed)."""
    policy = policy or JitterPolicy()
    c = constrain(params, config)
    kuu = dispatch.gram(c["variance"], c["ard"], c["z"],
                        kernel=config.kernel)
    L, _ = safe_cholesky(kuu, policy)
    # Psi-moment predictive variance (exact under q(x*)):
    #   Var_nd = sigma^2 + E[k_nn] - tr(A2_n) + tr(S A2_n)
    #            + m_d^T A2_n m_d - (phi_n^T m_d)^2
    phi, gp_var, m_quad = _latent_row_pieces(c, L, x_mean, x_var, config)
    mean = jnp.dot(phi, c["u_mean"], precision=_HIGHEST)
    # m_quad - mean^2 = m^T (A2 - phi phi^T) m >= 0 mathematically, but
    # f32 cancellation can drive the sum below 0; the true predictive
    # variance is >= noise, so flooring at noise is exact-on-math and
    # keeps gaussian_predictive_loglik finite (round-3 weak-3 audit).
    var = gp_var[:, None] + m_quad - mean * mean + c["noise"]
    return mean, jnp.maximum(var, c["noise"])


def make_svi_step(config: Config, n_total: int, optimizer):
    """One jitted SVI step: sample a batch (with replacement), estimate
    the ELBO gradient, update. Returns step(state, rng, Y) -> (state,
    metrics); Y stays resident on device, rows are gathered by index."""
    import optax

    from dp_gp_lvm_tpu.train.loop import TrainState

    def step(state: TrainState, rng, Y):
        # int32 pinned so the minibatch sequence is x64-invariant
        idx = jax.random.randint(
            rng, (config.batch,), 0, n_total, dtype=jnp.int32
        )
        y_b = Y[idx]
        loss_v, grads = jax.value_and_grad(
            lambda p: loss_minibatch(p, y_b, idx, n_total, config)
        )(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss_v, "elbo_estimate": -loss_v},
        )

    return jax.jit(step)


def infer_latent(
    params, y_star, mask, m_init, config: Config,
    num_steps: int = 200, lr: float = 0.05, tol: float | None = None,
    policy: JitterPolicy | None = None,
):
    """Optimize q(x*) = N(m*, diag(s*)) for new rows against the masked
    expected log-likelihood under the explicit q(u) — the SVI analogue
    of prediction.infer_latent (same Adam-in-scan machinery, including
    tol early stopping). mask is (N*, D), 1 = observed."""
    from dp_gp_lvm_tpu.models.prediction import _fit_variational

    policy = policy or JitterPolicy()
    c = constrain(params, config)
    kuu = dispatch.gram(c["variance"], c["ard"], c["z"],
                        kernel=config.kernel)
    L, _ = safe_cholesky(kuu, policy)
    mu_u = c["u_mean"]
    beta = 1.0 / c["noise"]
    log2pi = jnp.log(2.0 * jnp.pi).astype(y_star.dtype)
    dtype = y_star.dtype
    var_params = {
        "m": m_init.astype(dtype),
        "raw_s": positive_inverse(0.1 * jnp.ones_like(m_init)).astype(dtype),
    }

    def objective(vp):
        s = positive_variational_var(vp["raw_s"])
        # E[(y - f)^2] = y^2 - 2 y E[f] + E[f^2];  E[f^2] = m_quad +
        # the dim-independent conditional-var correction gp_var
        # (masked rows only pay for observed dims via the mask weights)
        phi, gp_var, m_quad = _latent_row_pieces(c, L, vp["m"], s, config)
        f_mean = jnp.dot(phi, mu_u, precision=_HIGHEST)  # (N*, D)
        sq = (
            y_star * y_star - 2.0 * y_star * f_mean + m_quad
            + gp_var[:, None]
        )
        ell = jnp.sum(
            mask * (-0.5 * (log2pi + jnp.log(c["noise"])) - 0.5 * beta * sq)
        )
        kl = gaussian.kl_to_standard_normal(
            vp["m"], s
        )
        return -(ell - kl)

    vp, trace, _ = _fit_variational(objective, var_params, num_steps, lr, tol)
    return vp["m"], positive_variational_var(vp["raw_s"]), -trace


def impute(
    params, y_star, mask, config: Config,
    num_steps: int = 200, lr: float = 0.05, tol: float | None = None,
):
    """Missing-data pipeline for SVI-GPLVM: infer q(x*) from observed
    dims, predict all dims from q(u). Returns (mean, var, m*, s*,
    objective trace)."""
    m0 = _nearest_latent_init(params, y_star, mask, config)
    m_s, s_s, trace = infer_latent(
        params, y_star, mask, m0, config, num_steps, lr, tol
    )
    mean, var = predict_from_latent(params, m_s, s_s, config)
    return mean, var, m_s, s_s, trace


def _nearest_latent_init(params, y_star, mask, config: Config):
    """Init q(x*) means from the training latent whose q(u)-predicted
    mean best matches the observed dims. O(N_sub M) with an N-capped
    subsample of the latent table (no training Y needed — SVI serves
    from q(u) alone).

    Amortized mode has no table — and doesn't need one: the recognition
    network IS one-pass latent inference. Missing dims are filled with
    the encoder's center `enc_mean`, so after centering they contribute
    exactly zero to the forward pass (the back-constraint analogue of
    conditioning on observed dims only)."""
    c = constrain(params, config)
    if "qx_mean" not in c:
        from dp_gp_lvm_tpu.models import amortized

        return amortized.encoder_fill_init(c, y_star, mask)
    qx = c["qx_mean"]
    n = qx.shape[0]
    take = jnp.arange(0, n, max(1, n // 4096))     # cap the candidate set
    cand = qx[take]
    cand_var = c["qx_var"][take]
    mean, _ = predict_from_latent(params, cand, cand_var, config)
    d2 = jnp.sum(
        ((y_star[:, None, :] - mean[None, :, :]) ** 2) * mask[:, None, :],
        axis=-1,
    )
    return cand[jnp.argmin(d2, axis=1)]


def _natural_from_params(c):
    """Whitened q(u) natural parameters from constrained values:
    Lambda = S^{-1} (via triangular inverse of the chol factor),
    h = Lambda m."""
    ls = c["u_scale"]
    m = ls.shape[0]
    eye = jnp.eye(m, dtype=ls.dtype)
    ls_inv = tri_solve(ls, eye)                     # Ls^{-1}
    lam = jnp.dot(ls_inv.T, ls_inv, precision=_HIGHEST)   # S^{-1}
    h = jnp.dot(lam, c["u_mean"], precision=_HIGHEST)
    return h, lam


def _params_from_natural(h, lam):
    """(u_mean, raw_u_scale) from natural parameters: S = Lambda^{-1}
    via cholesky, m = S h. Lambda is PD by construction (a convex
    combination of PD matrices)."""
    m = lam.shape[0]
    l_lam = jnp.linalg.cholesky(0.5 * (lam + lam.T))
    eye = jnp.eye(m, dtype=lam.dtype)
    l_inv = tri_solve(l_lam, eye)
    s = jnp.dot(l_inv.T, l_inv, precision=_HIGHEST)       # Lambda^{-1}
    ls = jnp.linalg.cholesky(0.5 * (s + s.T))
    u_mean = jnp.dot(s, h, precision=_HIGHEST)
    diag = jnp.diagonal(ls)
    raw = jnp.tril(ls, -1) + jnp.diag(positive_inverse(diag))
    return u_mean, raw


def _scaled_batch_stats(c, y_b, idx, n_total, config: Config):
    """(N/B)-scaled SuffStats and q(X)-KL for a batch, from constrained
    params — the common core of the minibatch bound and natgrad blend."""
    mu_b, s_b = _qx_batch(c, y_b, idx)
    scale = jnp.asarray(n_total / y_b.shape[0], y_b.dtype)
    stats = dispatch.suff_stats(
        c["variance"], c["ard"], mu_b, s_b, c["z"], y_b,
        block_n=config.psi2_block, use_pallas=config.use_pallas,
        kernel=config.kernel,
    )
    stats = stats._replace(
        psi0=stats.psi0 * scale, psi1T_y=stats.psi1T_y * scale,
        psi2=stats.psi2 * scale, yty=stats.yty * scale,
        n=stats.n * scale,
    )
    kl_x = scale * gaussian.kl_to_standard_normal(mu_b, s_b)
    return stats, kl_x


def natgrad_blend_qu(u_mean, ls, a, A2, beta, rho,
                     policy: JitterPolicy | None = None,
                     trust: float | None = None):
    r"""One natural-gradient step of length rho on the whitened q(u),
    computed WITHOUT ever forming the natural parameters.

    The textbook update blends naturals toward the batch optimum,

        Lambda' = (1-rho) Lambda + rho Bhat,   Bhat = I + beta A2
        h'      = (1-rho) h      + rho beta a,

    but Lambda = S^{-1} scales with beta * N (the posterior precision of
    well-observed directions), so at big-N SVI scale cond(Lambda)
    exceeds f32's ~1e7 Cholesky limit and the naive
    naturals -> blend -> invert chain (round-3 c8) fails or returns
    garbage, poisoning q(u) for the rest of the run.

    Identical algebra, conditioned by sandwiching with the current
    factor ls (S = ls ls^T, so ls^T Lambda ls = I):

        C   = ls^T Lambda' ls = (1-rho) I + rho ls^T Bhat ls
        S'  = Lambda'^{-1}    = ls C^{-1} ls^T
        m'  = S' h' = m + rho ls C^{-1} ls^T (beta a - Bhat m)

    (the m' line uses (1-rho) Lambda = Lambda' - rho Bhat, so
    S' h' = m + rho S' (beta a - Bhat m) — an INCREMMENT form whose
    every intermediate is bounded by the batch statistics: no ls^{-1},
    no 1/s-scale amplitudes, and the update's rounding error scales
    with the natural-gradient increment, vanishing at the fixed point
    beta a = Bhat m instead of persisting at state scale.)

    Near the fixed point ls^T Bhat ls ~ I, so cond(C) ~ 1 regardless of
    beta * N; every op is a product with f32-representable matrices or
    a solve against the well-conditioned C. S' is re-triangularized
    through the QR of X = Lc^{-1} ls^T (S' = X^T X = R^T R) —
    backward-stable at any conditioning, unlike a direct Cholesky of
    the formed S'.

    trust (None = exact natural gradient, the default — every
    exactness oracle runs with None): a trust region against
    pathological batches, needed by the AMORTIZED big-N runs where a
    single batch whose psi mass hits K_uu's near-null directions emits
    a whitened target 1e4 x the steady state. A precision-domain EMA is
    brutally asymmetric — one such batch shrinks S by that same factor
    instantly while recovery takes ~1/rho steps, and the m-recursion
    diverges meanwhile (measured: experiments/debug_c8.py). The
    sandwiched target G = ls^T Bhat ls is ~I at the fixed point, so a
    static cap is meaningful there (unlike on Bhat itself, whose scale
    is beta*N): G is scaled to RMS-eigenvalue <= trust, and the m
    increment to ||dm|| <= trust * (1 + ||m||).

    Returns (u_mean', raw_u_scale') ready to store.
    """
    policy = policy or JitterPolicy()
    m = ls.shape[0]
    eye = jnp.eye(m, dtype=ls.dtype)
    bhat_ls = ls + beta * jnp.dot(A2, ls, precision=_HIGHEST)   # Bhat ls
    G = jnp.dot(ls.T, bhat_ls, precision=_HIGHEST)
    if trust is not None:
        # RMS eigenvalue scale: ||G||_F / sqrt(M) (= 1 at G = I)
        g_rms = jnp.sqrt(jnp.sum(G * G) / m)
        G = G * jnp.minimum(1.0, trust / jnp.maximum(g_rms, 1e-30))
    C = (1.0 - rho) * eye + rho * G
    C = 0.5 * (C + C.T)
    # C is PD with eigenvalues >= 1 - rho by construction, so the
    # unjittered factor preserves the exact natural-gradient algebra;
    # the jittered retry only fires on a cold-start C (ls far from the
    # fixed point) whose f32 conditioning breaks the plain Cholesky.
    Lc0 = jnp.linalg.cholesky(C)
    Lc1, _ = safe_cholesky(C, policy)
    Lc = jnp.where(jnp.all(jnp.isfinite(Lc0)), Lc0, Lc1)
    X = tri_solve(Lc, ls.T)                       # Lc^{-1} ls^T
    r = jnp.linalg.qr(X, mode="r")                # S' = X^T X = r^T r
    sign = jnp.sign(jnp.diagonal(r))
    sign = jnp.where(sign == 0, jnp.ones_like(sign), sign)
    ls_new = (r * sign[:, None]).T                # lower-tri, diag > 0
    # natural-gradient residual beta a - Bhat m, pushed through S'
    resid = beta * a - u_mean - beta * jnp.dot(
        A2, u_mean, precision=_HIGHEST
    )
    v = jnp.dot(ls.T, resid, precision=_HIGHEST)
    cinv_v = tri_solve(Lc, tri_solve(Lc, v), trans=True)
    dm = rho * jnp.dot(ls, cinv_v, precision=_HIGHEST)
    if trust is not None:
        dm_norm = jnp.sqrt(jnp.sum(dm * dm))
        cap = trust * (1.0 + jnp.sqrt(jnp.sum(u_mean * u_mean)))
        dm = dm * jnp.minimum(1.0, cap / jnp.maximum(dm_norm, 1e-30))
    u_mean_new = u_mean + dm
    diag = jnp.diagonal(ls_new)
    raw_new = jnp.tril(ls_new, -1) + jnp.diag(positive_inverse(diag))
    return u_mean_new, raw_new


def _guarded_qu(params, u_mean, raw_u_scale):
    """Keep the previous q(u) when a blend produced non-finite values
    (an ill-conditioned batch Lambda can NaN the unjittered Cholesky in
    `_params_from_natural`; apply_if_finite never sees the blend)."""
    ok = jnp.isfinite(jnp.sum(u_mean)) & jnp.isfinite(
        jnp.sum(raw_u_scale)
    )
    return {
        **params,
        "u_mean": jnp.where(ok, u_mean, params["u_mean"]),
        "raw_u_scale": jnp.where(ok, raw_u_scale, params["raw_u_scale"]),
    }


def make_svi_natgrad_step(config: Config, n_total: int, optimizer,
                          rho: float = 0.2,
                          rho_t0: float | None = None,
                          rho_kappa: float = 0.6,
                          blend_at: str = "updated",
                          sample_idx=None,
                          mesh=None,
                          streaming: bool = False,
                          policy: JitterPolicy | None = None,
                          qu_trust: float | None = None):
    """SVI step with Hoffman-style stochastic NATURAL-gradient q(u)
    updates (the canonical accelerator for this bound): hypers, inducing
    inputs, and q(X) update by gradient (optax; q(X) itself can take
    ngd via gp_optimizer), while q(u)'s natural parameters blend toward
    the closed-form optimum implied by the (N/B)-scaled batch
    statistics,

        Lambda <- (1-rho) Lambda + rho (I + beta A2_hat)
        h      <- (1-rho) h      + rho (beta a_hat),

    which IS the natural gradient step of length rho on the whitened
    q(u) — no Fisher solves, just the already-computed whitened stats.
    The q(u) leaves are masked out of the optax update (their 'gradient
    step' is the blend). Returns jitted step(state, rng, Y).

    rho_t0: if set, Robbins–Monro decay rho_t = rho * (1 + t/t0)^-kappa
    (satisfies the classic step-size conditions for kappa in (0.5, 1],
    the standard requirement for asymptotic SVI convergence; fixed rho
    is the measured-faster default at short horizons — see
    results/svi_natgrad_order.json).

    blend_at: "updated" recomputes the batch statistics at the post-
    gradient params (Hoffman ordering — one extra psi pass per step);
    "grad" reuses the statistics already computed inside the gradient
    pass (half the psi work, blend lags the hyper update by one step).

    sample_idx: optional (rng) -> (batch,) int array overriding the
    default with-replacement sampler (deterministic tests; custom
    samplers).

    mesh: a jax.sharding.Mesh routes the bound through
    parallel.sharded_elbo.svi_elbo_sharded (batch rows shard over
    "data", one psum per step) and the blend reuses the psummed
    whitened statistics. Identical math to mesh=None.

    streaming: the input pipeline owns sampling (data/stream.py) — the
    step's data argument becomes the host-fed pair (idx (B,) int32,
    y_b (B, D)); nothing is resampled or gathered on device, so Y never
    has to fit in HBM. Identical math to the resident path at equal
    indices (tests/test_stream.py)."""
    import optax

    from dp_gp_lvm_tpu.train.loop import TrainState

    policy = policy or JitterPolicy()
    if blend_at not in ("updated", "grad"):
        raise ValueError(f"blend_at must be 'updated'|'grad', got {blend_at!r}")

    def rho_at(t):
        if rho_t0 is None:
            return jnp.asarray(rho)
        return rho * (1.0 + t / rho_t0) ** (-rho_kappa)

    def step(state: TrainState, rng, Y):
        if streaming:
            idx, y_b = Y            # host-fed (idx, rows) pair
        elif sample_idx is None:
            # int32 pinned so the minibatch sequence is x64-invariant
            idx = jax.random.randint(
                rng, (config.batch,), 0, n_total, dtype=jnp.int32
            )
            y_b = Y[idx]
        else:
            idx = sample_idx(rng)
            y_b = Y[idx]

        def loss_with_stats(p):
            if mesh is not None:
                from dp_gp_lvm_tpu.parallel.sharded_elbo import (
                    svi_elbo_sharded,
                )

                bound, (a, A2) = svi_elbo_sharded(
                    p, y_b, idx, n_total, config, mesh,
                    policy=policy, with_aux=True,
                )
                beta = 1.0 / constrain(p, config)["noise"]
                return -bound, (a, A2, beta)
            c = constrain(p, config)
            stats, kl_x = _scaled_batch_stats(c, y_b, idx, n_total, config)
            bound, a, A2 = _bound_and_whitened(c, stats, kl_x, policy,
                                               config.kernel)
            return -bound, (a, A2, 1.0 / c["noise"])

        (loss_v, aux), grads = jax.value_and_grad(
            loss_with_stats, has_aux=True
        )(state.params)
        # q(u) moves by natural gradient, not optax
        grads = {
            **grads,
            "u_mean": jnp.zeros_like(grads["u_mean"]),
            "raw_u_scale": jnp.zeros_like(grads["raw_u_scale"]),
        }
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        if blend_at == "updated":
            # natural-gradient blend toward the batch-optimal q(u) at the
            # UPDATED hypers/latents (Hoffman SVI ordering); routes
            # through the mesh program when one is set (the discarded
            # bound output is dead-code-eliminated under jit)
            _, (a, A2, beta) = loss_with_stats(params)
            c = constrain(params, config)
        else:
            # reuse the gradient pass's whitened statistics (old params)
            a, A2, beta = aux
            c = constrain(params, config)
        rho_t = rho_at(state.step).astype(A2.dtype)
        u_mean, raw_u_scale = natgrad_blend_qu(
            c["u_mean"], c["u_scale"], a, A2, beta, rho_t, policy,
            trust=qu_trust,
        )
        params = _guarded_qu(params, u_mean, raw_u_scale)

        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss_v, "elbo_estimate": -loss_v},
        )

    return jax.jit(step)
