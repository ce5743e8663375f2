r"""Test-time latent inference and missing-data prediction (imputation).

Implements SURVEY.md call stack 3.3 / BASELINE config 5: given a trained
model and test points y* with only a subset `o` of output dims observed,

  1. hold the trained model fixed and fit q(x*) = N(m*, diag(s*)) per test
     point by maximizing the uncollapsed variational objective

        L(q(x*)) = sum_{d in o} E_{q(x*) q(u_d)}[log N(y*_d | k_*u K_uu^{-1}
                   u_d, sigma^2)]  - 1/(2 sigma^2)(psi0* - tr(K_uu^{-1}
                   psi2*)) terms  - KL[q(x*) || N(0, I)],

     with q(u_d) the trained optimal collapsed posterior (Titsias &
     Lawrence 2010, section 4 test inference); the whole inner optimization
     is a jitted optax/`lax.scan` loop — no Python in the hot path;

  2. predict the missing dims m via the psi-statistic moments of q(x*):

        E[y*_d]   = psi1* w_d
        Var[y*_d] = sigma^2 + psi0* - tr(K^{-1} psi2*) + tr(Sigma_B psi2*)
                    + w_d^T psi2* w_d - (psi1* w_d)^2,

     where w_d = K_uu^{-1} m_u^{(d)} and Sigma_B = (K_uu + beta Psi2)^{-1}.

For DP-GP-LVM the same machinery runs vmapped per atom and predictions mix
over atoms with the dimension's assignment posterior phi_d.

Masks are dense (N*, D) 0/1 arrays — static shapes, TPU-friendly; a dim is
"observed" where mask = 1.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax as _lax

_HIGHEST = _lax.Precision.HIGHEST
import optax

from dp_gp_lvm_tpu.core.transforms import positive, positive_inverse
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.distributions import gaussian
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.linalg import tri_solve
from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm
from dp_gp_lvm_tpu.models.bound import optimal_qu, suff_stats_from_psi
from dp_gp_lvm_tpu.ops import dispatch


class PosteriorCache(NamedTuple):
    """Trained-model quantities reused across all test-time computation."""

    w: jnp.ndarray        # (M, D) K_uu^{-1} m_u per dim
    L: jnp.ndarray        # (M, M) chol(K_uu)
    LB: jnp.ndarray       # (M, M) chol(I + beta L^{-1} Psi2 L^{-T})
    variance: jnp.ndarray
    ard: jnp.ndarray      # (Q,)
    z: jnp.ndarray        # (M, Q)
    noise: jnp.ndarray


def bgplvm_posterior(params, Y, config: bgplvm.Config,
                     policy: JitterPolicy = JitterPolicy()) -> PosteriorCache:
    hyp = bgplvm.constrain(params)
    p0, p1, p2 = dispatch.psi_stats(
        hyp["variance"], hyp["ard"], hyp["qx_mean"], hyp["qx_var"],
        hyp["z"], block_n=config.psi2_block, kernel=config.kernel,
    )
    kuu = dispatch.gram(
        hyp["variance"], hyp["ard"], hyp["z"], kernel=config.kernel
    )
    stats = suff_stats_from_psi(p0, p1, p2, Y)
    w, L, LB = optimal_qu(kuu, stats, hyp["noise"], policy)
    return PosteriorCache(
        w=w, L=L, LB=LB, variance=hyp["variance"], ard=hyp["ard"],
        z=hyp["z"], noise=hyp["noise"],
    )


def _test_psi(cache: PosteriorCache, m_star, s_star, kernel="ard_rbf"):
    """psi statistics of the test points: psi0* (N*,), psi1* (N*, M),
    psi2* (N*, M, M) — per-point (no sum over n)."""
    mod = dispatch.KERNELS[kernel]
    p1 = mod.psi1(cache.variance, cache.ard, m_star, s_star, cache.z)
    # per-point psi2: reuse the block formulation with each point its own block
    def one(mu_n, s_n):
        return mod.psi2(
            cache.variance, cache.ard, mu_n[None], s_n[None], cache.z
        )
    p2 = jax.vmap(one)(m_star, s_star)               # (N*, M, M)
    if kernel == "linear":
        p0 = cache.variance * jnp.sum(
            cache.ard[None, :] * (m_star * m_star + s_star), axis=-1
        )
    else:
        p0 = jnp.full((m_star.shape[0],), 1.0, m_star.dtype) * cache.variance
    return p0, p1, p2


def _trace_terms(cache: PosteriorCache, p2_star):
    """tr(K^{-1} psi2*) and tr(Sigma_B psi2*) per test point (N*,)."""
    def per_point(p2):
        half = tri_solve(cache.L, p2)                   # L^{-1} psi2*
        a = tri_solve(cache.L, half.T)                  # L^{-1} psi2* L^{-T}
        tr_kinv = jnp.trace(a)
        b = tri_solve(cache.LB, a)
        c = tri_solve(cache.LB, b.T)                    # LB^{-1} . LB^{-T}
        tr_sigma_b = jnp.trace(c)
        return tr_kinv, tr_sigma_b

    return jax.vmap(per_point)(p2_star)


def predict_from_latent(cache: PosteriorCache, m_star, s_star,
                        kernel="ard_rbf"):
    """Predictive mean (N*, D) and per-dim variance (N*, D) incl. noise."""
    p0, p1, p2 = _test_psi(cache, m_star, s_star, kernel)
    mean = jnp.dot(p1, cache.w, precision=_HIGHEST)                                  # (N*, D)
    tr_kinv, tr_sigma_b = _trace_terms(cache, p2)
    # w^T psi2* w per (point, dim)
    quad = jnp.einsum("nij,id,jd->nd", p2, cache.w, cache.w, precision=_HIGHEST)
    common = (p0 - tr_kinv + tr_sigma_b)[:, None]
    var = cache.noise + common + quad - mean * mean
    return mean, jnp.maximum(var, 1e-12)


def _expected_loglik(cache: PosteriorCache, y, mask, m_star, s_star,
                     kernel="ard_rbf"):
    """sum over observed dims of E_{q(x*) q(u)}[log N(y_d | f_d, noise)]."""
    p0, p1, p2 = _test_psi(cache, m_star, s_star, kernel)
    mean = jnp.dot(p1, cache.w, precision=_HIGHEST)
    tr_kinv, tr_sigma_b = _trace_terms(cache, p2)
    quad = jnp.einsum("nij,id,jd->nd", p2, cache.w, cache.w, precision=_HIGHEST)
    beta = 1.0 / cache.noise
    # E[(y - a(x)^T u)^2] = y^2 - 2 y psi1 w + w^T psi2 w + tr(Sigma_B psi2)
    # + conditional-GP variance correction (psi0 - tr(K^{-1} psi2)).
    sq = (
        y * y
        - 2.0 * y * mean
        + quad
        + (tr_sigma_b + p0 - tr_kinv)[:, None]
    )
    ll = -0.5 * (
        jnp.log(2.0 * jnp.pi).astype(y.dtype)
        + jnp.log(cache.noise)
        + beta * sq
    )
    return jnp.sum(ll * mask)


def _expected_loglik_per_point(cache: PosteriorCache, y, mask, m_star,
                               s_star, kernel="ard_rbf"):
    """(N*,) per-point expected log-likelihood sums (q(x*) factorizes per
    test point, so the joint objective is separable — the per-point values
    score multi-restart candidates independently)."""
    p0, p1, p2 = _test_psi(cache, m_star, s_star, kernel)
    mean = jnp.dot(p1, cache.w, precision=_HIGHEST)
    tr_kinv, tr_sigma_b = _trace_terms(cache, p2)
    quad = jnp.einsum("nij,id,jd->nd", p2, cache.w, cache.w,
                      precision=_HIGHEST)
    beta = 1.0 / cache.noise
    sq = (
        y * y
        - 2.0 * y * mean
        + quad
        + (tr_sigma_b + p0 - tr_kinv)[:, None]
    )
    ll = -0.5 * (
        jnp.log(2.0 * jnp.pi).astype(y.dtype)
        + jnp.log(cache.noise)
        + beta * sq
    )
    return jnp.sum(ll * mask, axis=-1)


def init_latent_from_nearest(qx_mean, Y, y_star, mask):
    """m* init: latent mean of the masked-nearest training point."""
    d2 = jnp.sum(
        mask[:, None, :] * (y_star[:, None, :] - Y[None, :, :]) ** 2, axis=-1
    )  # (N*, N)
    idx = jnp.argmin(d2, axis=-1)
    return qx_mean[idx]


def init_latent_knn(qx_mean, Y, y_star, mask, k: int):
    """(k, N*, Q) inits: latent means of the k masked-nearest training
    points — the candidate set for multi-restart latent inference."""
    d2 = jnp.sum(
        mask[:, None, :] * (y_star[:, None, :] - Y[None, :, :]) ** 2, axis=-1
    )  # (N*, N)
    _, idx = jax.lax.top_k(-d2, k)                     # (N*, k)
    return jnp.swapaxes(qx_mean[idx], 0, 1)            # (k, N*, Q)


def _fit_variational(
    objective, var_params, num_steps, lr, tol=None, patience: int = 5,
    anneal: bool = False,
):
    """Adam on a test-time variational objective inside one jitted scan.

    tol=None: exactly num_steps steps (the benchmark-stable unroll).
    tol=r: early stopping once the relative objective change stays <= r
    for `patience` CONSECUTIVE steps — Adam's objective change passes
    through ~zero transiently when an oscillation crosses the minimum,
    so a single-step criterion freezes far from convergence. Shapes stay
    static for jit — each step is a lax.cond on a converged flag, so the
    post-convergence iterations are no-op passthroughs (a skipped branch
    costs ~nothing at runtime); serving latency then tracks the ACTUAL
    convergence point, not the worst-case unroll (SURVEY.md section 3.3,
    which anticipated a while_loop-with-tolerance option).

    anneal=True: cosine-decay the Adam rate lr -> 0 over num_steps (the
    long-serving mode — a constant rate oscillates around the per-point
    optimum instead of settling into it).

    Returns (fitted_params, objective_trace, steps_taken).
    """
    opt = optax.adam(
        optax.cosine_decay_schedule(lr, max(num_steps, 1)) if anneal else lr
    )
    vg = jax.value_and_grad(objective)

    if tol is None:

        def step(carry, _):
            vp, opt_state = carry
            val, g = vg(vp)
            updates, opt_state = opt.update(g, opt_state)
            vp = optax.apply_updates(vp, updates)
            return (vp, opt_state), val

        (vp, _), trace = jax.lax.scan(
            step, (var_params, opt.init(var_params)), None, length=num_steps
        )
        return vp, trace, jnp.asarray(num_steps)

    def step(carry, _):
        vp, opt_state, prev, streak, done, k = carry

        def active(operand):
            vp, opt_state, prev, streak, done, k = operand
            val, g = vg(vp)
            updates, new_os = opt.update(g, opt_state)
            new_vp = optax.apply_updates(vp, updates)
            small = jnp.abs(prev - val) <= tol * (jnp.abs(prev) + 1.0)
            new_streak = jnp.where(small, streak + 1, 0)
            conv = new_streak >= patience
            return (new_vp, new_os, val, new_streak, conv, k + 1), val

        def frozen(operand):
            vp, opt_state, prev, streak, done, k = operand
            return (vp, opt_state, prev, streak, done, k), prev

        new_carry, val = jax.lax.cond(done, frozen, active, carry)
        return new_carry, val

    dtype = jax.tree_util.tree_leaves(var_params)[0].dtype
    init = (
        var_params,
        opt.init(var_params),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    (vp, _, _, _, _, k), trace = jax.lax.scan(
        step, init, None, length=num_steps
    )
    return vp, trace, k


def infer_latent(
    cache: PosteriorCache,
    y_star,
    mask,
    m_init,
    num_steps: int = 200,
    lr: float = 0.05,
    kernel: str = "ard_rbf",
    tol: float | None = None,
):
    """Optimize q(x*) = N(m*, diag(s*)) by Adam inside one jitted scan.

    tol enables early stopping on relative objective change (serving
    mode); num_steps stays the hard cap either way."""
    dtype = y_star.dtype
    var_params = {
        "m": m_init.astype(dtype),
        "raw_s": positive_inverse(0.1 * jnp.ones_like(m_init)).astype(dtype),
    }

    def objective(vp):
        s = positive(vp["raw_s"])
        ell = _expected_loglik(cache, y_star, mask, vp["m"], s, kernel)
        kl = gaussian.kl_to_standard_normal(vp["m"], s)
        return -(ell - kl)

    vp, trace, _ = _fit_variational(objective, var_params, num_steps, lr, tol)
    return vp["m"], positive(vp["raw_s"]), -trace


def impute_bgplvm(
    params,
    Y,
    config: bgplvm.Config,
    y_star,
    mask,
    num_steps: int = 200,
    lr: float = 0.05,
    tol: float | None = None,
):
    """Full config-5 pipeline for Bayesian GP-LVM: infer q(x*), predict all
    dims; returns (mean, var, m*, s*, objective trace). Metrics on the
    missing dims (mask == 0) are the caller's slice."""
    cache = bgplvm_posterior(params, Y, config)
    m0 = init_latent_from_nearest(params["qx_mean"], Y, y_star, mask)
    m_s, s_s, trace = infer_latent(
        cache, y_star, mask, m0, num_steps, lr, kernel=config.kernel,
        tol=tol,
    )
    mean, var = predict_from_latent(cache, m_s, s_s, kernel=config.kernel)
    return mean, var, m_s, s_s, trace


# ---------------------------------------------------------------------------
# DP-GP-LVM: per-atom caches, phi-mixed predictions
# ---------------------------------------------------------------------------


def dp_posterior(params, Y, config: dp_gp_lvm.Config,
                 policy: JitterPolicy = JitterPolicy()):
    """Batched PosteriorCache over atoms (leading axis T) + phi (D, T)."""
    hyp = dp_gp_lvm.constrain(params)
    mu, s = hyp["qx_mean"], hyp["qx_var"]

    def one_atom(variance, ard, z):
        p0, p1, p2 = dispatch.psi_stats(
            variance, ard, mu, s, z, block_n=config.psi2_block,
            kernel=config.kernel,
        )
        kuu = dispatch.gram(variance, ard, z, kernel=config.kernel)
        p1y = jnp.dot(p1.T, Y, precision=_HIGHEST)
        return kuu, p0, p1y, p2

    kuu_b, p0_b, p1y_b, p2_b = jax.vmap(one_atom)(
        hyp["variance"], hyp["ard"], hyp["z"]
    )
    # ONE batched optimal_qu (not vmapped): keeps the speculative safe
    # Cholesky's fallback predicate scalar (models/bound.py round-5)
    from dp_gp_lvm_tpu.models.bound import SuffStats

    stats = SuffStats(
        psi0=p0_b, psi1T_y=p1y_b, psi2=p2_b,
        yty=jnp.sum(Y * Y, axis=0),
        n=jnp.asarray(Y.shape[0], Y.dtype),
    )
    w, L, LB = optimal_qu(kuu_b, stats, hyp["noise"], policy)
    caches = PosteriorCache(
        w=w, L=L, LB=LB, variance=hyp["variance"], ard=hyp["ard"],
        z=hyp["z"], noise=hyp["noise"],
    )
    return caches, hyp["phi"]


def dp_predict_from_latent(caches: PosteriorCache, phi, m_star, s_star,
                           kernel="ard_rbf"):
    """Mixture predictive: mean/var (N*, D) mixing atoms by phi (D, T)."""
    means, vars_ = jax.vmap(
        lambda c: predict_from_latent(c, m_star, s_star, kernel)
    )(caches)                                            # (T, N*, D) each
    w = phi.T[:, None, :]                                # (T, 1, D)
    mean = jnp.sum(w * means, axis=0)
    # Cancellation-free mixture variance (vs the E[m^2] - mean^2 form,
    # which NaN'd the DP-SVI serving path at c7 scale): every term is
    # non-negative by construction.
    dev = means - mean[None]
    return mean, jnp.maximum(jnp.sum(w * (vars_ + dev * dev), axis=0), 1e-12)


def dp_infer_latent(
    caches: PosteriorCache,
    phi,
    y_star,
    mask,
    m_init,
    num_steps: int = 200,
    lr: float = 0.05,
    kernel: str = "ard_rbf",
    tol: float | None = None,
):
    """q(x*) inference under the DP mixture: phi-weighted expected log-lik."""
    var_params = {
        "m": m_init,
        "raw_s": positive_inverse(0.1 * jnp.ones_like(m_init)),
    }

    def objective(vp):
        s = positive(vp["raw_s"])

        def per_atom_ll(c):
            # per-(point, dim) expected log-lik pieces for this atom
            p0, p1, p2 = _test_psi(c, vp["m"], s, kernel)
            mean = jnp.dot(p1, c.w, precision=_HIGHEST)
            tr_kinv, tr_sigma_b = _trace_terms(c, p2)
            quad = jnp.einsum("nij,id,jd->nd", p2, c.w, c.w, precision=_HIGHEST)
            beta = 1.0 / c.noise
            sq = (
                y_star * y_star
                - 2.0 * y_star * mean
                + quad
                + (tr_sigma_b + p0 - tr_kinv)[:, None]
            )
            return -0.5 * (
                jnp.log(2.0 * jnp.pi).astype(y_star.dtype)
                + jnp.log(c.noise)
                + beta * sq
            )  # (N*, D)

        ll_t = jax.vmap(per_atom_ll)(caches)             # (T, N*, D)
        ll = jnp.sum(ll_t * phi.T[:, None, :], axis=0)   # (N*, D)
        ell = jnp.sum(ll * mask)
        kl = gaussian.kl_to_standard_normal(vp["m"], s)
        return -(ell - kl)

    vp, trace, _ = _fit_variational(objective, var_params, num_steps, lr, tol)
    return vp["m"], positive(vp["raw_s"]), -trace


def impute_dp(
    params,
    Y,
    config: dp_gp_lvm.Config,
    y_star,
    mask,
    num_steps: int = 200,
    lr: float = 0.05,
    tol: float | None = None,
):
    """Config-5 pipeline for DP-GP-LVM."""
    caches, phi = dp_posterior(params, Y, config)
    m0 = init_latent_from_nearest(params["qx_mean"], Y, y_star, mask)
    m_s, s_s, trace = dp_infer_latent(
        caches, phi, y_star, mask, m0, num_steps, lr, kernel=config.kernel,
        tol=tol,
    )
    mean, var = dp_predict_from_latent(
        caches, phi, m_s, s_s, kernel=config.kernel
    )
    return mean, var, m_s, s_s, trace


# ---------------------------------------------------------------------------
# MRD: cross-view prediction — infer the shared latent from observed views,
# predict the held-out view (the canonical MRD task)
# ---------------------------------------------------------------------------


def mrd_posterior(params, Ys, config, policy: JitterPolicy = JitterPolicy()):
    """One PosteriorCache per view (python list — views differ in D)."""
    from dp_gp_lvm_tpu.models import mrd as mrd_mod
    from dp_gp_lvm_tpu.core.transforms import positive_variational_var

    mu = params["qx_mean"]
    s = positive_variational_var(params["raw_qx_var"])
    caches = []
    for vp, Y in zip(params["views"], Ys):
        hyp = mrd_mod.constrain_view(vp)
        p0, p1, p2 = dispatch.psi_stats(
            hyp["variance"], hyp["ard"], mu, s, hyp["z"],
            block_n=config.psi2_block, kernel=config.kernel,
        )
        kuu = dispatch.gram(
            hyp["variance"], hyp["ard"], hyp["z"], kernel=config.kernel
        )
        stats = suff_stats_from_psi(p0, p1, p2, Y)
        w, L, LB = optimal_qu(kuu, stats, hyp["noise"], policy)
        caches.append(PosteriorCache(
            w=w, L=L, LB=LB, variance=hyp["variance"], ard=hyp["ard"],
            z=hyp["z"], noise=hyp["noise"],
        ))
    return caches


def mrd_infer_latent(
    caches,
    observed: dict[int, jnp.ndarray],
    m_init,
    num_steps: int = 200,
    lr: float = 0.05,
    kernel: str = "ard_rbf",
    tol: float | None = None,
    anneal: bool = False,
):
    """Fit q(x*) from the observed views (dict view_index -> (N*, D_v))."""
    var_params = {
        "m": m_init,
        "raw_s": positive_inverse(0.1 * jnp.ones_like(m_init)),
    }
    items = sorted(observed.items())

    def objective(vp):
        s = positive(vp["raw_s"])
        ell = 0.0
        for v_idx, y in items:
            c = caches[v_idx]
            mask = jnp.ones_like(y)
            ell = ell + _expected_loglik(c, y, mask, vp["m"], s, kernel)
        kl = gaussian.kl_to_standard_normal(vp["m"], s)
        return -(ell - kl)

    vp, trace, _ = _fit_variational(objective, var_params, num_steps, lr,
                                    tol, anneal=anneal)
    return vp["m"], positive(vp["raw_s"]), -trace


def _per_point_objective(caches, items, m, s, kernel):
    """(N*,) separable test-time ELBO: sum_v ELL_v(n) - KL(n)."""
    ell = 0.0
    for v_idx, y in items:
        ell = ell + _expected_loglik_per_point(
            caches[v_idx], y, jnp.ones_like(y), m, s, kernel
        )
    kl = 0.5 * jnp.sum(m * m + s - jnp.log(s) - 1.0, axis=-1)
    return ell - kl


def mrd_infer_latent_restarts(
    caches,
    observed: dict[int, jnp.ndarray],
    m_inits,
    num_steps: int = 200,
    lr: float = 0.05,
    kernel: str = "ard_rbf",
    tol: float | None = None,
    anneal: bool = False,
):
    """Multi-restart latent inference with PER-POINT selection.

    m_inits: (K, N*, Q) candidate initializations (e.g. `init_latent_knn`
    plus a prior-mean row). Each restart runs the same jitted Adam fit —
    q(x*) factorizes over test points, so the joint objective is
    separable and the best restart can be chosen independently per point
    by its own test-time ELBO. Targets the local-optima failure mode of
    single-init inference (a test point whose nearest training row's
    latent sits in the wrong basin stays in that basin).

    Returns (m (N*, Q), s (N*, Q), per_point_objective (N*,)).
    """
    items = sorted(observed.items())
    fitted = []
    for k in range(m_inits.shape[0]):
        m_k, s_k, _ = mrd_infer_latent(
            caches, observed, m_inits[k], num_steps, lr, kernel, tol,
            anneal=anneal,
        )
        obj_k = _per_point_objective(caches, items, m_k, s_k, kernel)
        fitted.append((m_k, s_k, obj_k))
    ms = jnp.stack([f[0] for f in fitted])             # (K, N*, Q)
    ss = jnp.stack([f[1] for f in fitted])
    objs = jnp.stack([f[2] for f in fitted])           # (K, N*)
    best = jnp.argmax(objs, axis=0)                    # (N*,)
    n_idx = jnp.arange(ms.shape[1])
    return ms[best, n_idx], ss[best, n_idx], objs[best, n_idx]


def predict_view_from_views(
    params,
    Ys,
    config,
    observed: dict[int, jnp.ndarray],
    target_view: int,
    num_steps: int = 200,
    lr: float = 0.05,
    tol: float | None = None,
    restarts: int = 0,
    anneal: bool = False,
):
    """MRD cross-view prediction: observe some views of new points, infer
    the shared q(x*), and predict the target view's mean/variance.

    restarts=K>0: run K+1 inference restarts (the K nearest training
    rows' latents plus the prior mean) and keep the best PER POINT by
    the test-time ELBO (mrd_infer_latent_restarts). anneal: cosine-decay
    the inner Adam rate (long-serving mode)."""
    caches = mrd_posterior(params, Ys, config)
    n_star = next(iter(observed.values())).shape[0]
    # init from nearest training point in the first observed view
    v0, y0 = sorted(observed.items())[0]
    if restarts > 0:
        m_knn = init_latent_knn(
            params["qx_mean"], Ys[v0], y0, jnp.ones_like(y0), restarts
        )
        m_inits = jnp.concatenate(
            [m_knn, jnp.zeros_like(m_knn[:1])], axis=0
        )
        m_s, s_s, trace = mrd_infer_latent_restarts(
            caches, observed, m_inits, num_steps, lr,
            kernel=config.kernel, tol=tol, anneal=anneal,
        )
    else:
        m0 = init_latent_from_nearest(
            params["qx_mean"], Ys[v0], y0, jnp.ones_like(y0)
        )
        m_s, s_s, trace = mrd_infer_latent(
            caches, observed, m0, num_steps, lr, kernel=config.kernel,
            tol=tol, anneal=anneal,
        )
    mean, var = predict_from_latent(
        caches[target_view], m_s, s_s, kernel=config.kernel
    )
    return mean, var, m_s, s_s, trace


def gaussian_predictive_loglik(y_true, mean, var, mask):
    """Moment-matched per-dim predictive log-likelihood, summed over the
    entries selected by mask (use mask = 1 - observed_mask for imputation).
    The paper's quality metric (SURVEY.md section 6)."""
    var = jnp.maximum(var, 1e-10)  # defensive: a negative/zero variance
    #   upstream must never turn the paper metric into NaN silently
    ll = -0.5 * (
        jnp.log(2.0 * jnp.pi).astype(mean.dtype)
        + jnp.log(var)
        + (y_true - mean) ** 2 / var
    )
    return jnp.sum(ll * mask)
