r"""Minibatch (SVI) Manifold Relevance Determination — multi-view MRD
on the uncollapsed whitened Hensman bound.

Beyond-reference capability, completing the big-N story for the THIRD
model family (SURVEY.md section 2a 'MRD'; the collapsed MRD in
models/mrd.py is full-batch like the reference): all views share one
q(X) — resident (N, Q) table or amortized recognition network over the
CONCATENATED views (models/amortized.py) — while each view v carries
its own ARD-RBF kernel, noise, inducing inputs, and explicit whitened
q(u^v). Every data term decomposes over rows, so a minibatch of B
aligned rows (the same indices in every view) gives an exactly unbiased
estimate at O(B M^2 V) per step, independent of N:

    ELBO = sum_v [ sum_{d in v} fit_vd - KL_u^v ] - KL(q(X) || N(0, I))

with each view's fit/KL_u exactly the single-view whitened bound of
models/svi_gplvm.py (same _bound_and_whitened core, kl_x excluded and
added once). Consequences, pinned as test oracles (tests/test_mrd_svi.py):

  * V=1 reduces EXACTLY to svi_gplvm.elbo;
  * at the per-view closed-form optimal q(u^v) (S*_v = (I + beta_v
    A2_v)^{-1}, m*_v = beta_v S*_v a_v), the bound EQUALS the collapsed
    mrd.elbo — each view's optimum is independent because views couple
    only through q(X);
  * a disjoint-partition minibatch average equals the full-batch bound.

q(u^v) trains by per-view stochastic NATURAL gradient (the same
Hoffman-style blend as svi_gplvm.make_svi_natgrad_step, applied per
view from the view's own whitened batch statistics); hypers, inducing
inputs, and q(X)/encoder update by optax.

Cross-view serving works directly from the explicit q(u^v) — no
training data needed (unlike prediction.predict_view_from_views, which
rebuilds collapsed posterior caches from full-batch statistics): infer
the shared q(x*) against the summed masked expected log-likelihoods of
the OBSERVED views, then read any target view off its q(u^v).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.core.transforms import positive, positive_inverse
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.distributions import gaussian
from dp_gp_lvm_tpu.linalg import safe_cholesky
from dp_gp_lvm_tpu.models import svi_gplvm as svi
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.train.init import inducing_from_latents, pca_latents

_HIGHEST = jax.lax.Precision.HIGHEST


class Config(NamedTuple):
    """Static model hyperparameters (hashable; safe to close over)."""

    num_latent: int
    num_inducing: int
    num_views: int
    batch: int = 256               # minibatch rows per step (aligned
    psi2_block: int | None = None  # across views)
    use_pallas: bool | str = "auto"
    kernel: str = "ard_rbf"
    fast_chol: bool = False
    # amortized=True replaces the q(X) table with a recognition network
    # over the CONCATENATED views (the MRD latent is a function of all
    # views jointly; missing views fill at the encoder center when
    # serving — see cross_view_predict)
    amortized: bool = False
    encoder_hidden: int = 64
    # Lower bound on the per-view noise VARIANCE (see
    # svi_gplvm.Config.noise_floor — same encoder-collapse guard)
    noise_floor: float = 0.0
    # Additive lower bound on the AMORTIZED q(X) variance (see
    # svi_gplvm.Config.qx_var_floor — same collapse guard)
    qx_var_floor: float = 0.0
    # per-view output dims, needed only by the STREAMING step to split
    # the host-fed concatenated row block back into views (the stream
    # pipeline, data/stream.py, serves one mmap'd (N, sum D_v) matrix)
    view_dims: tuple = ()


def config_from_experiment(cfg, batch: int | None = None) -> Config:
    """The ONE construction of an mrd_svi.Config from a named
    ExperimentConfig (core/config.py) — run.py trains with it and the
    offline eval tools (experiments/c9_eval_sweep.py, c9_diag.py) load
    exported params under it, so train/eval configs cannot drift (a
    hand-built eval config that omitted `amortized` would silently
    evaluate a recognition-network export in resident-table mode)."""
    return Config(
        num_latent=cfg.q, num_inducing=cfg.m, num_views=len(cfg.views),
        batch=batch or 1024, psi2_block=cfg.psi2_block,
        amortized=cfg.amortized, noise_floor=cfg.noise_floor,
        qx_var_floor=cfg.qx_var_floor, view_dims=tuple(cfg.views),
    )


def _svi_config(config: Config) -> svi.Config:
    """The single-view config every per-view computation runs under."""
    return svi.Config(
        num_latent=config.num_latent, num_inducing=config.num_inducing,
        batch=config.batch, psi2_block=config.psi2_block,
        use_pallas=config.use_pallas, kernel=config.kernel,
        fast_chol=config.fast_chol, amortized=config.amortized,
        encoder_hidden=config.encoder_hidden,
        noise_floor=config.noise_floor,
        qx_var_floor=config.qx_var_floor,
    )


def init_params(rng, Ys: Sequence[jnp.ndarray], config: Config):
    """PCA init on the concatenated views (shared q(X) or encoder);
    per-view kernels/inducing/whitened q(u^v) at the prior (m=0, S=I)."""
    Yall = jnp.concatenate(list(Ys), axis=1)
    dtype = Yall.dtype
    q, m = config.num_latent, config.num_inducing
    x0 = pca_latents(Yall, q).astype(dtype)
    from dp_gp_lvm_tpu.models import amortized

    views = []
    for v, Y in enumerate(Ys):
        d_v = Y.shape[1]
        views.append({
            "z": inducing_from_latents(jax.random.fold_in(rng, v), x0, m),
            "raw_variance": positive_inverse(jnp.asarray(1.0, dtype)),
            "raw_ard": positive_inverse(jnp.ones((q,), dtype)),
            "raw_noise": positive_inverse(jnp.asarray(0.1, dtype)),
            "u_mean": jnp.zeros((m, d_v), dtype),
            "raw_u_scale": jnp.zeros((m, m), dtype)
            + jnp.eye(m, dtype=dtype) * positive_inverse(
                jnp.asarray(1.0, dtype)
            ),
        })
    return {
        **amortized.qx_leaves_or_encoder(
            jax.random.fold_in(rng, 7), Yall, q, config
        ),
        "views": views,
    }


def _view_params(params, v: int):
    """A view's leaves plus the shared q(X)/encoder leaves, shaped as a
    svi_gplvm params dict — the bridge that lets every single-view
    function (constrain, bound core, predict, natgrad conversion) run
    unchanged per view."""
    return {**{k: params[k] for k in params if k != "views"},
            **params["views"][v]}


def constrain_views(params, config: Config | None = None):
    """List of per-view constrained dicts (svi_gplvm.constrain per view;
    the shared q(X)/encoder leaves appear in each — same arrays, no
    copies under jit). config threads Config.noise_floor (duck-typed:
    svi_gplvm.constrain only reads .noise_floor)."""
    return [svi.constrain(_view_params(params, v), config)
            for v in range(len(params["views"]))]


def _bounds_per_view(c_views, y_views, mu, s, config: Config, policy,
                     scale=None):
    """Per-view whitened Hensman bounds (kl_x excluded) and whitened
    statistics from q(X) moments (mu, s) of the batch rows. scale is
    the N/B SuffStats multiplier (None = full batch)."""
    bounds, whitened = [], []
    for c, y in zip(c_views, y_views):
        stats = dispatch.suff_stats(
            c["variance"], c["ard"], mu, s, c["z"], y,
            block_n=config.psi2_block, use_pallas=config.use_pallas,
            kernel=config.kernel,
        )
        if scale is not None:
            stats = stats._replace(
                psi0=stats.psi0 * scale, psi1T_y=stats.psi1T_y * scale,
                psi2=stats.psi2 * scale, yty=stats.yty * scale,
                n=stats.n * scale,
            )
        bound_v, a, A2 = svi._bound_and_whitened(c, stats, 0.0, policy,
                                                  config.kernel)
        bounds.append(bound_v)
        whitened.append((a, A2, 1.0 / c["noise"]))
    return bounds, whitened


def _policy(config: Config, policy):
    policy = policy or JitterPolicy()
    if config.fast_chol:
        policy = policy._replace(max_tries=0)
    return policy


def elbo_terms(params, Ys, config: Config,
               policy: JitterPolicy | None = None):
    """Full-batch bound with per-view decomposition (testing / small N)."""
    from dp_gp_lvm_tpu.models import amortized

    policy = _policy(config, policy)
    c_views = constrain_views(params, config)
    Yall = jnp.concatenate(list(Ys), axis=1)
    mu, s = amortized.qx_batch(c_views[0], Yall, None)
    bounds, _ = _bounds_per_view(c_views, Ys, mu, s, config, policy)
    kl_x = gaussian.kl_to_standard_normal(mu, s)
    return {
        "elbo": sum(bounds) - kl_x,
        "kl_x": kl_x,
        "fit_per_view": jnp.stack(bounds),
    }


def elbo(params, Ys, config: Config, policy: JitterPolicy | None = None):
    return elbo_terms(params, Ys, config, policy)["elbo"]


def loss(params, Ys, config: Config):
    return -elbo(params, Ys, config)


def elbo_minibatch(params, y_batches: Sequence[jnp.ndarray], idx,
                   n_total: int, config: Config,
                   policy: JitterPolicy | None = None):
    """Unbiased minibatch estimate: y_batches are the SAME B rows of
    every view; all row-sum terms (per-view SuffStats and the batch
    rows' KL(q(X))) scale by N/B."""
    from dp_gp_lvm_tpu.models import amortized

    policy = _policy(config, policy)
    c_views = constrain_views(params, config)
    y_cat = jnp.concatenate(list(y_batches), axis=1)
    mu_b, s_b = amortized.qx_batch(c_views[0], y_cat, idx)
    scale = jnp.asarray(n_total / y_cat.shape[0], y_cat.dtype)
    bounds, _ = _bounds_per_view(
        c_views, y_batches, mu_b, s_b, config, policy, scale
    )
    kl_x = scale * gaussian.kl_to_standard_normal(mu_b, s_b)
    return sum(bounds) - kl_x


def loss_minibatch(params, y_batches, idx, n_total: int, config: Config):
    return -elbo_minibatch(params, y_batches, idx, n_total, config)


def set_optimal_qu(params, Ys, config: Config,
                   policy: JitterPolicy | None = None):
    """Params with every view's q(u^v) at its closed-form full-batch
    optimum. Views couple only through q(X), so the per-view optima are
    jointly optimal — plugging them in recovers the collapsed mrd.elbo
    exactly (the oracle in tests/test_mrd_svi.py)."""
    from dp_gp_lvm_tpu.models import amortized

    policy = _policy(config, policy)
    c_views = constrain_views(params, config)
    Yall = jnp.concatenate(list(Ys), axis=1)
    mu, s = amortized.qx_batch(c_views[0], Yall, None)
    _, whitened = _bounds_per_view(c_views, Ys, mu, s, config, policy)
    views = []
    for vp, (a, A2, beta) in zip(params["views"], whitened):
        m_star, ls_star = svi.optimal_qu_from_whitened(a, A2, beta)
        diag = jnp.diagonal(ls_star)
        raw = jnp.tril(ls_star, -1) + jnp.diag(positive_inverse(diag))
        views.append({**vp, "u_mean": m_star, "raw_u_scale": raw})
    return {**params, "views": views}


def ard_relevance(params):
    """Per-view ARD weights (V, Q): the shared/private dimension
    signature (same readout as the collapsed models/mrd.py)."""
    return jnp.stack([positive(vp["raw_ard"]) for vp in params["views"]])


def make_svi_natgrad_step(config: Config, n_total: int, optimizer,
                          rho: float = 0.2,
                          rho_t0: float | None = None,
                          rho_kappa: float = 0.6,
                          sample_idx=None,
                          mesh=None,
                          streaming: bool = False,
                          policy: JitterPolicy | None = None,
                          qu_trust: float | None = None):
    """One jitted SVI step: hypers/inducing/q(X) (or encoder) by optax,
    each view's q(u^v) by a natural-gradient blend toward the optimum
    its own (N/B)-scaled batch statistics imply — the per-view analogue
    of svi_gplvm.make_svi_natgrad_step (blend from the gradient pass's
    statistics; see results/svi_natgrad_order.json for why that ordering
    is the default). Returns step(state, rng, Ys) -> (state, metrics);
    Ys is the tuple of resident views, rows gathered by shared index.

    mesh: routes the bound through
    parallel.sharded_elbo.mrd_svi_elbo_sharded (the aligned batch rows
    of every view shard over "data", one psum per view) and the blend
    reuses the psummed per-view whitened statistics. Identical math to
    mesh=None (tested).

    streaming: the input pipeline owns sampling — the step's data
    argument becomes the host-fed pair (idx (B,), y_cat (B, sum D_v))
    with the views CONCATENATED column-wise (one mmap'd matrix on the
    host); config.view_dims splits it back. Identical math to the
    resident path at equal indices."""
    import optax

    from dp_gp_lvm_tpu.train.loop import TrainState

    policy = _policy(config, policy)
    if streaming and len(config.view_dims) != config.num_views:
        raise ValueError(
            "streaming mrd_svi needs Config.view_dims (per-view column "
            f"split of the streamed matrix); got {config.view_dims!r}"
        )

    def rho_at(t):
        if rho_t0 is None:
            return jnp.asarray(rho)
        return rho * (1.0 + t / rho_t0) ** (-rho_kappa)

    def step(state: TrainState, rng, Ys):
        if streaming:
            idx, y_cat = Ys          # host-fed (idx, concatenated rows)
            offs, y_b = 0, []
            for d_v in config.view_dims:
                y_b.append(y_cat[:, offs:offs + d_v])
                offs += d_v
        elif sample_idx is None:
            # int32 pinned so the minibatch sequence is x64-invariant
            idx = jax.random.randint(
                rng, (config.batch,), 0, n_total, dtype=jnp.int32
            )
            y_b = [Y[idx] for Y in Ys]
        else:
            idx = sample_idx(rng)
            y_b = [Y[idx] for Y in Ys]

        def loss_with_stats(p):
            if mesh is not None:
                from dp_gp_lvm_tpu.parallel.sharded_elbo import (
                    mrd_svi_elbo_sharded,
                )

                bound, whitened = mrd_svi_elbo_sharded(
                    p, y_b, idx, n_total, config, mesh,
                    policy=policy, with_aux=True,
                )
                return -bound, whitened
            from dp_gp_lvm_tpu.models import amortized

            c_views = constrain_views(p, config)
            y_cat = jnp.concatenate(y_b, axis=1)
            mu_b, s_b = amortized.qx_batch(c_views[0], y_cat, idx)
            scale = jnp.asarray(n_total / y_cat.shape[0], y_cat.dtype)
            bounds, whitened = _bounds_per_view(
                c_views, y_b, mu_b, s_b, config, policy, scale
            )
            kl_x = scale * gaussian.kl_to_standard_normal(mu_b, s_b)
            return -(sum(bounds) - kl_x), whitened

        (loss_v, whitened), grads = jax.value_and_grad(
            loss_with_stats, has_aux=True
        )(state.params)
        # q(u^v) moves by natural gradient, not optax
        zeroed = []
        for gv in grads["views"]:
            zeroed.append({
                **gv,
                "u_mean": jnp.zeros_like(gv["u_mean"]),
                "raw_u_scale": jnp.zeros_like(gv["raw_u_scale"]),
            })
        grads = {**grads, "views": zeroed}
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        rho_t = rho_at(state.step)
        views = []
        for vp, (a, A2, beta) in zip(params["views"], whitened):
            rho_v = rho_t.astype(A2.dtype)
            cv = svi.constrain(vp, config)
            u_mean, raw_u_scale = svi.natgrad_blend_qu(
                cv["u_mean"], cv["u_scale"], a, A2, beta, rho_v, policy,
                trust=qu_trust,
            )
            views.append(svi._guarded_qu(vp, u_mean, raw_u_scale))
        params = {**params, "views": views}

        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss_v, "elbo_estimate": -loss_v},
        )

    return jax.jit(step)


def predict_view(params, x_mean, x_var, view: int, config: Config,
                 policy: JitterPolicy | None = None):
    """Predictive mean/variance of one view at q(x*) rows, directly
    from that view's explicit q(u^v)."""
    return svi.predict_from_latent(
        _view_params(params, view), x_mean, x_var, _svi_config(config),
        policy,
    )


def infer_latent(params, observed: dict[int, jnp.ndarray], m_init,
                 config: Config, num_steps: int = 200, lr: float = 0.05,
                 tol: float | None = None,
                 policy: JitterPolicy | None = None):
    """Fit the shared q(x*) = N(m*, diag s*) for new rows against the
    SUM of the observed views' expected log-likelihoods under their
    q(u^v) (dict view_index -> (N*, D_v)); no training data needed."""
    from dp_gp_lvm_tpu.models.prediction import _fit_variational

    policy = _policy(config, policy)
    items = sorted(observed.items())
    caches = []
    for v, y in items:
        c = svi.constrain(_view_params(params, v), config)
        kuu = dispatch.gram(
            c["variance"], c["ard"], c["z"], kernel=config.kernel
        )
        L, _ = safe_cholesky(kuu, policy)
        caches.append((c, L, y))
    scfg = _svi_config(config)
    dtype = items[0][1].dtype
    log2pi = jnp.log(2.0 * jnp.pi).astype(dtype)
    var_params = {
        "m": m_init.astype(dtype),
        "raw_s": positive_inverse(0.1 * jnp.ones_like(m_init)).astype(dtype),
    }

    def objective(vp):
        from dp_gp_lvm_tpu.core.transforms import positive_variational_var

        s = positive_variational_var(vp["raw_s"])
        ell = 0.0
        for c, L, y in caches:
            phi, gp_var, m_quad = svi._latent_row_pieces(
                c, L, vp["m"], s, scfg
            )
            f_mean = jnp.dot(phi, c["u_mean"], precision=_HIGHEST)
            sq = y * y - 2.0 * y * f_mean + m_quad + gp_var[:, None]
            beta = 1.0 / c["noise"]
            ell = ell + jnp.sum(
                -0.5 * (log2pi + jnp.log(c["noise"])) - 0.5 * beta * sq
            )
        kl = gaussian.kl_to_standard_normal(vp["m"], s)
        return -(ell - kl)

    vp, trace, _ = _fit_variational(objective, var_params, num_steps, lr, tol)
    from dp_gp_lvm_tpu.core.transforms import positive_variational_var

    return vp["m"], positive_variational_var(vp["raw_s"]), -trace


def _latent_init(params, observed: dict[int, jnp.ndarray], config: Config,
                 init_table=None):
    """q(x*) means init. Amortized: one encoder pass with unobserved
    views filled at the encoder center (zero contribution after
    centering). Resident: nearest training latent by predicted-mean
    distance in the first observed view (N-capped candidate set)."""
    items = sorted(observed.items())
    c0 = svi.constrain(_view_params(params, items[0][0]), config)
    dims = [vp["u_mean"].shape[1] for vp in params["views"]]
    if "qx_mean" not in c0:
        from dp_gp_lvm_tpu.models import amortized

        n_star = items[0][1].shape[0]
        offs = [0]
        for d_v in dims:
            offs.append(offs[-1] + d_v)
        y_cat = jnp.broadcast_to(
            c0["enc_mean"][None, :], (n_star, offs[-1])
        )
        mask = jnp.zeros((n_star, offs[-1]), items[0][1].dtype)
        for v, y in items:
            y_cat = y_cat.at[:, offs[v]:offs[v + 1]].set(y)
            mask = mask.at[:, offs[v]:offs[v + 1]].set(1.0)
        return amortized.encoder_fill_init(c0, y_cat, mask)
    v0, y0 = items[0]
    if init_table is None:
        init_table = candidate_table(params, v0, config)
    cand, cand_mean = init_table
    d2 = jnp.sum((y0[:, None, :] - cand_mean[None, :, :]) ** 2, axis=-1)
    return cand[jnp.argmin(d2, axis=1)]


def cross_view_sample(rng, params, observed: dict[int, jnp.ndarray],
                      target_view: int, config: Config,
                      num_samples: int, num_steps: int = 200,
                      lr: float = 0.05, tol: float | None = None,
                      num_features: int = 2048, init_table=None):
    """GENERATIVE cross-view serving: joint function draws of the target
    view at new rows, with latent uncertainty propagated — infer the
    shared q(x*) from the observed views, draw x_s ~ q(x*) per sample,
    and evaluate S pathwise posterior draws of the target view's
    explicit q(u^v) at their own latent draws. Returns (S, N*, D_target)
    noise-free values, jointly consistent across rows within a sample —
    the capability the moment predictive (cross_view_predict) cannot
    provide (e.g. plausible novel trajectories of the unobserved view).
    Marginal moments converge to cross_view_predict's (mean, var−noise)."""
    from dp_gp_lvm_tpu.models import sampling

    m0 = _latent_init(params, observed, config, init_table)
    m_s, s_s, _ = infer_latent(
        params, observed, m0, config, num_steps, lr, tol
    )
    r_f, r_x = jax.random.split(rng)
    smp = sampling.make_svi_pathwise_sampler(
        r_f, _view_params(params, target_view), _svi_config(config),
        num_samples, num_features=num_features,
    )
    x_draws = m_s[None] + jnp.sqrt(s_s)[None] * jax.random.normal(
        r_x, (num_samples,) + m_s.shape, m_s.dtype
    )
    return sampling.sample_at_latent_draws(smp, x_draws)


def candidate_table(params, view: int, config: Config):
    """Resident-mode nearest-neighbour init table for `view`:
    (cand (C, Q) latents, cand_mean (C, D_view) their predicted means).
    Params-only — compile-once serving factories
    (serving.make_mrd_svi_predictor) hoist this to factory time so the
    per-request program never re-lowers the C-candidate predict_view
    pipeline (the pattern of the other factories in models/serving.py)."""
    c0 = svi.constrain(_view_params(params, view), config)
    n = c0["qx_mean"].shape[0]
    take = jnp.arange(0, n, max(1, n // 4096))
    cand, cand_var = c0["qx_mean"][take], c0["qx_var"][take]
    mean, _ = predict_view(params, cand, cand_var, view, config)
    return cand, mean


def cross_view_predict(params, observed: dict[int, jnp.ndarray],
                       target_view: int, config: Config,
                       num_steps: int = 200, lr: float = 0.05,
                       tol: float | None = None, init_table=None):
    """MRD cross-view serving from q(u) alone: observe some views of new
    rows, infer the shared q(x*), predict the target view. Returns
    (mean, var, m*, s*, objective trace). init_table: precomputed
    candidate_table() for the first observed view (serving factories)."""
    m0 = _latent_init(params, observed, config, init_table)
    m_s, s_s, trace = infer_latent(
        params, observed, m0, config, num_steps, lr, tol
    )
    mean, var = predict_view(params, m_s, s_s, target_view, config)
    return mean, var, m_s, s_s, trace
