"""Minibatch MRD (models/mrd_svi.py).

Oracles (mirroring tests/test_svi.py, lifted to multi-view):
  1. V=1 reduces EXACTLY to the single-view svi_gplvm bound.
  2. At the per-view closed-form optimal q(u^v) the bound EQUALS the
     collapsed mrd.elbo (views couple only through q(X), so per-view
     optima are jointly optimal).
  3. A disjoint-partition minibatch average equals the full-batch bound.
  4. A rho=1 full-batch natural-gradient step lands every view's q(u^v)
     on the collapsed optimum (asserted on the post-step bound itself,
     with hypers/q(X) frozen so the collapsed target is unchanged).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import mrd, mrd_svi, svi_gplvm
from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state


def _setup(n=48, d1=5, d2=7, q=3, m=8, batch=16, **kw):
    Y1, Y2, _ = synthetic.two_view(
        jax.random.PRNGKey(0), n=n, d1=d1, d2=d2, q_shared=1, q_private=1
    )
    cfg = mrd_svi.Config(
        num_latent=q, num_inducing=m, num_views=2, batch=batch, **kw
    )
    params = mrd_svi.init_params(jax.random.PRNGKey(1), (Y1, Y2), cfg)
    return (Y1, Y2), cfg, params


def _collapsed_elbo(params, Ys, cfg):
    mcfg = mrd.Config(num_latent=cfg.num_latent,
                      num_inducing=cfg.num_inducing,
                      num_views=cfg.num_views)
    mparams = {
        "qx_mean": params["qx_mean"],
        "raw_qx_var": params["raw_qx_var"],
        "views": [
            {k: vp[k] for k in ("z", "raw_variance", "raw_ard", "raw_noise")}
            for vp in params["views"]
        ],
    }
    return float(mrd.elbo(mparams, Ys, mcfg))


def test_single_view_reduces_to_svi_gplvm():
    Y, _ = synthetic.toy_gplvm(jax.random.PRNGKey(0), n=40, d=6, q_true=2,
                               q_total=3)
    cfg = mrd_svi.Config(num_latent=3, num_inducing=8, num_views=1)
    params = mrd_svi.init_params(jax.random.PRNGKey(1), (Y,), cfg)
    scfg = svi_gplvm.Config(num_latent=3, num_inducing=8)
    sparams = {**{k: params[k] for k in params if k != "views"},
               **params["views"][0]}
    a = float(mrd_svi.elbo(params, (Y,), cfg))
    b = float(svi_gplvm.elbo(sparams, Y, scfg))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_optimal_qu_recovers_collapsed_mrd():
    Ys, cfg, params = _setup()
    params = mrd_svi.set_optimal_qu(params, Ys, cfg)
    svi_val = float(mrd_svi.elbo(params, Ys, cfg))
    collapsed = _collapsed_elbo(params, Ys, cfg)
    np.testing.assert_allclose(svi_val, collapsed, rtol=1e-6)
    # init q(u) = prior: valid but strictly below
    _, _, p0 = _setup()
    below = float(mrd_svi.elbo(p0, Ys, cfg))
    assert below < collapsed - 1.0, (below, collapsed)


def test_minibatch_partition_averages_to_full_bound():
    Ys, cfg, params = _setup(n=48, batch=16)
    params = mrd_svi.set_optimal_qu(params, Ys, cfg)
    full = float(mrd_svi.elbo(params, Ys, cfg))
    n, b = Ys[0].shape[0], cfg.batch
    ests = []
    for start in range(0, n, b):
        idx = jnp.arange(start, start + b)
        ests.append(float(mrd_svi.elbo_minibatch(
            params, [Y[idx] for Y in Ys], idx, n, cfg
        )))
    np.testing.assert_allclose(np.mean(ests), full, rtol=1e-10)


def test_natgrad_full_batch_rho1_lands_on_optimum():
    """One rho=1 step whose 'minibatch' is the full data, with every
    non-q(u) leaf frozen: the post-step params must satisfy the
    collapsed-bound identity (drives make_svi_natgrad_step's actual
    blend — conversion, mixing, scale — not set_optimal_qu)."""
    Ys, cfg, params = _setup(n=48, batch=48)
    n = Ys[0].shape[0]
    opt = gp_optimizer(
        params, lr=0.0, freeze=frozenset(
            {"qx_mean", "raw_qx_var", "z", "raw_variance", "raw_ard",
             "raw_noise"}
        ),
    )
    step = mrd_svi.make_svi_natgrad_step(
        cfg, n, opt, rho=1.0, sample_idx=lambda rng: jnp.arange(n)
    )
    state = init_state(params, opt)
    state, _ = step(state, jax.random.PRNGKey(0), Ys)
    stepped = float(mrd_svi.elbo(state.params, Ys, cfg))
    collapsed = _collapsed_elbo(state.params, Ys, cfg)
    np.testing.assert_allclose(stepped, collapsed, rtol=1e-6)


def test_svi_training_improves_full_elbo():
    Ys, cfg, params = _setup()
    n = Ys[0].shape[0]
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = mrd_svi.make_svi_natgrad_step(cfg, n, opt, rho=0.2)
    state = init_state(params, opt)
    e0 = float(mrd_svi.elbo(state.params, Ys, cfg))
    rng = jax.random.PRNGKey(3)
    for _ in range(150):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, Ys)
    e1 = float(mrd_svi.elbo(state.params, Ys, cfg))
    assert np.isfinite(e1)
    assert e1 > e0 + 1.0, (e0, e1)
    assert mrd_svi.ard_relevance(state.params).shape == (
        2, cfg.num_latent
    )


def test_cross_view_prediction_beats_mean_baseline():
    """Observe view 1 of held-out rows, predict view 2 — must beat the
    train-mean baseline (same data regime and criterion as the collapsed
    analogue, tests/test_prediction.py test_mrd_cross_view_prediction;
    the RBF marginalization over private dims caps the achievable ratio
    well above 0 — see synthetic.two_view docstring). Trains full-batch
    at rho=1, the collapsed-equivalent regime (each step's q(u^v) blend
    lands on the batch optimum); the svi_gplvm inference path on the
    identically-trained collapsed model matches predict_view_from_views
    to 5 significant digits (ratio 0.9155 both; measured 2026-08-18),
    and this recipe reaches ~0.85."""
    rng = jax.random.PRNGKey(31)
    Y1, Y2, _ = synthetic.two_view(rng, n=60, d1=6, d2=6, q_shared=2,
                                   q_private=1, noise=0.01)
    Ys = (Y1, Y2)
    n_tr = 48
    Ys_tr = [Y[:n_tr] for Y in Ys]
    cfg = mrd_svi.Config(num_latent=4, num_inducing=12, num_views=2,
                         batch=n_tr)
    params = mrd_svi.init_params(jax.random.PRNGKey(32), Ys_tr, cfg)
    opt = gp_optimizer(params, lr=2e-2)
    step = mrd_svi.make_svi_natgrad_step(cfg, n_tr, opt, rho=1.0)
    state = init_state(params, opt)
    rng = jax.random.PRNGKey(5)
    for _ in range(600):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, sub, Ys_tr)
    y1_te, y2_te = Ys[0][n_tr:], Ys[1][n_tr:]
    mean, var, _, _, _ = mrd_svi.cross_view_predict(
        state.params, {0: y1_te}, 1, cfg, num_steps=150
    )
    assert bool(jnp.all(jnp.isfinite(mean))) and bool(jnp.all(var > 0))
    mse = float(jnp.mean((mean - y2_te) ** 2))
    base = float(jnp.mean((y2_te - Ys[1][:n_tr].mean(axis=0)) ** 2))
    assert mse < base, (mse, base)


def test_mrd_svi_sharded_matches_single_device():
    """Sharded minibatch MRD-SVI (parallel/sharded_elbo.
    mrd_svi_elbo_sharded) equals elbo_minibatch — values and gradients —
    on the 8-device mesh."""
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib
    from dp_gp_lvm_tpu.parallel.sharded_elbo import (
        mrd_svi_elbo_sharded,
        mrd_svi_loss_sharded,
    )

    Ys, cfg, params = _setup()
    params = mrd_svi.set_optimal_qu(params, Ys, cfg)
    n = Ys[0].shape[0]
    idx = jnp.arange(0, 32)
    y_b = [Y[idx] for Y in Ys]
    mesh = mesh_lib.make_mesh(data=8, model=1)
    single = float(mrd_svi.elbo_minibatch(params, y_b, idx, n, cfg))
    sharded = float(mrd_svi_elbo_sharded(params, y_b, idx, n, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-9)
    g1 = jax.grad(
        lambda p: mrd_svi.loss_minibatch(p, y_b, idx, n, cfg)
    )(params)
    g2 = jax.grad(
        lambda p: mrd_svi_loss_sharded(p, y_b, idx, n, cfg, mesh)
    )(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9
        )


def test_mrd_svi_mesh_step_matches_single_device():
    """One full natgrad step (optax update + per-view q(u^v) blend)
    through the mesh program equals the single-device step leaf-for-leaf
    at a deterministic batch."""
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib, recipe

    Ys, cfg, params = _setup()
    n = Ys[0].shape[0]
    mesh = mesh_lib.make_mesh(data=8, model=1)
    fixed = lambda rng: jnp.arange(16)

    opt = gp_optimizer(params, lr=2e-2)
    st1, _ = mrd_svi.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, sample_idx=fixed
    )(init_state(params, opt), jax.random.PRNGKey(0), Ys)

    p_m, data_m = recipe.place_svi("mrd_svi", params, tuple(Ys), mesh)
    st2, _ = mrd_svi.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, sample_idx=fixed, mesh=mesh
    )(init_state(p_m, opt), jax.random.PRNGKey(0), data_m)

    flat1 = jax.tree_util.tree_leaves_with_path(st1.params)
    flat2 = jax.tree_util.tree_leaves_with_path(st2.params)
    for (k1, a), (k2, b) in zip(flat1, flat2):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-6, atol=1e-7,
            err_msg=str(k1),
        )


def test_mrd_svi_streaming_step_matches_resident():
    """The streaming step (host-fed (idx, concatenated rows)) equals the
    resident step at equal indices, leaf for leaf."""
    Ys, cfg, params = _setup()
    cfg_s = cfg._replace(view_dims=tuple(Y.shape[1] for Y in Ys))
    n = Ys[0].shape[0]
    idx = jnp.arange(4, 20)
    opt = gp_optimizer(params, lr=2e-2)

    st1, m1 = mrd_svi.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, sample_idx=lambda r: idx
    )(init_state(params, opt), jax.random.PRNGKey(0), Ys)

    y_cat = jnp.concatenate([Y[idx] for Y in Ys], axis=1)
    st2, m2 = mrd_svi.make_svi_natgrad_step(
        cfg_s, n, opt, rho=0.3, streaming=True
    )(init_state(params, opt), jax.random.PRNGKey(0), (idx, y_cat))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_serving_predictor_matches_pipeline():
    """The compile-once cross-view predictor returns the same results
    as the one-shot pipeline (no training data in the closure)."""
    from dp_gp_lvm_tpu.models import serving

    Ys, cfg, params = _setup()
    params = mrd_svi.set_optimal_qu(params, Ys, cfg)
    y_obs = Ys[0][:8]
    mean_ref, var_ref, *_ = mrd_svi.cross_view_predict(
        params, {0: y_obs}, 1, cfg, num_steps=50
    )
    predictor = serving.make_mrd_svi_predictor(
        params, cfg, observed_view=0, target_view=1, num_steps=50,
        tol=None,
    )
    mean, var = predictor(y_obs)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               rtol=1e-6, atol=1e-8)


def test_amortized_mrd_svi_init_equality_and_training():
    """Amortized q(X) over the concatenated views: at init the encoder
    reproduces the resident init exactly, so the bounds are EQUAL; a
    short run trains finitely and cross-view serving works one-pass."""
    Ys, _, _ = _setup()
    cfg_r = mrd_svi.Config(num_latent=3, num_inducing=8, num_views=2,
                           batch=16)
    cfg_a = cfg_r._replace(amortized=True, encoder_hidden=8)
    p_r = mrd_svi.init_params(jax.random.PRNGKey(1), Ys, cfg_r)
    p_a = mrd_svi.init_params(jax.random.PRNGKey(1), Ys, cfg_a)
    e_r = float(mrd_svi.elbo(p_r, Ys, cfg_r))
    e_a = float(mrd_svi.elbo(p_a, Ys, cfg_a))
    np.testing.assert_allclose(e_a, e_r, rtol=1e-10)

    n = Ys[0].shape[0]
    opt = gp_optimizer(p_a, lr=2e-2)
    step = mrd_svi.make_svi_natgrad_step(cfg_a, n, opt, rho=0.2)
    state = init_state(p_a, opt)
    rng = jax.random.PRNGKey(7)
    for _ in range(100):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, sub, Ys)
    e1 = float(mrd_svi.elbo(state.params, Ys, cfg_a))
    assert np.isfinite(e1) and e1 > e_a, (e_a, e1)
    mean, var, _, _, _ = mrd_svi.cross_view_predict(
        state.params, {0: Ys[0][:8]}, 1, cfg_a, num_steps=50
    )
    assert mean.shape == (8, Ys[1].shape[1])
    assert bool(jnp.all(jnp.isfinite(mean))) and bool(jnp.all(var > 0))


def test_cross_view_sample_moments_match_predictive():
    """Generative cross-view draws (latent uncertainty propagated):
    sample mean/var converge to cross_view_predict's (mean, var − noise)
    — the marginal-moment oracle. Plus the degenerate-equality check:
    identical latent draws across samples reduce sample_at_latent_draws
    to sample_at exactly."""
    from dp_gp_lvm_tpu.models import sampling, svi_gplvm

    Ys, cfg, params = _setup()
    params = mrd_svi.set_optimal_qu(params, Ys, cfg)
    y_obs = Ys[0][:6]
    rng = jax.random.PRNGKey(9)
    s = 4000
    f = np.asarray(mrd_svi.cross_view_sample(
        rng, params, {0: y_obs}, 1, cfg, num_samples=s, num_steps=80,
        num_features=4096,
    ))
    assert f.shape == (s, 6, Ys[1].shape[1])
    mean, var, m_s, s_s, _ = mrd_svi.cross_view_predict(
        params, {0: y_obs}, 1, cfg, num_steps=80
    )
    noise = float(svi_gplvm.constrain(
        mrd_svi._view_params(params, 1))["noise"])
    mean, fvar = np.asarray(mean), np.maximum(np.asarray(var) - noise, 0.0)
    scale = float(np.sqrt(np.asarray(
        svi_gplvm.constrain(mrd_svi._view_params(params, 1))["variance"])))
    assert np.max(np.abs(f.mean(0) - mean)) < 0.15 * scale
    assert np.max(np.abs(np.sqrt(f.var(0)) - np.sqrt(fvar))) < 0.15 * scale

    # degenerate equality: same x for every sample == sample_at
    smp = sampling.make_svi_pathwise_sampler(
        jax.random.PRNGKey(1), mrd_svi._view_params(params, 1),
        mrd_svi._svi_config(cfg), num_samples=16, num_features=512,
    )
    x0 = jnp.asarray(m_s[:4])
    a = sampling.sample_at(smp, x0)
    b = sampling.sample_at_latent_draws(
        smp, jnp.broadcast_to(x0[None], (16,) + x0.shape)
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-8)


def test_amortized_streaming_on_mesh_equals_resident_mesh():
    """The full beyond-HBM composition for the multi-view family:
    amortized q(X) x host-streamed concatenated batches x data mesh.
    The streamed step equals the resident mesh step at equal indices —
    no device-side q(X) state, no per-view gather, rows psummed over
    the data axis (one psum per view)."""
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib, recipe

    Ys, _, _ = _setup()
    cfg = mrd_svi.Config(
        num_latent=3, num_inducing=8, num_views=2, batch=16,
        amortized=True, encoder_hidden=8,
        view_dims=tuple(Y.shape[1] for Y in Ys),
    )
    params = mrd_svi.init_params(jax.random.PRNGKey(1), Ys, cfg)
    n = Ys[0].shape[0]
    mesh = mesh_lib.make_mesh(data=8, model=1)
    opt = gp_optimizer(params, lr=1e-2)
    idx = jnp.asarray(np.array([7, 7, 2, 31, 20, 1, 14, 9,
                                3, 40, 11, 5, 28, 33, 0, 19], np.int32))

    res_step = mrd_svi.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, mesh=mesh, sample_idx=lambda r: idx,
    )
    str_step = mrd_svi.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, mesh=mesh, streaming=True,
    )
    p_m, data_m = recipe.place_svi("mrd_svi", params, tuple(Ys), mesh)
    r = jax.random.PRNGKey(2)
    st_res, m_res = res_step(init_state(p_m, opt), r, data_m)
    y_cat = jnp.concatenate([Y[idx] for Y in Ys], axis=1)
    st_str, m_str = str_step(init_state(p_m, opt), r, (idx, y_cat))
    np.testing.assert_allclose(float(m_res["loss"]),
                               float(m_str["loss"]), rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                    jax.tree_util.tree_leaves(st_str.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
