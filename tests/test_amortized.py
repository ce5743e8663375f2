"""Amortized q(X) (recognition network, models/amortized.py) for the
SVI-GPLVM.

Oracles:
  1. Init equivalence: the PCA-readout encoder is constructed so
     encode(Y) at init EQUALS the resident init (PCA means, variance
     0.5) — hence the amortized ELBO equals the resident ELBO at init,
     exactly, for any hidden width (zero-initialized correction heads).
  2. The minibatch estimator stays exact over a disjoint partition
     (row terms remain linear in row sums; encoding replaces the
     gather without touching that structure).
  3. The sharded program equals single-device — values AND encoder
     gradients (the shard_map transpose psums replicated-leaf
     cotangents).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import amortized, svi_gplvm
from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state


def _setup(n=48, d=5, q=2, m=8, hidden=16, batch=16):
    Y, _ = synthetic.toy_gplvm(jax.random.PRNGKey(0), n=n, d=d, q_true=2,
                               q_total=q)
    cfg = svi_gplvm.Config(num_latent=q, num_inducing=m, batch=batch,
                           amortized=True, encoder_hidden=hidden)
    params = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    return Y, cfg, params


def test_init_encode_matches_resident_init():
    """encode(Y) at init == (PCA latents, 0.5) for hidden=0 AND
    hidden>0 (zero correction heads), so the amortized bound starts at
    the resident bound exactly."""
    from dp_gp_lvm_tpu.train.init import pca_latents

    for hidden in (0, 16):
        Y, cfg, params = _setup(hidden=hidden)
        mu, s = amortized.encode(params, Y)
        np.testing.assert_allclose(
            np.asarray(mu), np.asarray(pca_latents(Y, cfg.num_latent)),
            atol=1e-9,
        )
        # both modes share the +1e-8 positive_variational_var floor
        np.testing.assert_allclose(np.asarray(s), 0.5, rtol=1e-7)

        rcfg = cfg._replace(amortized=False)
        rparams = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, rcfg)
        ea = float(svi_gplvm.elbo(params, Y, cfg))
        er = float(svi_gplvm.elbo(rparams, Y, rcfg))
        np.testing.assert_allclose(ea, er, rtol=1e-9)


def test_minibatch_partition_averages_to_full_bound():
    Y, cfg, params = _setup(n=48)
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    full = float(svi_gplvm.elbo(params, Y, cfg))
    n, b = Y.shape[0], cfg.batch
    ests = []
    for start in range(0, n, b):
        idx = jnp.arange(start, start + b)
        ests.append(float(svi_gplvm.elbo_minibatch(
            params, Y[idx], idx, n, cfg
        )))
    np.testing.assert_allclose(np.mean(ests), full, rtol=1e-10)


def test_amortized_training_improves_full_elbo():
    """Natural-gradient SVI trains the encoder (leaves labeled "var");
    the gp_optimizer ngd_lr guard must not crash on the table-free
    params."""
    Y, cfg, params = _setup()
    n = Y.shape[0]
    # ngd_lr set on purpose: no qx table leaves -> the guard drops the
    # ngd group instead of feeding MaskedNodes to the preconditioner
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = svi_gplvm.make_svi_natgrad_step(cfg, n, opt, rho=0.5)
    state = init_state(params, opt)
    before = float(svi_gplvm.elbo(params, Y, cfg))
    rng = jax.random.PRNGKey(2)
    for _ in range(120):
        rng, k = jax.random.split(rng)
        state, _ = step(state, k, Y)
    after = float(svi_gplvm.elbo(state.params, Y, cfg))
    assert np.isfinite(after)
    assert after > before + 10.0, (before, after)
    # the encoder genuinely moved (it is not frozen by mislabeling)
    moved = sum(
        float(jnp.sum(jnp.abs(state.params[k] - params[k])))
        for k in params if k.startswith("enc_")
    )
    assert moved > 1e-3, moved


def test_amortized_sharded_matches_single_device():
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib
    from dp_gp_lvm_tpu.parallel.sharded_elbo import (
        svi_elbo_sharded,
        svi_loss_sharded,
    )

    Y, cfg, params = _setup(n=64)
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    n = Y.shape[0]
    idx = jnp.arange(0, 32)
    y_b = Y[idx]
    mesh = mesh_lib.make_mesh(data=8, model=1)
    single = float(svi_gplvm.elbo_minibatch(params, y_b, idx, n, cfg))
    sharded = float(svi_elbo_sharded(params, y_b, idx, n, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-9)
    g1 = jax.grad(
        lambda p: svi_gplvm.loss_minibatch(p, y_b, idx, n, cfg)
    )(params)
    g2 = jax.grad(
        lambda p: svi_loss_sharded(p, y_b, idx, n, cfg, mesh)
    )(params)
    assert set(g1) == set(g2) and any(k.startswith("enc_") for k in g1)
    for k in g1:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-7, atol=1e-9,
            err_msg=k,
        )


def _dp_setup(n=40, dims=(4, 4), q=2, m=8, t=3, hidden=8):
    from dp_gp_lvm_tpu.models import dp_svi

    Y, labels, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(3), n=n, dims_per_group=dims, q=q, noise=0.01
    )
    cfg = dp_svi.Config(num_latent=q, num_inducing=m, truncation=t,
                        batch=16, amortized=True, encoder_hidden=hidden)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Y, cfg)
    return Y, cfg, params


def test_dp_svi_amortized_init_matches_resident():
    """The flagship DP-SVI bound at amortized init equals the resident
    bound at init exactly (same rng -> same hypers/phi; encode(Y) ==
    the table init)."""
    from dp_gp_lvm_tpu.models import dp_svi

    Y, cfg, params = _dp_setup()
    rcfg = cfg._replace(amortized=False)
    rparams = dp_svi.init_params(jax.random.PRNGKey(1), Y, rcfg)
    ea = float(dp_svi.elbo(params, Y, cfg))
    er = float(dp_svi.elbo(rparams, Y, rcfg))
    np.testing.assert_allclose(ea, er, rtol=1e-9)


def test_dp_svi_amortized_split_keeps_encoder():
    """split_single_atom (T=1 -> T clone, the c7 staged recipe's pivot)
    passes recognition-network leaves through untouched."""
    from dp_gp_lvm_tpu.models import dp_svi

    Y, cfg, _ = _dp_setup()
    cfg1 = cfg._replace(truncation=1)
    p1 = dp_svi.init_params(jax.random.PRNGKey(1), Y, cfg1)
    out = dp_svi.split_single_atom(p1, cfg)
    enc = [k for k in p1 if k.startswith("enc_")]
    assert enc, "amortized init must produce encoder leaves"
    for k in enc:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(p1[k]))
    assert out["raw_noise"].shape == (cfg.truncation,)


def test_dp_svi_amortized_step_trains_and_shards():
    """Natural-gradient DP-SVI steps train the encoder; the sharded
    (4 data x 2 model) step matches the single-device step exactly at
    equal batch indices."""
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib

    Y, cfg, params = _dp_setup(t=2)
    n = Y.shape[0]
    fixed = jnp.arange(0, 16)
    opt = gp_optimizer(params, lr=1e-2)

    def sampler(rng):
        return fixed

    step1 = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.5,
                                    sample_idx=sampler)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    step2 = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.5,
                                    sample_idx=sampler, mesh=mesh)
    s1 = init_state(params, opt)
    s2 = init_state(params, opt)
    k = jax.random.PRNGKey(7)
    for _ in range(3):
        k, kk = jax.random.split(k)
        s1, m1 = step1(s1, kk, Y)
        s2, m2 = step2(s2, kk, Y)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-7)
    for key in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[key]), np.asarray(s2.params[key]),
            rtol=1e-6, atol=1e-8, err_msg=key,
        )
    # longer single-device run improves the full bound and moves the
    # encoder
    before = float(dp_svi.elbo(params, Y, cfg))
    state = init_state(params, opt)
    step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.5)
    rng = jax.random.PRNGKey(5)
    for _ in range(60):
        rng, kk = jax.random.split(rng)
        state, _ = step(state, kk, Y)
    after = float(dp_svi.elbo(state.params, Y, cfg))
    assert np.isfinite(after) and after > before + 5.0, (before, after)


def test_amortized_streaming_step_equals_resident():
    """streaming=True composes with amortized=True: the host-fed
    (idx, rows) step is bit-identical to the resident step at equal
    indices — with the encoder there is NO device-side q(X) state or
    gather at all, completing the beyond-HBM story."""
    from dp_gp_lvm_tpu.models import dp_svi

    Y, cfg, params = _dp_setup(t=2)
    n = Y.shape[0]
    opt = gp_optimizer(params, lr=1e-2)
    idx = jnp.asarray(np.array([3, 3, 0, 31, 17, 4, 22, 8], np.int32))

    res_step = dp_svi.make_dp_svi_step(
        cfg, n, opt, rho=0.3, sample_idx=lambda r: idx
    )
    str_step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.3,
                                       streaming=True)
    r = jax.random.PRNGKey(2)
    st_res, m_res = res_step(init_state(params, opt), r, Y)
    st_str, m_str = str_step(init_state(params, opt), r, (idx, Y[idx]))
    assert float(m_res["loss"]) == float(m_str["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                    jax.tree_util.tree_leaves(st_str.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_amortized_streaming_on_mesh_equals_resident_mesh():
    """The full beyond-HBM production composition in one step:
    amortized q(X) x host-streamed batches x (data x model) mesh. The
    streamed step equals the resident mesh step at equal indices — no
    device-side q(X) state, no gather, rows psummed over the data axis,
    atoms over the model axis."""
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib, recipe

    Y, cfg, params = _dp_setup(t=2)
    n = Y.shape[0]
    mesh = mesh_lib.make_mesh(data=4, model=2)
    opt = gp_optimizer(params, lr=1e-2)
    idx = np.array([7, 7, 2, 31, 20, 1, 14, 9], np.int32)

    res_step = dp_svi.make_dp_svi_step(
        cfg._replace(batch=8), n, opt, rho=0.3, mesh=mesh,
        sample_idx=lambda r: jnp.asarray(idx),
    )
    str_step = dp_svi.make_dp_svi_step(
        cfg._replace(batch=8), n, opt, rho=0.3, mesh=mesh,
        streaming=True,
    )
    p_m, (Y_m,) = recipe.place_svi("dp_svi", params, (Y,), mesh)
    r = jax.random.PRNGKey(2)
    st_res, m_res = res_step(init_state(p_m, opt), r, Y_m)
    st_str, m_str = str_step(
        init_state(p_m, opt), r, (jnp.asarray(idx), Y[idx])
    )
    np.testing.assert_allclose(float(m_res["loss"]),
                               float(m_str["loss"]), rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                    jax.tree_util.tree_leaves(st_str.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_amortized_impute_from_encoder_init():
    """Serving: new rows with half the dims missing — the encoder
    provides the q(x*) init in one pass (missing dims filled at
    enc_mean contribute zero), then the masked-ELL refinement runs as
    in resident mode. Must beat column-mean imputation."""
    Y, cfg, params = _setup(n=64)
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    n = Y.shape[0]
    opt = gp_optimizer(params, lr=2e-2)
    step = svi_gplvm.make_svi_natgrad_step(cfg, n, opt, rho=0.5)
    state = init_state(params, opt)
    rng = jax.random.PRNGKey(3)
    for _ in range(150):
        rng, k = jax.random.split(rng)
        state, _ = step(state, k, Y)
    params = svi_gplvm.set_optimal_qu(state.params, Y, cfg)

    y_star = Y[:8]
    mask = jnp.ones_like(y_star).at[:, ::2].set(0.0)
    mean, var, m_s, s_s, _ = svi_gplvm.impute(
        params, y_star * mask, mask, cfg, num_steps=150, lr=0.05
    )
    miss = 1.0 - mask
    mse = float(jnp.sum(((mean - y_star) ** 2) * miss) / jnp.sum(miss))
    col_mean = jnp.mean(Y, axis=0)
    mse_base = float(
        jnp.sum(((col_mean[None, :] - y_star) ** 2) * miss) / jnp.sum(miss)
    )
    assert np.isfinite(mse)
    assert mse < 0.6 * mse_base, (mse, mse_base)
    assert np.all(np.asarray(var) > 0)

    # one-forward-pass serving (models/serving.make_encoder_imputer):
    # no optimization loop at all — still beats the mean baseline
    from dp_gp_lvm_tpu.models import serving

    imputer = serving.make_encoder_imputer(params, cfg)
    mean0, var0 = imputer(y_star * mask, mask)
    mse0 = float(jnp.sum(((mean0 - y_star) ** 2) * miss) / jnp.sum(miss))
    assert np.isfinite(mse0) and np.all(np.asarray(var0) > 0)
    assert mse0 < mse_base, (mse0, mse_base)
    # refinement from the encoded init matches the full pipeline's
    # quality ballpark (same objective, same step count)
    imputer_r = serving.make_encoder_imputer(params, cfg,
                                             refine_steps=150)
    mean_r, _ = imputer_r(y_star * mask, mask)
    mse_r = float(
        jnp.sum(((mean_r - y_star) ** 2) * miss) / jnp.sum(miss)
    )
    assert mse_r < 0.75 * mse_base, (mse_r, mse_base)
