"""Multi-device tests on the 8-fake-CPU mesh (SURVEY.md section 4c):
sharded ELBOs match the single-device reference implementations exactly,
and their gradients agree — data parallelism here is a pure reduction
restructure, not an approximation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm
from dp_gp_lvm_tpu.parallel import mesh as mesh_lib
from dp_gp_lvm_tpu.parallel.sharded_elbo import (
    bgplvm_elbo_sharded,
    bgplvm_loss_sharded,
    dp_elbo_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 fake devices"
)


@pytest.fixture(scope="module")
def toy():
    Y, _ = synthetic.toy_gplvm(
        jax.random.PRNGKey(0), n=48, d=6, q_true=2, q_total=3
    )
    return Y


def test_bgplvm_sharded_matches_single_device(toy):
    Y = toy
    cfg = bgplvm.Config(num_latent=3, num_inducing=8)
    params = bgplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    single = float(bgplvm.elbo(params, Y, cfg))
    sharded = float(bgplvm_elbo_sharded(params, Y, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-9)


def test_bgplvm_sharded_gradients_match(toy):
    Y = toy
    cfg = bgplvm.Config(num_latent=3, num_inducing=8)
    params = bgplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    g1 = jax.grad(bgplvm.loss)(params, Y, cfg)
    g2 = jax.grad(lambda p: bgplvm_loss_sharded(p, Y, cfg, mesh))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9
        )


def test_dp_sharded_2d_mesh_matches_single_device(toy):
    Y = toy
    cfg = dp_gp_lvm.Config(num_latent=3, num_inducing=8, truncation=4)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(2), Y, cfg)
    single = float(dp_gp_lvm.elbo(params, Y, cfg))
    for data, model in [(8, 1), (4, 2), (2, 4)]:
        mesh = mesh_lib.make_mesh(data=data, model=model)
        sharded = float(dp_elbo_sharded(params, Y, cfg, mesh))
        np.testing.assert_allclose(sharded, single, rtol=1e-9, err_msg=f"{data}x{model}")


def test_dp_sharded_under_jit(toy):
    Y = toy
    cfg = dp_gp_lvm.Config(num_latent=3, num_inducing=8, truncation=4)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(2), Y, cfg)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    f = jax.jit(lambda p, y: dp_elbo_sharded(p, y, cfg, mesh))
    np.testing.assert_allclose(
        float(f(params, Y)), float(dp_gp_lvm.elbo(params, Y, cfg)),
        rtol=1e-9,
    )


def test_dp_sharded_gradients_match(toy):
    Y = toy
    cfg = dp_gp_lvm.Config(num_latent=3, num_inducing=8, truncation=4)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(2), Y, cfg)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    from dp_gp_lvm_tpu.parallel.sharded_elbo import dp_loss_sharded

    g1 = jax.grad(lambda p: dp_gp_lvm.loss(p, Y, cfg))(params)
    g2 = jax.grad(lambda p: dp_loss_sharded(p, Y, cfg, mesh))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_dp_sharded_fused_pallas_matches(toy):
    """VERDICT r1 item 1: the fused Pallas suffstats kernel composed with
    the shard_map program — values and gradients match the single-device
    pure-JAX path on 2D meshes."""
    Y = toy
    cfg_ref = dp_gp_lvm.Config(num_latent=3, num_inducing=8, truncation=4)
    cfg_pal = dp_gp_lvm.Config(
        num_latent=3, num_inducing=8, truncation=4, use_pallas=True
    )
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(2), Y, cfg_ref)
    single = float(dp_gp_lvm.elbo(params, Y, cfg_ref))
    from dp_gp_lvm_tpu.parallel.sharded_elbo import dp_loss_sharded

    g_ref = jax.grad(lambda p: dp_gp_lvm.loss(p, Y, cfg_ref))(params)
    for data, model in [(8, 1), (4, 2), (2, 4)]:
        mesh = mesh_lib.make_mesh(data=data, model=model)
        sharded = float(dp_elbo_sharded(params, Y, cfg_pal, mesh))
        np.testing.assert_allclose(
            sharded, single, rtol=1e-5, err_msg=f"{data}x{model}"
        )
        g_pal = jax.grad(lambda p: dp_loss_sharded(p, Y, cfg_pal, mesh))(
            params
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
        ):
            scale = np.maximum(np.max(np.abs(np.asarray(a))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale,
                rtol=2e-4, atol=2e-5, err_msg=f"{data}x{model}",
            )


def test_dp_sharded_includes_hyperprior_and_alpha_terms(toy):
    """ADVICE r1: the sharded objective must equal the single-device one
    when hyperprior_std > 0 and learn_alpha=True (it used to silently
    drop both terms)."""
    Y = toy
    cfg = dp_gp_lvm.Config(
        num_latent=3, num_inducing=8, truncation=4,
        hyperprior_std=1.0, learn_alpha=True,
    )
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(2), Y, cfg)
    assert "raw_alpha" in params
    mesh = mesh_lib.make_mesh(data=4, model=2)
    single = float(dp_gp_lvm.elbo(params, Y, cfg))
    sharded = float(dp_elbo_sharded(params, Y, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-9)
    from dp_gp_lvm_tpu.parallel.sharded_elbo import dp_loss_sharded

    g1 = jax.grad(lambda p: dp_gp_lvm.loss(p, Y, cfg))(params)
    g2 = jax.grad(lambda p: dp_loss_sharded(p, Y, cfg, mesh))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_bgplvm_sharded_hyperprior_matches(toy):
    Y = toy
    cfg = bgplvm.Config(num_latent=3, num_inducing=8, hyperprior_std=0.7)
    params = bgplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    np.testing.assert_allclose(
        float(bgplvm_elbo_sharded(params, Y, cfg, mesh)),
        float(bgplvm.elbo(params, Y, cfg)),
        rtol=1e-9,
    )


def test_gspmd_auto_sharding_matches(toy):
    """jit + NamedSharding (GSPMD) on the plain model code equals the
    single-device values and gradients."""
    from dp_gp_lvm_tpu.parallel import auto

    Y = toy
    cfg = bgplvm.Config(num_latent=3, num_inducing=8)
    params = bgplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    p_shard, y_shard = auto.bgplvm_shardings(mesh)
    params_p = auto.place(params, p_shard)
    Y_p = jax.device_put(Y, y_shard)
    f = auto.auto_sharded_value_and_grad(
        lambda p, y: bgplvm.loss(p, y, cfg), p_shard, mesh
    )
    loss, grads = f(params_p, Y_p)
    np.testing.assert_allclose(
        float(loss), float(bgplvm.loss(params, Y, cfg)), rtol=1e-9
    )
    g_ref = jax.grad(bgplvm.loss)(params, Y, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(grads)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9
        )


@pytest.fixture(scope="module")
def two_view():
    Y1, Y2, _ = synthetic.two_view(jax.random.PRNGKey(3), n=48, d1=5, d2=7)
    return Y1, Y2


def test_mrd_sharded_matches_single_device(two_view):
    """VERDICT r1 item 6: MRD gets the same exact shard_map treatment as
    the DP path — values and gradients match single-device."""
    from dp_gp_lvm_tpu.models import mrd
    from dp_gp_lvm_tpu.parallel.sharded_elbo import (
        mrd_elbo_sharded,
        mrd_loss_sharded,
    )

    Ys = list(two_view)
    cfg = mrd.Config(num_latent=3, num_inducing=8, num_views=2)
    params = mrd.init_params(jax.random.PRNGKey(4), Ys, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    single = float(mrd.elbo(params, Ys, cfg))
    sharded = float(mrd_elbo_sharded(params, Ys, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-9)
    g1 = jax.grad(lambda p: mrd.loss(p, Ys, cfg))(params)
    g2 = jax.grad(lambda p: mrd_loss_sharded(p, Ys, cfg, mesh))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9
        )


def test_mrd_sharded_hyperprior_and_jit(two_view):
    from dp_gp_lvm_tpu.models import mrd
    from dp_gp_lvm_tpu.parallel.sharded_elbo import mrd_elbo_sharded

    Ys = list(two_view)
    cfg = mrd.Config(
        num_latent=3, num_inducing=8, num_views=2, hyperprior_std=0.7
    )
    params = mrd.init_params(jax.random.PRNGKey(4), Ys, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    f = jax.jit(lambda p, y1, y2: mrd_elbo_sharded(p, [y1, y2], cfg, mesh))
    np.testing.assert_allclose(
        float(f(params, *Ys)), float(mrd.elbo(params, Ys, cfg)), rtol=1e-9
    )


def test_mrd_sharded_fused_pallas_matches(two_view):
    """Forced fused suffstats kernel (interpret mode on CPU) inside the
    MRD mesh program equals the pure-JAX single-device path."""
    from dp_gp_lvm_tpu.models import mrd
    from dp_gp_lvm_tpu.parallel.sharded_elbo import (
        mrd_elbo_sharded,
        mrd_loss_sharded,
    )

    Ys = list(two_view)
    cfg_ref = mrd.Config(num_latent=3, num_inducing=8, num_views=2)
    cfg_pal = cfg_ref._replace(use_pallas=True)
    params = mrd.init_params(jax.random.PRNGKey(4), Ys, cfg_ref)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    single = float(mrd.elbo(params, Ys, cfg_ref))
    sharded = float(mrd_elbo_sharded(params, Ys, cfg_pal, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-5)
    g_ref = jax.grad(lambda p: mrd.loss(p, Ys, cfg_ref))(params)
    g_pal = jax.grad(lambda p: mrd_loss_sharded(p, Ys, cfg_pal, mesh))(
        params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
    ):
        scale = np.maximum(np.max(np.abs(np.asarray(a))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=2e-4, atol=2e-5,
        )


def test_gspmd_dp_atom_sharding(toy):
    from dp_gp_lvm_tpu.parallel import auto

    Y = toy
    cfg = dp_gp_lvm.Config(num_latent=3, num_inducing=8, truncation=4)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(2), Y, cfg)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    p_shard, y_shard = auto.dp_shardings(mesh)
    params_p = auto.place(params, p_shard)
    Y_p = jax.device_put(Y, y_shard)
    f = auto.auto_sharded_value_and_grad(
        lambda p, y: dp_gp_lvm.loss(p, y, cfg), p_shard, mesh
    )
    loss, grads = f(params_p, Y_p)
    np.testing.assert_allclose(
        float(loss), float(dp_gp_lvm.loss(params, Y, cfg)), rtol=1e-9
    )


def test_dp_svi_sharded_matches_single_device(toy):
    """dp_svi_elbo_sharded on the 2D mesh equals elbo_minibatch —
    values and gradients (batch rows over "data", atoms + q(u|t)
    naturals over "model")."""
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.parallel.sharded_elbo import (
        dp_svi_elbo_sharded,
        dp_svi_loss_sharded,
    )

    Y = toy
    cfg = dp_svi.Config(num_latent=3, num_inducing=8, truncation=4,
                        batch=16)
    params = dp_svi.init_params(jax.random.PRNGKey(2), Y, cfg)
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    n = Y.shape[0]
    idx = jnp.arange(0, 16)
    y_b = Y[idx]
    mesh = mesh_lib.make_mesh(data=4, model=2)
    single = float(dp_svi.elbo_minibatch(params, y_b, idx, n, cfg))
    sharded = float(dp_svi_elbo_sharded(params, y_b, idx, n, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-8)
    g1 = jax.grad(
        lambda p: dp_svi.loss_minibatch(p, y_b, idx, n, cfg)
    )(params)
    g2 = jax.grad(
        lambda p: dp_svi_loss_sharded(p, y_b, idx, n, cfg, mesh)
    )(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_dp_svi_sharded_matches_single_device_with_noise_floor(toy):
    """Config.noise_floor must bind identically on the mesh path: the
    round-3 advisor found dp_svi_elbo_sharded calling constrain without
    config, silently optimizing an UNFLOORED objective under --mesh while
    the natgrad beta used the floored noise. Exactness with a floor high
    enough to actually bind (0.05) is the regression net."""
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.parallel.sharded_elbo import (
        dp_svi_elbo_sharded,
        dp_svi_loss_sharded,
    )

    Y = toy
    cfg = dp_svi.Config(num_latent=3, num_inducing=8, truncation=4,
                        batch=16, noise_floor=0.05)
    params = dp_svi.init_params(jax.random.PRNGKey(2), Y, cfg)
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    # push raw_noise well below the floor so floored != unfloored
    params["raw_noise"] = params["raw_noise"] - 5.0
    n = Y.shape[0]
    idx = jnp.arange(0, 16)
    y_b = Y[idx]
    mesh = mesh_lib.make_mesh(data=4, model=2)
    single = float(dp_svi.elbo_minibatch(params, y_b, idx, n, cfg))
    sharded = float(dp_svi_elbo_sharded(params, y_b, idx, n, cfg, mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-8)
    # and the floor must have bound (otherwise this test is vacuous)
    cfg_nofloor = dp_svi.Config(num_latent=3, num_inducing=8,
                                truncation=4, batch=16)
    unfloored = float(dp_svi.elbo_minibatch(params, y_b, idx, n,
                                            cfg_nofloor))
    assert abs(unfloored - single) > 1e-3
    g1 = jax.grad(
        lambda p: dp_svi.loss_minibatch(p, y_b, idx, n, cfg)
    )(params)
    g2 = jax.grad(
        lambda p: dp_svi_loss_sharded(p, y_b, idx, n, cfg, mesh)
    )(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )


def test_dp_svi_sharded_step_matches_unsharded(toy):
    """make_dp_svi_step(mesh=...) reproduces the unsharded step exactly:
    same deterministic batch, same loss trajectory and parameters."""
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.parallel import recipe
    from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state

    Y = toy
    n = Y.shape[0]
    cfg = dp_svi.Config(num_latent=3, num_inducing=8, truncation=4,
                        batch=16)
    params = dp_svi.init_params(jax.random.PRNGKey(2), Y, cfg)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    det_idx = lambda rng: jax.random.randint(rng, (16,), 0, n)

    opt = gp_optimizer(params, lr=1e-2, ngd_lr=1.0)
    step_1d = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.5,
                                      sample_idx=det_idx)
    step_nd = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.5,
                                      sample_idx=det_idx, mesh=mesh)

    s1 = init_state(params, opt)
    p_m, (Y_m,) = recipe.place_svi("dp_svi", params, (Y,), mesh)
    s2 = init_state(p_m, opt)
    rng = jax.random.PRNGKey(9)
    for k in range(3):
        rng, sub = jax.random.split(rng)
        s1, m1 = step_1d(s1, sub, Y)
        s2, m2 = step_nd(s2, sub, Y_m)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-7
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_svi_natgrad_step_mesh_matches(toy):
    """make_svi_natgrad_step(mesh=...) equals the unsharded step."""
    from dp_gp_lvm_tpu.models import svi_gplvm
    from dp_gp_lvm_tpu.parallel import recipe
    from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state

    Y = toy
    n = Y.shape[0]
    cfg = svi_gplvm.Config(num_latent=3, num_inducing=8, batch=16)
    params = svi_gplvm.init_params(jax.random.PRNGKey(2), Y, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    det_idx = lambda rng: jax.random.randint(rng, (16,), 0, n)

    opt = gp_optimizer(params, lr=1e-2, ngd_lr=1.0)
    step_1d = svi_gplvm.make_svi_natgrad_step(cfg, n, opt, rho=0.5,
                                              sample_idx=det_idx)
    step_nd = svi_gplvm.make_svi_natgrad_step(cfg, n, opt, rho=0.5,
                                              sample_idx=det_idx,
                                              mesh=mesh)
    s1 = init_state(params, opt)
    p_m, (Y_m,) = recipe.place_svi("svi_gplvm", params, (Y,), mesh)
    s2 = init_state(p_m, opt)
    rng = jax.random.PRNGKey(11)
    for k in range(3):
        rng, sub = jax.random.split(rng)
        s1, m1 = step_1d(s1, sub, Y)
        s2, m2 = step_nd(s2, sub, Y_m)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-7
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )
