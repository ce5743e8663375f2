"""Pallas kernel equivalence tests (SURVEY.md section 7 step 8): every
fused kernel ships with an equivalence test against the pure-JAX path.
On CPU these run in interpret mode; on TPU the same tests exercise the
compiled kernels (tests/conftest.py pins CPU, so interpret here)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.ops.pallas import psi as psi_pallas

N, M, Q = 37, 8, 3  # deliberately unaligned N to exercise padding


@pytest.fixture(scope="module")
def setup():
    r = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(r, 3)
    mu = jax.random.normal(r1, (N, Q), jnp.float32)
    s = jax.random.uniform(r2, (N, Q), jnp.float32, 0.05, 0.8)
    Z = jax.random.normal(r3, (M, Q), jnp.float32)
    variance = jnp.float32(1.7)
    ard = jnp.asarray([0.6, 1.4, 0.9], jnp.float32)
    return variance, ard, mu, s, Z


def test_psi2_pallas_matches_reference(setup):
    variance, ard, mu, s, Z = setup
    ref = ard_rbf.psi2(variance, ard, mu, s, Z)
    for block in (8, 16, 37):
        got = psi_pallas.psi2_pallas(
            variance, ard, mu, s, Z, block_n=block, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_psi1_pallas_matches_reference(setup):
    variance, ard, mu, s, Z = setup
    ref = ard_rbf.psi1(variance, ard, mu, s, Z)
    got = psi_pallas.psi1_pallas(
        variance, ard, mu, s, Z, block_n=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_psi2_pallas_weights(setup):
    variance, ard, mu, s, Z = setup
    w = (jax.random.uniform(jax.random.PRNGKey(9), (N,)) > 0.3).astype(
        jnp.float32
    )
    ref = ard_rbf.psi2(variance, ard, mu, s, Z, weights=w)
    got = psi_pallas.psi2_pallas(
        variance, ard, mu, s, Z, weights=w, block_n=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_psi2_fused_gradients_match(setup):
    """custom_vjp wrapper: gradients equal the pure-JAX gradients."""
    variance, ard, mu, s, Z = setup

    def f_pallas(v, a, m_, s_, z_):
        return jnp.sum(
            psi_pallas.psi2_fused(v, a, m_, s_, z_, None, 16, True) ** 2
        )

    def f_ref(v, a, m_, s_, z_):
        return jnp.sum(ard_rbf.psi2(v, a, m_, s_, z_) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 2, 3, 4))(variance, ard, mu, s, Z)
    g2 = jax.grad(f_ref, argnums=(0, 2, 3, 4))(variance, ard, mu, s, Z)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_psi2_pallas_vmap_over_atoms(setup):
    """DP usage: vmapped over per-atom hypers/Z."""
    variance, ard, mu, s, Z = setup
    t = 3
    r = jax.random.PRNGKey(5)
    variances = jnp.abs(jax.random.normal(r, (t,), jnp.float32)) + 0.5
    ards = jnp.abs(jax.random.normal(r, (t, Q), jnp.float32)) + 0.3
    Zs = jnp.stack([Z, Z + 0.1, Z - 0.1])

    got = jax.vmap(
        lambda v, a, z: psi_pallas.psi2_pallas(
            v, a, mu, s, z, block_n=8, interpret=True
        )
    )(variances, ards, Zs)
    ref = jax.vmap(
        lambda v, a, z: ard_rbf.psi2(v, a, mu, s, z)
    )(variances, ards, Zs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_bgplvm_elbo_pallas_path_matches():
    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import bgplvm

    Y, _ = synthetic.toy_gplvm(
        jax.random.PRNGKey(2), n=30, d=5, q_true=2, dtype=jnp.float32
    )
    c_ref = bgplvm.Config(num_latent=2, num_inducing=8)
    c_pal = bgplvm.Config(num_latent=2, num_inducing=8, use_pallas=True)
    params = bgplvm.init_params(jax.random.PRNGKey(3), Y, c_ref)
    e_ref = float(bgplvm.elbo(params, Y, c_ref))
    e_pal = float(bgplvm.elbo(params, Y, c_pal))
    np.testing.assert_allclose(e_pal, e_ref, rtol=1e-4)


def test_dp_elbo_pallas_path_matches():
    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import dp_gp_lvm

    Y, _, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(4), n=24, dims_per_group=(3, 3), q=2,
        dtype=jnp.float32,
    )
    c_ref = dp_gp_lvm.Config(num_latent=2, num_inducing=6, truncation=3)
    c_pal = dp_gp_lvm.Config(
        num_latent=2, num_inducing=6, truncation=3, use_pallas=True
    )
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(5), Y, c_ref)
    e_ref = float(dp_gp_lvm.elbo(params, Y, c_ref))
    e_pal = float(dp_gp_lvm.elbo(params, Y, c_pal))
    np.testing.assert_allclose(e_pal, e_ref, rtol=1e-4)


def test_mrd_elbo_pallas_path_matches():
    """MRD views through the fused suffstats kernel (dispatch.suff_stats,
    use_pallas=True) equal the pure-JAX path — values and gradients
    (VERDICT r1 item 6: MRD gets the same auto dispatch as the DP path)."""
    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import mrd

    Y1, Y2, _ = synthetic.two_view(
        jax.random.PRNGKey(6), n=30, d1=4, d2=6, dtype=jnp.float32
    )
    Ys = [Y1, Y2]
    c_ref = mrd.Config(num_latent=3, num_inducing=8, num_views=2)
    c_pal = c_ref._replace(use_pallas=True)
    params = mrd.init_params(jax.random.PRNGKey(7), Ys, c_ref)
    e_ref = float(mrd.elbo(params, Ys, c_ref))
    e_pal = float(mrd.elbo(params, Ys, c_pal))
    np.testing.assert_allclose(e_pal, e_ref, rtol=1e-4)
    g_ref = jax.grad(lambda p: mrd.loss(p, Ys, c_ref))(params)
    g_pal = jax.grad(lambda p: mrd.loss(p, Ys, c_pal))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)
    ):
        scale = np.maximum(np.max(np.abs(np.asarray(a))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=2e-4, atol=2e-4,
        )


def test_psi2_batched_kernel_matches(setup):
    """Atom-batched fused forward + fused backward vs references."""
    from dp_gp_lvm_tpu.ops.pallas.psi import (
        psi2_batched_fused,
        psi2_batched_pallas,
    )

    variance, ard, mu, s, Z = setup
    t = 3
    vs = jnp.stack([variance, variance * 1.4, variance * 0.7])
    ards = jnp.stack([ard, ard * 0.6, ard * 1.3])
    Zs = jnp.stack([Z, Z + 0.2, Z - 0.1])

    got = psi2_batched_pallas(vs, ards, mu, s, Zs, block_n=8, interpret=True)
    ref = jax.vmap(lambda v, a, z: ard_rbf.psi2(v, a, mu, s, z))(
        vs, ards, Zs
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # fused backward vs autodiff of the reference
    def f_new(v, a, m_, s_, z_):
        return jnp.sum(
            psi2_batched_fused(v, a, m_, s_, z_, None, 8, True) ** 2
        )

    def f_ref(v, a, m_, s_, z_):
        out = jax.vmap(lambda vv, aa, zz: ard_rbf.psi2(vv, aa, m_, s_, zz))(
            v, a, z_
        )
        return jnp.sum(out ** 2)

    g_new = jax.grad(f_new, argnums=(0, 1, 2, 3, 4))(vs, ards, mu, s, Zs)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(vs, ards, mu, s, Zs)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def _atom_stack(variance, ard, Z):
    vs = jnp.stack([variance, variance * 1.4, variance * 0.7])
    ards = jnp.stack([ard, ard * 0.6, ard * 1.3])
    Zs = jnp.stack([Z, Z + 0.2, Z - 0.1])
    return vs, ards, Zs


def test_psi2_batched_fused_weighted_gradients(setup):
    """VERDICT r1 item 3: non-trivial row weights through the fused VJP,
    including the cotangent w.r.t. the weights themselves."""
    from dp_gp_lvm_tpu.ops.pallas.psi import psi2_batched_fused

    variance, ard, mu, s, Z = setup
    vs, ards, Zs = _atom_stack(variance, ard, Z)
    w = jax.random.uniform(jax.random.PRNGKey(11), (N,), jnp.float32,
                           0.1, 1.0)

    def f_new(v, a, m_, s_, z_, w_):
        return jnp.sum(
            psi2_batched_fused(v, a, m_, s_, z_, w_, 8, True) ** 2
        )

    def f_ref(v, a, m_, s_, z_, w_):
        out = jax.vmap(
            lambda vv, aa, zz: ard_rbf.psi2(vv, aa, m_, s_, zz, weights=w_)
        )(v, a, z_)
        return jnp.sum(out ** 2)

    args = (vs, ards, mu, s, Zs, w)
    np.testing.assert_allclose(float(f_new(*args)), float(f_ref(*args)),
                               rtol=2e-4)
    g_new = jax.grad(f_new, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_suffstats_batched_fused_weighted_gradients(setup):
    from dp_gp_lvm_tpu.ops.pallas.psi import suffstats_batched_fused

    variance, ard, mu, s, Z = setup
    vs, ards, Zs = _atom_stack(variance, ard, Z)
    Y = jax.random.normal(jax.random.PRNGKey(3), (N, 5), jnp.float32)
    # mask-style weights (zeros included) — the missing-data regime
    w = (jax.random.uniform(jax.random.PRNGKey(12), (N,)) > 0.3).astype(
        jnp.float32
    ) * jax.random.uniform(jax.random.PRNGKey(13), (N,), jnp.float32,
                           0.5, 1.5)

    def f_new(v, a, m_, s_, z_, w_, y_):
        a2, b2 = suffstats_batched_fused(v, a, m_, s_, z_, y_, w_, 8, True)
        return jnp.sum(a2 ** 2) + jnp.sum(jnp.sin(b2))

    def f_ref(v, a, m_, s_, z_, w_, y_):
        a2 = jax.vmap(
            lambda vv, aa, zz: ard_rbf.psi2(vv, aa, m_, s_, zz, weights=w_)
        )(v, a, z_)
        b2 = jax.vmap(
            lambda vv, aa, zz:
            (ard_rbf.psi1(vv, aa, m_, s_, zz) * w_[:, None]).T @ y_
        )(v, a, z_)
        return jnp.sum(a2 ** 2) + jnp.sum(jnp.sin(b2))

    args = (vs, ards, mu, s, Zs, w, Y)
    np.testing.assert_allclose(float(f_new(*args)), float(f_ref(*args)),
                               rtol=2e-4)
    g_new = jax.grad(f_new, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5, 6))(*args)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_dispatch_weighted_uses_pallas_and_matches(setup):
    """dispatch.psi_stats no longer special-cases weights away from the
    fused path: weighted pallas and pure-JAX results + grads agree."""
    from dp_gp_lvm_tpu.ops import dispatch

    variance, ard, mu, s, Z = setup
    w = jax.random.uniform(jax.random.PRNGKey(14), (N,), jnp.float32,
                           0.2, 1.0)

    def total(use_pallas):
        def f(v, a, m_, s_, w_):
            p0, p1, p2 = dispatch.psi_stats(
                v, a, m_, s_, Z, weights=w_, use_pallas=use_pallas
            )
            return p0 + jnp.sum(p1 ** 2) + jnp.sum(p2 ** 2)
        return f

    args = (variance, ard, mu, s, w)
    v_pal = float(total(True)(*args))
    v_ref = float(total(False)(*args))
    np.testing.assert_allclose(v_pal, v_ref, rtol=2e-4)
    g_pal = jax.grad(total(True), argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(total(False), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_suffstats_batched_fused_matches(setup):
    from dp_gp_lvm_tpu.ops.pallas.psi import suffstats_batched_fused

    variance, ard, mu, s, Z = setup
    t = 3
    vs = jnp.stack([variance, variance * 1.4, variance * 0.7])
    ards = jnp.stack([ard, ard * 0.6, ard * 1.3])
    Zs = jnp.stack([Z, Z + 0.2, Z - 0.1])
    Y = jax.random.normal(jax.random.PRNGKey(3), (N, 5), jnp.float32)

    p2, p1y = suffstats_batched_fused(vs, ards, mu, s, Zs, Y, None, 8, True)
    p2_ref = jax.vmap(lambda v, a, z: ard_rbf.psi2(v, a, mu, s, z))(
        vs, ards, Zs
    )
    p1y_ref = jax.vmap(
        lambda v, a, z: ard_rbf.psi1(v, a, mu, s, z).T @ Y
    )(vs, ards, Zs)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p2_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1y), np.asarray(p1y_ref),
                               rtol=2e-4, atol=2e-4)

    def f_new(v, a, m_, s_, z_):
        a2, b2 = suffstats_batched_fused(v, a, m_, s_, z_, Y, None, 8, True)
        return jnp.sum(a2 ** 2) + jnp.sum(jnp.sin(b2))

    def f_ref(v, a, m_, s_, z_):
        a2 = jax.vmap(lambda vv, aa, zz: ard_rbf.psi2(vv, aa, m_, s_, zz))(
            v, a, z_
        )
        b2 = jax.vmap(
            lambda vv, aa, zz: ard_rbf.psi1(vv, aa, m_, s_, zz).T @ Y
        )(v, a, z_)
        return jnp.sum(a2 ** 2) + jnp.sum(jnp.sin(b2))

    g_new = jax.grad(f_new, argnums=(0, 1, 2, 3, 4))(vs, ards, mu, s, Zs)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(vs, ards, mu, s, Zs)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)


def test_resolve_pallas_dispatch_rule():
    """The measured crossover (results/roofline.json): fused kernels only
    at M >= 96 AND tile volume > 5e8; non-ard_rbf never; explicit
    True/False always honored."""
    from dp_gp_lvm_tpu.ops.dispatch import resolve_pallas

    assert resolve_pallas("auto", "ard_rbf", 20, 8192, 128) is True
    assert not resolve_pallas("auto", "ard_rbf", 20, 8192, 64)   # M cut
    assert not resolve_pallas("auto", "ard_rbf", 1, 100, 128)    # volume cut
    assert not resolve_pallas("auto", "linear", 20, 8192, 128)   # kernel cut
    assert resolve_pallas(True, "ard_rbf", 1, 10, 8) is True
    assert resolve_pallas(False, "ard_rbf", 20, 8192, 128) is False
