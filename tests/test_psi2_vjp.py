"""Hand-derived Psi2 VJP vs jax autodiff of the reference implementation
(f64, tight tolerance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.kernels.ard_rbf_vjp import psi2_analytic

N, M, Q = 13, 5, 3


@pytest.fixture(scope="module")
def setup():
    r = jax.random.PRNGKey(0)
    r1, r2, r3, r4 = jax.random.split(r, 4)
    mu = jax.random.normal(r1, (N, Q))
    s = jax.random.uniform(r2, (N, Q), minval=0.05, maxval=0.8)
    Z = jax.random.normal(r3, (M, Q))
    G = jax.random.normal(r4, (M, M))  # arbitrary cotangent
    variance = jnp.asarray(1.7)
    ard = jnp.asarray([0.6, 1.4, 0.9])
    return variance, ard, mu, s, Z, G


def _compare(setup, weights, block_n):
    variance, ard, mu, s, Z, G = setup

    def f_ref(v, a, m_, s_, z_, w_):
        return jnp.sum(ard_rbf.psi2(v, a, m_, s_, z_, weights=w_) * G)

    def f_new(v, a, m_, s_, z_, w_):
        return jnp.sum(psi2_analytic(v, a, m_, s_, z_, w_, block_n) * G)

    args = (variance, ard, mu, s, Z, weights)
    argnums = (0, 1, 2, 3, 4) if weights is None else (0, 1, 2, 3, 4, 5)
    g_ref = jax.grad(f_ref, argnums=argnums)(*args)
    g_new = jax.grad(f_new, argnums=argnums)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_new)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-10,
            err_msg=f"argnum {argnums[i]}",
        )
    # values agree too
    np.testing.assert_allclose(
        np.asarray(psi2_analytic(*args, block_n)),
        np.asarray(ard_rbf.psi2(variance, ard, mu, s, Z, weights=weights)),
        rtol=1e-12,
    )


def test_unweighted_single_block(setup):
    _compare(setup, None, None)


def test_unweighted_blocked(setup):
    _compare(setup, None, 4)


def test_weighted_blocked(setup):
    w = jnp.asarray(
        (np.random.default_rng(1).uniform(size=N) > 0.3).astype(float)
    )
    _compare(setup, w, 5)


def test_inside_jit_and_vmap(setup):
    variance, ard, mu, s, Z, G = setup
    variances = jnp.stack([variance, variance * 1.5])
    ards = jnp.stack([ard, ard * 0.7])
    Zs = jnp.stack([Z, Z + 0.1])

    def loss(v, a, z):
        return jnp.sum(psi2_analytic(v, a, mu, s, z, None, 4) ** 2)

    g_new = jax.jit(jax.vmap(jax.grad(loss, argnums=(0, 1, 2))))(
        variances, ards, Zs
    )

    def loss_ref(v, a, z):
        return jnp.sum(ard_rbf.psi2(v, a, mu, s, z) ** 2)

    g_ref = jax.vmap(jax.grad(loss_ref, argnums=(0, 1, 2)))(
        variances, ards, Zs
    )
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-9)


def test_psi1_analytic_vjp(setup):
    from dp_gp_lvm_tpu.kernels.ard_rbf_vjp import psi1_weighted

    variance, ard, mu, s, Z, _ = setup
    G1 = jax.random.normal(jax.random.PRNGKey(8), (N, M))
    w = jnp.asarray(
        (np.random.default_rng(2).uniform(size=N) > 0.2).astype(float)
    )
    for weights in (None, w):
        def f_ref(v, a, m_, s_, z_):
            return jnp.sum(
                ard_rbf.psi1(v, a, m_, s_, z_, weights=weights) * G1
            )

        def f_new(v, a, m_, s_, z_):
            return jnp.sum(psi1_weighted(v, a, m_, s_, z_, weights) * G1)

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(
            variance, ard, mu, s, Z
        )
        g_new = jax.grad(f_new, argnums=(0, 1, 2, 3, 4))(
            variance, ard, mu, s, Z
        )
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-12
            )
