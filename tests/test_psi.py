"""Psi-statistic tests (SURVEY.md section 4): closed forms vs Monte-Carlo
estimates under q(X); the s -> 0 limit reduces to plain kernel evaluations;
blockwise accumulation and row weighting are exact."""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.distributions import gaussian
from dp_gp_lvm_tpu.kernels import ard_rbf

N, M, Q = 6, 4, 3
VARIANCE = 1.7
ARD = jnp.asarray([0.6, 1.4, 0.9])


def _setup(rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    mu = jax.random.normal(r1, (N, Q))
    s = jax.random.uniform(r2, (N, Q), minval=0.05, maxval=0.8)
    Z = jax.random.normal(r3, (M, Q))
    return mu, s, Z


def test_psi1_matches_monte_carlo(rng):
    mu, s, Z = _setup(rng)
    closed = ard_rbf.psi1(VARIANCE, ARD, mu, s, Z)
    xs = gaussian.sample(jax.random.PRNGKey(7), mu, s, 40_000)
    k = jax.vmap(lambda x: ard_rbf.gram(VARIANCE, ARD, x, Z))(xs)
    mc = jnp.mean(k, axis=0)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(mc),
                               rtol=0.05, atol=0.05)


def test_psi2_matches_monte_carlo(rng):
    mu, s, Z = _setup(rng)
    closed = ard_rbf.psi2(VARIANCE, ARD, mu, s, Z)
    xs = gaussian.sample(jax.random.PRNGKey(3), mu, s, 40_000)

    def one(x):
        k = ard_rbf.gram(VARIANCE, ARD, x, Z)  # (N, M)
        return jnp.einsum("nm,nl->ml", k, k)

    mc = jnp.mean(jax.vmap(one)(xs), axis=0)
    np.testing.assert_allclose(np.asarray(closed), np.asarray(mc),
                               rtol=0.06, atol=0.06)


def test_psi0(rng):
    mu, _, _ = _setup(rng)
    np.testing.assert_allclose(float(ard_rbf.psi0(VARIANCE, mu)), VARIANCE * N)


def test_zero_variance_limit_reduces_to_kernel(rng):
    """s -> 0: Psi1 -> K_nm, Psi2 -> K_mn K_nm."""
    mu, _, Z = _setup(rng)
    s = jnp.full((N, Q), 1e-12)
    knm = ard_rbf.gram(VARIANCE, ARD, mu, Z)
    np.testing.assert_allclose(
        np.asarray(ard_rbf.psi1(VARIANCE, ARD, mu, s, Z)), np.asarray(knm),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ard_rbf.psi2(VARIANCE, ARD, mu, s, Z)),
        np.asarray(knm.T @ knm), rtol=1e-6,
    )


def test_psi2_blockwise_matches_direct(rng):
    mu, s, Z = _setup(rng)
    direct = ard_rbf.psi2(VARIANCE, ARD, mu, s, Z)
    for block in (1, 2, 4, 5):
        blocked = ard_rbf.psi2(VARIANCE, ARD, mu, s, Z, block_n=block)
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(direct),
                                   rtol=1e-10)


def test_weights_mask_rows(rng):
    """weights=0 rows contribute nothing — the data-parallel padding rule."""
    mu, s, Z = _setup(rng)
    w = jnp.asarray([1.0, 1.0, 0.0, 1.0, 0.0, 1.0])
    keep = np.asarray(w) > 0
    p1w = ard_rbf.psi1(VARIANCE, ARD, mu, s, Z, weights=w)
    p2w = ard_rbf.psi2(VARIANCE, ARD, mu, s, Z, weights=w)
    p1k = ard_rbf.psi1(VARIANCE, ARD, mu[keep], s[keep], Z)
    p2k = ard_rbf.psi2(VARIANCE, ARD, mu[keep], s[keep], Z)
    np.testing.assert_allclose(np.asarray(p1w[keep]), np.asarray(p1k),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p1w[~keep]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p2w), np.asarray(p2k), rtol=1e-12)
    np.testing.assert_allclose(
        float(ard_rbf.psi0(VARIANCE, mu, weights=w)), VARIANCE * 4
    )


def test_observed_psi_consistency(rng):
    mu, _, Z = _setup(rng)
    p0, p1, p2 = ard_rbf.observed_psi(VARIANCE, ARD, mu, Z)
    knm = ard_rbf.gram(VARIANCE, ARD, mu, Z)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(knm))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(knm.T @ knm),
                               rtol=1e-12)
    np.testing.assert_allclose(float(p0), VARIANCE * N)
