"""ARD-linear kernel tests: Gram oracle, psi statistics vs Monte Carlo,
and end-to-end Bayesian GP-LVM training with kernel='linear'."""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.distributions import gaussian
from dp_gp_lvm_tpu.kernels import linear
from dp_gp_lvm_tpu.models import bgplvm
from dp_gp_lvm_tpu.train.loop import fit

N, M, Q = 6, 4, 3
VARIANCE = 1.3
ARD = jnp.asarray([0.6, 1.4, 0.9])


def _setup(rng):
    r1, r2, r3 = jax.random.split(rng, 3)
    mu = jax.random.normal(r1, (N, Q))
    s = jax.random.uniform(r2, (N, Q), minval=0.05, maxval=0.8)
    Z = jax.random.normal(r3, (M, Q))
    return mu, s, Z


def test_gram_oracle(np_rng):
    X1 = np_rng.normal(size=(5, 3))
    X2 = np_rng.normal(size=(4, 3))
    got = linear.gram(VARIANCE, ARD, jnp.asarray(X1), jnp.asarray(X2))
    want = VARIANCE * (X1 * np.asarray(ARD)) @ X2.T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)
    diag = linear.gram_diag(VARIANCE, ARD, jnp.asarray(X1))
    np.testing.assert_allclose(
        np.asarray(diag),
        np.diag(VARIANCE * (X1 * np.asarray(ARD)) @ X1.T),
        rtol=1e-10,
    )


def test_psi_stats_match_monte_carlo(rng):
    mu, s, Z = _setup(rng)
    p0, p1, p2 = linear.psi_stats(VARIANCE, ARD, mu, s, Z)
    xs = gaussian.sample(jax.random.PRNGKey(7), mu, s, 40_000)

    def per_sample(x):
        k = linear.gram(VARIANCE, ARD, x, Z)      # (N, M)
        kd = linear.gram_diag(VARIANCE, ARD, x)
        return jnp.sum(kd), k, jnp.einsum("nm,nl->ml", k, k)

    p0_mc, p1_mc, p2_mc = jax.vmap(per_sample)(xs)
    np.testing.assert_allclose(float(p0), float(p0_mc.mean()), rtol=0.02)
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p1_mc.mean(0)), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(p2_mc.mean(0)), rtol=0.05, atol=0.08
    )


def test_psi_weights(rng):
    mu, s, Z = _setup(rng)
    w = jnp.asarray([1.0, 0.0, 1.0, 1.0, 0.0, 1.0])
    keep = np.asarray(w) > 0
    p0w, p1w, p2w = linear.psi_stats(VARIANCE, ARD, mu, s, Z, weights=w)
    p0k, p1k, p2k = linear.psi_stats(VARIANCE, ARD, mu[keep], s[keep], Z)
    np.testing.assert_allclose(float(p0w), float(p0k), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p1w[keep]), np.asarray(p1k),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p2w), np.asarray(p2k), rtol=1e-10)


def test_bgplvm_linear_kernel_trains():
    rng = jax.random.PRNGKey(0)
    # linear-Gaussian data: PCA-like model recovery
    X = jax.random.normal(rng, (40, 2))
    W = jax.random.normal(jax.random.PRNGKey(1), (2, 6))
    Y = X @ W + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (40, 6))
    Y = (Y - Y.mean(0)) / Y.std(0)
    cfg = bgplvm.Config(num_latent=3, num_inducing=10, kernel="linear")
    params = bgplvm.init_params(jax.random.PRNGKey(3), Y, cfg)
    e0 = float(bgplvm.elbo(params, Y, cfg))
    assert np.isfinite(e0)
    params, _ = fit(
        lambda p, y: bgplvm.loss(p, y, cfg), params, (Y,), 150, lr=2e-2
    )
    e1 = float(bgplvm.elbo(params, Y, cfg))
    assert e1 > e0 + 1.0
