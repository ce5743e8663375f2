"""Pathwise posterior sampling (models/sampling.py): the RFF prior
approximates the kernel; Matheron draws match the analytic predictive
moments (EXACTLY-featured linear kernel for the tight test, RFF ARD-RBF
at MC tolerance); DP mixture draws match the phi-mixture moments."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.kernels import ard_rbf, linear
from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm, prediction, sampling
from dp_gp_lvm_tpu.train.loop import fit


@pytest.fixture(scope="module")
def trained_cache():
    rng = jax.random.PRNGKey(3)
    Y, _ = synthetic.toy_gplvm(rng, n=48, d=6, q_true=2, noise=0.01)
    cfg = bgplvm.Config(num_latent=2, num_inducing=10)
    params = bgplvm.init_params(jax.random.PRNGKey(4), Y, cfg)
    params, _ = fit(
        lambda p, y: bgplvm.loss(p, y, cfg), params, (Y,), 250, lr=2e-2
    )
    cache = prediction.bgplvm_posterior(params, Y, cfg)
    hyp = bgplvm.constrain(params)
    x_star = hyp["qx_mean"][:9]                    # deterministic inputs
    return cache, x_star, cfg


def _analytic_function_moments(cache, x_star, kernel="ard_rbf"):
    """Noise-free predictive mean/var at DETERMINISTIC x_star (s*->0)."""
    s0 = jnp.zeros_like(x_star)
    mean, var = prediction.predict_from_latent(cache, x_star, s0, kernel)
    return mean, var - cache.noise


def test_rff_prior_covariance_matches_kernel(trained_cache):
    cache, x_star, _ = trained_cache
    smp = sampling.make_pathwise_sampler(
        jax.random.PRNGKey(0), cache, num_samples=1,
        num_latent=x_star.shape[1], num_features=8192,
    )
    phi = sampling._prior_features(x_star, smp)          # (N*, L)
    k_hat = phi @ phi.T
    k_true = ard_rbf.gram(cache.variance, cache.ard, x_star)
    scale = float(cache.variance)
    assert np.max(np.abs(np.asarray(k_hat - k_true))) < 0.05 * scale


def test_linear_features_exact(trained_cache):
    cache, x_star, _ = trained_cache
    smp = sampling.make_pathwise_sampler(
        jax.random.PRNGKey(0), cache, num_samples=1,
        num_latent=x_star.shape[1], kernel="linear",
    )
    phi = sampling._prior_features(x_star, smp)
    k_true = linear.gram(cache.variance, cache.ard, x_star)
    np.testing.assert_allclose(
        np.asarray(phi @ phi.T), np.asarray(k_true), rtol=1e-10, atol=1e-12
    )


def test_qu_draw_moments(trained_cache):
    """Empirical q(u) sample mean/cov match m = K_uu w and
    Sigma_u = (L LB^{-T})(.)^T."""
    cache, _, _ = trained_cache
    s = 40000
    u = sampling.qu_draws(jax.random.PRNGKey(7), cache, s, cache.w.shape[1])
    m_true = np.asarray(cache.L @ (cache.L.T @ cache.w))
    # Sigma_u = L B^{-1} L^T, computed here via the EXPLICIT inverse of
    # B = LB LB^T (independent of the factorization route the code takes,
    # so a wrong-transpose factor in qu_draws cannot be self-consistent
    # with this oracle).
    L = np.asarray(cache.L)
    LB = np.asarray(cache.LB)
    cov_true = L @ np.linalg.inv(LB @ LB.T) @ L.T
    u_np = np.asarray(u)
    sd = np.sqrt(np.diag(cov_true)).max()
    assert np.max(np.abs(u_np.mean(0) - m_true)) < 5 * sd / np.sqrt(s)
    # covariance on dim 0
    emp = np.cov(u_np[:, :, 0].T)
    assert np.max(np.abs(emp - cov_true)) < 0.05 * max(cov_true.max(), 1e-3)


def test_pathwise_moments_linear_exact_features():
    """With EXACT features (linear kernel, on a linear-kernel-trained
    model so prior basis and K_uu agree) the only error is MC: sample
    mean/var converge to the analytic predictive at 1/sqrt(S)."""
    rng = jax.random.PRNGKey(21)
    Y, _ = synthetic.toy_gplvm(rng, n=40, d=5, q_true=2, noise=0.01)
    cfg = bgplvm.Config(num_latent=2, num_inducing=8, kernel="linear")
    params = bgplvm.init_params(jax.random.PRNGKey(22), Y, cfg)
    params, _ = fit(
        lambda p, y: bgplvm.loss(p, y, cfg), params, (Y,), 200, lr=2e-2
    )
    cache = prediction.bgplvm_posterior(params, Y, cfg)
    x_star = bgplvm.constrain(params)["qx_mean"][:7]
    s = 20000
    smp = sampling.make_pathwise_sampler(
        jax.random.PRNGKey(5), cache, num_samples=s,
        num_latent=x_star.shape[1], kernel="linear",
    )
    f = np.asarray(sampling.sample_at(smp, x_star))      # (S, N*, D)
    mean_true, var_true = _analytic_function_moments(
        cache, x_star, kernel="linear"
    )
    mean_true = np.asarray(mean_true)
    # the noise-free predictive var can round to ~0 at well-determined
    # points — clamp before use
    var_true = np.maximum(np.asarray(var_true), 0.0)
    se = np.sqrt(var_true / s)
    assert np.all(np.abs(f.mean(0) - mean_true) < 6 * se + 1e-4), (
        np.max(np.abs(f.mean(0) - mean_true) - 6 * se)
    )
    # MC se of a variance estimate is ~var*sqrt(2/s) (1% here); allow
    # 10% rel + abs floor for the near-zero entries
    assert np.all(
        np.abs(f.var(0) - var_true) < 0.1 * var_true + 1e-4
    ), np.max(np.abs(f.var(0) - var_true) - 0.1 * var_true)


def test_pathwise_moments_rbf(trained_cache):
    """RFF draws match the analytic ARD-RBF predictive within combined
    MC + feature-approximation tolerance."""
    cache, x_star, _ = trained_cache
    s = 8000
    smp = sampling.make_pathwise_sampler(
        jax.random.PRNGKey(6), cache, num_samples=s,
        num_latent=x_star.shape[1], num_features=4096,
    )
    f = np.asarray(sampling.sample_at(smp, x_star))
    mean_true, var_true = _analytic_function_moments(cache, x_star)
    mean_true, var_true = np.asarray(mean_true), np.asarray(var_true)
    scale = np.sqrt(float(cache.variance))
    assert np.max(np.abs(f.mean(0) - mean_true)) < 0.1 * scale
    # variances are small near training points; compare on the sd scale
    assert np.max(
        np.abs(np.sqrt(f.var(0)) - np.sqrt(var_true))
    ) < 0.1 * scale


def test_joint_consistency_within_sample(trained_cache):
    """Function draws are smooth in x within one sample: two nearby test
    points give nearly identical values — which marginal-predictive
    sampling (independent per point) cannot do."""
    cache, x_star, _ = trained_cache
    x0 = x_star[:1]
    x_pair = jnp.concatenate([x0, x0 + 1e-3], axis=0)
    smp = sampling.make_pathwise_sampler(
        jax.random.PRNGKey(8), cache, num_samples=64,
        num_latent=x_star.shape[1], num_features=2048,
    )
    f = np.asarray(sampling.sample_at(smp, x_pair))      # (64, 2, D)
    gap = np.abs(f[:, 0] - f[:, 1]).max()
    spread = f[:, 0].std(0).max()
    assert gap < 0.05 * max(spread, 1e-6), (gap, spread)


def test_sample_at_jits(trained_cache):
    cache, x_star, _ = trained_cache
    smp = sampling.make_pathwise_sampler(
        jax.random.PRNGKey(9), cache, num_samples=8,
        num_latent=x_star.shape[1], num_features=256,
    )
    f = jax.jit(sampling.sample_at)(smp, x_star)
    assert f.shape == (8, x_star.shape[0], cache.w.shape[1])
    assert bool(jnp.all(jnp.isfinite(f)))


@pytest.fixture(scope="module")
def trained_dp():
    rng = jax.random.PRNGKey(13)
    Y, _, _ = synthetic.grouped_dims(
        rng, n=40, dims_per_group=(4, 4), q=2, noise=0.01
    )
    cfg = dp_gp_lvm.Config(num_latent=2, num_inducing=10, truncation=3)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(14), Y, cfg)
    params, _ = fit(
        lambda p, y: dp_gp_lvm.loss(p, y, cfg), params, (Y,), 250, lr=2e-2
    )
    caches, phi = prediction.dp_posterior(params, Y, cfg)
    hyp = dp_gp_lvm.constrain(params)
    return caches, phi, hyp["qx_mean"][:6]


def test_dp_mixture_sample_moments(trained_dp):
    """DP mixture draws: empirical mean matches the phi-weighted mixture
    predictive mean; atom assignment frequencies match phi."""
    caches, phi, x_star = trained_dp
    s = 6000
    samplers, assign = sampling.make_dp_pathwise_sampler(
        jax.random.PRNGKey(15), caches, phi, num_samples=s,
        num_latent=x_star.shape[1], num_features=2048,
    )
    f = np.asarray(sampling.dp_sample_at(samplers, assign, x_star))
    mean_true, var_true = prediction.dp_predict_from_latent(
        caches, phi, x_star, jnp.zeros_like(x_star)
    )
    # noise-free sample vs noise-inclusive predictive: compare means,
    # and require sample var <= predictive var (it omits the noise)
    scale = float(np.sqrt(np.asarray(caches.variance).max()))
    assert np.max(np.abs(f.mean(0) - np.asarray(mean_true))) < 0.15 * scale
    freqs = np.stack(
        [(np.asarray(assign) == t).mean(0) for t in range(phi.shape[1])],
        axis=1,
    )
    assert np.max(np.abs(freqs - np.asarray(phi))) < 0.05


def test_svi_pathwise_moments():
    """Pathwise draws from the EXPLICIT whitened q(u) (SVI families):
    sample moments match svi_gplvm.predict_from_latent at deterministic
    x* within combined MC + RFF tolerance — no collapsed cache, no
    training data in the sampler."""
    from dp_gp_lvm_tpu.models import svi_gplvm

    rng = jax.random.PRNGKey(31)
    Y, _ = synthetic.toy_gplvm(rng, n=48, d=6, q_true=2, noise=0.01)
    cfg = svi_gplvm.Config(num_latent=2, num_inducing=10)
    params = svi_gplvm.init_params(jax.random.PRNGKey(32), Y, cfg)
    params, _ = fit(
        lambda p, y: svi_gplvm.loss(p, y, cfg), params, (Y,), 250,
        lr=2e-2,
    )
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    x_star = svi_gplvm.constrain(params)["qx_mean"][:9]
    s = 8000
    smp = sampling.make_svi_pathwise_sampler(
        jax.random.PRNGKey(33), params, cfg, num_samples=s,
        num_features=4096,
    )
    f = np.asarray(sampling.sample_at(smp, x_star))      # (S, N*, D)
    mean_true, var_full = svi_gplvm.predict_from_latent(
        params, x_star, jnp.zeros_like(x_star), cfg
    )
    noise = float(svi_gplvm.constrain(params)["noise"])
    mean_true = np.asarray(mean_true)
    var_true = np.maximum(np.asarray(var_full) - noise, 0.0)
    scale = np.sqrt(float(np.asarray(smp.variance)))
    assert np.max(np.abs(f.mean(0) - mean_true)) < 0.1 * scale
    assert np.max(
        np.abs(np.sqrt(f.var(0)) - np.sqrt(var_true))
    ) < 0.1 * scale


def test_mrd_svi_view_sampler_smoke():
    """A view of the multi-view model samples through the same path
    (mrd_svi._view_params bridges to the single-view sampler)."""
    from dp_gp_lvm_tpu.models import mrd_svi

    Y1, Y2, _ = synthetic.two_view(jax.random.PRNGKey(0), n=40, d1=4,
                                   d2=5)
    cfg = mrd_svi.Config(num_latent=3, num_inducing=8, num_views=2)
    params = mrd_svi.init_params(jax.random.PRNGKey(1), (Y1, Y2), cfg)
    params = mrd_svi.set_optimal_qu(params, (Y1, Y2), cfg)
    from dp_gp_lvm_tpu.models import svi_gplvm

    scfg = svi_gplvm.Config(num_latent=3, num_inducing=8)
    smp = sampling.make_svi_pathwise_sampler(
        jax.random.PRNGKey(2), mrd_svi._view_params(params, 1), scfg,
        num_samples=32, num_features=1024,
    )
    x_star = params["qx_mean"][:5]
    f = np.asarray(sampling.sample_at(smp, x_star))
    assert f.shape == (32, 5, 5)
    assert np.all(np.isfinite(f))
