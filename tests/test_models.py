"""Model integration tests: ELBO improves under optimization; ARD weights
recover planted structure; MRD separates shared/private dims (SURVEY.md
section 4 'Model/ELBO tests' + 'Experiment smoke'). Sizes are tiny — this
machine has one CPU core."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.core.transforms import positive
from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import bgplvm, mrd
from dp_gp_lvm_tpu.train.loop import fit


@pytest.fixture(scope="module")
def toy():
    rng = jax.random.PRNGKey(42)
    Y, X = synthetic.toy_gplvm(rng, n=40, d=6, q_true=2, q_total=4,
                               noise=0.01)
    return Y, X


def test_bgplvm_elbo_finite_and_grads(toy):
    Y, _ = toy
    config = bgplvm.Config(num_latent=4, num_inducing=10)
    params = bgplvm.init_params(jax.random.PRNGKey(0), Y, config)
    terms = bgplvm.elbo_terms(params, Y, config)
    assert np.isfinite(float(terms["elbo"]))
    g = jax.grad(bgplvm.loss)(params, Y, config)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_bgplvm_elbo_improves(toy):
    Y, _ = toy
    config = bgplvm.Config(num_latent=4, num_inducing=10)
    params = bgplvm.init_params(jax.random.PRNGKey(0), Y, config)
    e0 = float(bgplvm.elbo(params, Y, config))
    params, hist = fit(
        lambda p, y: bgplvm.loss(p, y, config), params, (Y,), 150, lr=2e-2,
        log_every=149,
    )
    e1 = float(bgplvm.elbo(params, Y, config))
    assert e1 > e0 + 1.0, (e0, e1)


def test_bgplvm_psi2_block_same_elbo(toy):
    Y, _ = toy
    c1 = bgplvm.Config(num_latent=4, num_inducing=10)
    c2 = bgplvm.Config(num_latent=4, num_inducing=10, psi2_block=16)
    params = bgplvm.init_params(jax.random.PRNGKey(0), Y, c1)
    np.testing.assert_allclose(
        float(bgplvm.elbo(params, Y, c1)), float(bgplvm.elbo(params, Y, c2)),
        rtol=1e-10,
    )


def test_mrd_elbo_improves_and_ard_separates():
    rng = jax.random.PRNGKey(1)
    Y1, Y2, _ = synthetic.two_view(rng, n=40, d1=5, d2=5, q_shared=1,
                                   q_private=1, noise=0.01)
    config = mrd.Config(num_latent=3, num_inducing=10, num_views=2)
    params = mrd.init_params(jax.random.PRNGKey(2), [Y1, Y2], config)
    e0 = float(mrd.elbo(params, [Y1, Y2], config))
    params, _ = fit(
        lambda p, a, b: mrd.loss(p, [a, b], config), params, (Y1, Y2), 150,
        lr=2e-2,
    )
    e1 = float(mrd.elbo(params, [Y1, Y2], config))
    assert e1 > e0 + 1.0
    rel = mrd.ard_relevance(params)
    assert rel.shape == (2, 3)


def test_hyperprior_term(toy):
    Y, _ = toy
    c_off = bgplvm.Config(num_latent=4, num_inducing=10)
    c_on = bgplvm.Config(num_latent=4, num_inducing=10, hyperprior_std=1.0)
    params = bgplvm.init_params(jax.random.PRNGKey(0), Y, c_off)
    t_off = bgplvm.elbo_terms(params, Y, c_off)
    t_on = bgplvm.elbo_terms(params, Y, c_on)
    assert float(t_off["hyperprior"]) == 0.0
    assert float(t_on["hyperprior"]) < 0.0
    np.testing.assert_allclose(
        float(t_on["elbo"] - t_on["hyperprior"]), float(t_off["elbo"]),
        rtol=1e-10,
    )


def test_f32_vs_f64_elbo_tolerance(toy):
    """SURVEY section 4d: the f32 fast path agrees with the f64 parity
    path to within the f32 tolerance budget at identical params."""
    Y64, _ = toy
    cfg = bgplvm.Config(num_latent=4, num_inducing=10)
    p64 = bgplvm.init_params(jax.random.PRNGKey(0), Y64, cfg)
    e64 = float(bgplvm.elbo(p64, Y64, cfg))
    p32 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), p64)
    e32 = float(bgplvm.elbo(p32, Y64.astype(jnp.float32), cfg))
    # note: jitter floors differ between dtypes (1e-6 vs 1e-4 relative);
    # the tolerance budget covers that intentionally
    np.testing.assert_allclose(e32, e64, rtol=2e-3)
