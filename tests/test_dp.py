"""DP-GP-LVM tests (SURVEY.md section 4 'DP tests'): the T=1 truncation
reduces to the Bayesian GP-LVM bound; ELBO improves; CAVI coordinate
updates don't decrease the ELBO; assignments recover planted groups."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.core.transforms import positive_inverse
from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm
from dp_gp_lvm_tpu.train.loop import fit


def test_t1_reduces_to_bgplvm():
    """With a single atom the phi-weighted fit equals the B-GPLVM fit and
    the DP terms vanish (no sticks, phi degenerate)."""
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.toy_gplvm(rng, n=25, d=4, q_true=2)
    bcfg = bgplvm.Config(num_latent=2, num_inducing=8)
    bparams = bgplvm.init_params(jax.random.PRNGKey(1), Y, bcfg)

    dcfg = dp_gp_lvm.Config(num_latent=2, num_inducing=8, truncation=1)
    dparams = dp_gp_lvm.init_params(jax.random.PRNGKey(1), Y, dcfg)
    # align the single atom's params with the bgplvm params
    dparams["qx_mean"] = bparams["qx_mean"]
    dparams["raw_qx_var"] = bparams["raw_qx_var"]
    dparams["z"] = bparams["z"][None]
    dparams["raw_variance"] = bparams["raw_variance"][None]
    dparams["raw_ard"] = bparams["raw_ard"][None]
    dparams["raw_noise"] = bparams["raw_noise"][None]

    np.testing.assert_allclose(
        float(dp_gp_lvm.elbo(dparams, Y, dcfg)),
        float(bgplvm.elbo(bparams, Y, bcfg)),
        rtol=1e-8,
    )


@pytest.fixture(scope="module")
def grouped():
    Y, labels, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(3), n=40, dims_per_group=(4, 4), q=2, noise=0.01
    )
    return Y, labels


def test_dp_elbo_improves(grouped):
    Y, _ = grouped
    cfg = dp_gp_lvm.Config(num_latent=2, num_inducing=10, truncation=3)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(4), Y, cfg)
    e0 = float(dp_gp_lvm.elbo(params, Y, cfg))
    assert np.isfinite(e0)
    params, _ = fit(
        lambda p, y: dp_gp_lvm.loss(p, y, cfg), params, (Y,), 150, lr=2e-2
    )
    e1 = float(dp_gp_lvm.elbo(params, Y, cfg))
    assert e1 > e0 + 1.0


def test_cavi_step_does_not_decrease_elbo(grouped):
    Y, _ = grouped
    cfg = dp_gp_lvm.Config(num_latent=2, num_inducing=10, truncation=3)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(5), Y, cfg)
    # train a little first so the f_td landscape is informative
    params, _ = fit(
        lambda p, y: dp_gp_lvm.loss(p, y, cfg), params, (Y,), 50, lr=2e-2
    )
    e_before = float(dp_gp_lvm.elbo(params, Y, cfg))
    params2 = dp_gp_lvm.cavi_step(params, Y, cfg)
    e_after = float(dp_gp_lvm.elbo(params2, Y, cfg))
    assert e_after >= e_before - 1e-6, (e_before, e_after)


def test_assignments_recover_planted_groups(grouped):
    """Dims generated from different latent subsets should co-cluster."""
    Y, labels = grouped
    cfg = dp_gp_lvm.Config(num_latent=2, num_inducing=10, truncation=4)
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(6), Y, cfg)
    params, _ = fit(
        lambda p, y: dp_gp_lvm.loss(p, y, cfg), params, (Y,), 250, lr=2e-2
    )
    # a few CAVI sweeps sharpen phi
    for _ in range(3):
        params = dp_gp_lvm.cavi_step(params, Y, cfg)
    phi = np.asarray(dp_gp_lvm.expected_assignments(params))
    hard = phi.argmax(axis=1)
    labels = np.asarray(labels)
    # same-group pairs should share an atom more often than cross-group pairs
    same = hard[labels == 0]
    other = hard[labels == 1]
    same_purity = max((same == a).mean() for a in np.unique(hard))
    other_purity = max((other == a).mean() for a in np.unique(hard))
    assert same_purity > 0.7 and other_purity > 0.7


def test_learnable_alpha(grouped):
    Y, _ = grouped
    cfg = dp_gp_lvm.Config(
        num_latent=2, num_inducing=10, truncation=3, learn_alpha=True
    )
    params = dp_gp_lvm.init_params(jax.random.PRNGKey(9), Y, cfg)
    assert "raw_alpha" in params
    e = float(dp_gp_lvm.elbo(params, Y, cfg))
    assert np.isfinite(e)
    g = jax.grad(dp_gp_lvm.loss)(params, Y, cfg)
    assert np.isfinite(float(g["raw_alpha"]))
    # CAVI alpha update is finite and positive
    p2 = dp_gp_lvm.cavi_step(params, Y, cfg)
    a2 = float(dp_gp_lvm.constrain(p2)["alpha"])
    assert a2 > 0 and np.isfinite(a2)
    # gradient training with learnable alpha improves ELBO
    params, _ = fit(
        lambda p, y: dp_gp_lvm.loss(p, y, cfg), params, (Y,), 80, lr=1e-2
    )
    assert float(dp_gp_lvm.elbo(params, Y, cfg)) > e


def test_use_pallas_auto_selects_consistently(grouped):
    """'auto' must agree numerically with the explicit paths it selects."""
    Y, _ = grouped
    base = dict(num_latent=2, num_inducing=10, truncation=3)
    params = dp_gp_lvm.init_params(
        jax.random.PRNGKey(2), Y, dp_gp_lvm.Config(**base)
    )
    e_auto = float(dp_gp_lvm.elbo(params, Y, dp_gp_lvm.Config(**base)))
    e_xla = float(dp_gp_lvm.elbo(
        params, Y, dp_gp_lvm.Config(**base, use_pallas=False)
    ))
    e_pal = float(dp_gp_lvm.elbo(
        params, Y, dp_gp_lvm.Config(**base, use_pallas=True)
    ))
    np.testing.assert_allclose(e_auto, e_xla, rtol=1e-12)  # below threshold
    np.testing.assert_allclose(e_pal, e_xla, rtol=1e-5)
