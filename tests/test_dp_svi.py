"""Minibatch DP-SVI (models/dp_svi.py) oracles.

  1. At the closed-form optimal per-atom whitened q(u|t), the
     uncollapsed phi-weighted bound EQUALS the collapsed DP-GP-LVM
     ELBO (models/dp_gp_lvm.elbo) — exact identity, any phi/gamma.
  2. At any other q(u) it is strictly below.
  3. T = 1 reduces exactly to the SVI-GPLVM bound
     (models/svi_gplvm.elbo) at matching q(u).
  4. A disjoint-partition mean of minibatch estimates equals the
     full-batch bound exactly (all data terms are linear in the
     per-atom row sums at fixed q(u), phi).
  5. One rho=1 full-deterministic-batch natural-gradient step lands
     q(u) on the optimum of the updated params (post-step state
     satisfies oracle 1).
  6. Training recovers planted output-dimension groups at minibatch
     scale and improves the full bound.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import dp_gp_lvm, dp_svi, svi_gplvm
from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state


def _collapsed_params(params):
    """Strip the q(u) naturals -> collapsed dp_gp_lvm params."""
    return {k: v for k, v in params.items() if k not in ("u_h", "u_lam")}


def _setup(n=40, dims=(4, 4), q=2, m=8, t=3, **kw):
    Y, labels, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(3), n=n, dims_per_group=dims, q=q, noise=0.01
    )
    cfg = dp_svi.Config(num_latent=q, num_inducing=m, truncation=t,
                        batch=16, **kw)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Y, cfg)
    dcfg = dp_gp_lvm.Config(num_latent=q, num_inducing=m, truncation=t,
                            **kw)
    return Y, labels, cfg, dcfg, params


def test_optimal_qu_recovers_collapsed_dp_bound():
    Y, _, cfg, dcfg, params = _setup()
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    svi = float(dp_svi.elbo(params, Y, cfg))
    collapsed = float(dp_gp_lvm.elbo(_collapsed_params(params), Y, dcfg))
    np.testing.assert_allclose(svi, collapsed, rtol=1e-6)


def test_optimal_qu_oracle_with_hyperprior_and_alpha():
    Y, _, cfg, dcfg, params = _setup(hyperprior_std=1.0, learn_alpha=True)
    assert "raw_alpha" in params
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    svi = float(dp_svi.elbo(params, Y, cfg))
    collapsed = float(dp_gp_lvm.elbo(_collapsed_params(params), Y, dcfg))
    np.testing.assert_allclose(svi, collapsed, rtol=1e-6)


def test_suboptimal_qu_is_below_collapsed_bound():
    Y, _, cfg, dcfg, params = _setup()
    collapsed = float(dp_gp_lvm.elbo(_collapsed_params(params), Y, dcfg))
    # prior q(u|t) (h=0, Lambda=I): valid but suboptimal
    below = float(dp_svi.elbo(params, Y, cfg))
    assert below < collapsed - 1.0, (below, collapsed)
    # perturbed optimum also below
    p2 = dp_svi.set_optimal_qu(params, Y, cfg)
    p2 = {**p2, "u_h": p2["u_h"] + 0.1}
    below2 = float(dp_svi.elbo(p2, Y, cfg))
    assert below2 < collapsed, (below2, collapsed)


def test_t1_reduces_to_svi_gplvm():
    """Single atom, phi degenerate: the DP-SVI bound equals the
    SVI-GPLVM whitened Hensman bound at matching q(u) — both at the
    prior init (h=0, Lambda=I <-> m=0, S=I) and at the optimum."""
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.toy_gplvm(rng, n=30, d=5, q_true=2)
    scfg = svi_gplvm.Config(num_latent=2, num_inducing=8, batch=10)
    sparams = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, scfg)

    dcfg = dp_svi.Config(num_latent=2, num_inducing=8, truncation=1,
                         batch=10)
    dparams = dp_svi.init_params(jax.random.PRNGKey(1), Y, dcfg)
    dparams["qx_mean"] = sparams["qx_mean"]
    dparams["raw_qx_var"] = sparams["raw_qx_var"]
    dparams["z"] = sparams["z"][None]
    dparams["raw_variance"] = sparams["raw_variance"][None]
    dparams["raw_ard"] = sparams["raw_ard"][None]
    dparams["raw_noise"] = sparams["raw_noise"][None]

    np.testing.assert_allclose(
        float(dp_svi.elbo(dparams, Y, dcfg)),
        float(svi_gplvm.elbo(sparams, Y, scfg)),
        rtol=1e-8,
    )
    d_opt = dp_svi.set_optimal_qu(dparams, Y, dcfg)
    s_opt = svi_gplvm.set_optimal_qu(sparams, Y, scfg)
    np.testing.assert_allclose(
        float(dp_svi.elbo(d_opt, Y, dcfg)),
        float(svi_gplvm.elbo(s_opt, Y, scfg)),
        rtol=1e-7,
    )


def test_minibatch_partition_averages_to_full_bound():
    Y, _, cfg, _, params = _setup(n=48)
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    full = float(dp_svi.elbo(params, Y, cfg))
    n, b = Y.shape[0], cfg.batch
    ests = []
    for start in range(0, n, b):
        idx = jnp.arange(start, start + b)
        ests.append(float(dp_svi.elbo_minibatch(
            params, Y[idx], idx, n, cfg
        )))
    np.testing.assert_allclose(np.mean(ests), full, rtol=1e-9)


@pytest.mark.parametrize("blend_at", ["updated", "grad"])
def test_step_rho1_full_batch_lands_on_collapsed(blend_at):
    """rho=1 with the exact full batch: the post-step q(u) is optimal
    for the step's reference params (updated params under Hoffman
    ordering; for blend_at='grad' we freeze the gradient update with
    zero learning rates so pre == post params) — the post-step state
    itself satisfies the collapsed-bound identity."""
    Y, _, cfg, dcfg, params = _setup(n=32)
    cfg = cfg._replace(batch=32)
    lr = 1e-3 if blend_at == "updated" else 0.0
    opt = gp_optimizer(params, lr=lr, hyper_lr=lr / 10 if lr else 0.0)
    step = dp_svi.make_dp_svi_step(
        cfg, 32, opt, rho=1.0, rho_phi=0.3, blend_at=blend_at,
        sample_idx=lambda rng: jnp.arange(32),
    )
    state = init_state(params, opt)
    state, _ = step(state, jax.random.PRNGKey(0), Y)
    svi = float(dp_svi.elbo(state.params, Y, cfg))
    collapsed = float(dp_gp_lvm.elbo(
        _collapsed_params(state.params), Y, dcfg
    ))
    np.testing.assert_allclose(svi, collapsed, rtol=1e-5)


def test_training_improves_and_recovers_groups():
    """Minibatch DP-SVI training: full bound improves, phi recovers the
    planted output-dim groups (the model's raison d'etre), gamma/phi
    stay valid through the damped CAVI updates."""
    Y, labels, cfg, _, params = _setup(n=48, dims=(5, 5), t=4, m=10)
    n = Y.shape[0]
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.3, rho_phi=0.1)
    state = init_state(params, opt)
    e0 = float(dp_svi.elbo(state.params, Y, cfg))
    rng = jax.random.PRNGKey(7)
    for _ in range(300):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, sub, Y)
    e1 = float(dp_svi.elbo(state.params, Y, cfg))
    assert np.isfinite(e1)
    assert e1 > e0 + 10.0, (e0, e1)

    phi = np.asarray(dp_svi.expected_assignments(state.params))
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, rtol=1e-5)
    hard = phi.argmax(axis=1)
    labels = np.asarray(labels)
    same = hard[labels == 0]
    other = hard[labels == 1]
    same_purity = max((same == a).mean() for a in np.unique(hard))
    other_purity = max((other == a).mean() for a in np.unique(hard))
    assert same_purity > 0.7 and other_purity > 0.7, (same, other)


def test_learnable_alpha_step_stays_finite():
    Y, _, cfg, _, params = _setup(learn_alpha=True)
    n = Y.shape[0]
    opt = gp_optimizer(params, lr=1e-2)
    step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.3)
    state = init_state(params, opt)
    rng = jax.random.PRNGKey(5)
    for _ in range(30):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, sub, Y)
    a = float(dp_svi.constrain(state.params)["alpha"])
    assert np.isfinite(a) and a > 0
    assert np.isfinite(float(dp_svi.elbo(state.params, Y, cfg)))


def test_lam_cholesky_exact_when_well_conditioned():
    """For a healthy Lambda the ridge rung is 0 and the factor is
    bit-identical to the plain Cholesky (the collapsed-bound oracle
    depends on this exactness)."""
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (8, 8))
    lam = jnp.eye(8) + a @ a.T
    np.testing.assert_array_equal(
        np.asarray(dp_svi._lam_cholesky(lam)),
        np.asarray(jnp.linalg.cholesky(lam)),
    )


def test_lam_cholesky_repairs_indefinite_with_finite_grads():
    """An f32-roundoff-style breach of the Lambda >= I floor (measured
    eigmin -4.3 at N=32k: VERDICT r3 notes) must yield a finite factor
    AND finite gradients — a plain where() retry keeps the failed
    factorization's NaN VJP in the graph and silently freezes every
    hyper via apply_if_finite."""
    rng = jax.random.PRNGKey(1)
    a = jax.random.normal(rng, (16, 16))
    base = a @ a.T * 1e4                    # data-dominated directions
    w, v = jnp.linalg.eigh(base)
    w = w.at[0].set(-4.0)                   # breached floor direction
    lam = (v * w[None, :]) @ v.T
    assert not bool(jnp.all(jnp.isfinite(jnp.linalg.cholesky(lam))))

    L = dp_svi._lam_cholesky(lam)
    assert bool(jnp.all(jnp.isfinite(L)))
    # repaired factor stays close to the true spectrum in the
    # data-dominated directions: logdet within ~m*log(1+64/eig_small)
    recon = L @ L.T
    np.testing.assert_allclose(
        np.asarray(jnp.diagonal(recon)), np.asarray(jnp.diagonal(lam)),
        rtol=0.05, atol=70.0,
    )

    def f(mat):
        Lm = dp_svi._lam_cholesky(mat)
        return jnp.sum(jnp.log(jnp.diagonal(Lm))) + jnp.sum(Lm)

    g = jax.grad(f)(lam)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_lam_cholesky_gershgorin_rung_cannot_fail():
    """Deficits beyond any fixed rung (measured -131 at c7 scale) must
    still repair: the final Gershgorin rung guarantees positive
    definiteness for ANY symmetric input, so a corrupted stored Lambda
    can never re-freeze the run."""
    rng = jax.random.PRNGKey(2)
    a = jax.random.normal(rng, (16, 16))
    base = a @ a.T * 1e4
    w, v = jnp.linalg.eigh(base)
    for deficit in (-200.0, -1e6):
        lam = (v * w.at[0].set(deficit)[None, :]) @ v.T
        L = dp_svi._lam_cholesky(lam)
        assert bool(jnp.all(jnp.isfinite(L))), deficit
        g = jax.grad(
            lambda mat: jnp.sum(jnp.log(jnp.diagonal(
                dp_svi._lam_cholesky(mat))))
        )(lam)
        assert bool(jnp.all(jnp.isfinite(g))), deficit


def test_expected_residuals_tracks_planted_noise():
    """expected_residuals at the optimal q(u) of a T=1 model: dims of
    the noisier planted group must show larger expected residuals, and
    the residual-quantile split ladder must bracket both noise levels
    (monotone, spanning low-to-high)."""
    rng = jax.random.PRNGKey(5)
    Y, labels, _ = synthetic.grouped_dims_big(
        rng, n=64, dims_per_group=(5, 5), q=2, noise=(0.01, 0.4)
    )
    cfg1 = dp_svi.Config(num_latent=2, num_inducing=12, truncation=1,
                         batch=32)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Y, cfg1)
    # residual contrast needs a FIT model (untrained, every dim's
    # residual is ~var(y)): short T=1 training as in the c7 stage 1
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = dp_svi.make_dp_svi_step(cfg1, Y.shape[0], opt, rho=0.3)
    state = init_state(params, opt)
    rng2 = jax.random.PRNGKey(9)
    for _ in range(300):
        rng2, sub = jax.random.split(rng2)
        state, _ = step(state, sub, Y)
    params = dp_svi.set_optimal_qu(state.params, Y, cfg1)
    r = np.asarray(dp_svi.expected_residuals(params, Y, cfg1))
    assert r.shape == (Y.shape[1],) and np.all(np.isfinite(r))
    labels = np.asarray(labels)
    assert r[labels == 1].min() > r[labels == 0].max(), r

    cfgT = cfg1._replace(truncation=4)
    out = dp_svi.split_single_atom(params, cfgT, residuals=jnp.asarray(r))
    from dp_gp_lvm_tpu.core.transforms import positive_noise
    noises = np.asarray(positive_noise(out["raw_noise"]))
    assert np.all(np.diff(noises) > 0), noises           # monotone ladder
    assert noises[0] <= np.median(r[labels == 0]) * 1.5
    assert noises[-1] >= np.median(r[labels == 1]) * 0.5


def test_predict_t1_matches_svi_gplvm():
    """T=1 at the optimal q(u): dp_svi.predict_from_latent equals
    svi_gplvm.predict_from_latent (same posterior, same psi-moment
    algebra; the mixture collapses to its single atom)."""
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.toy_gplvm(rng, n=30, d=5, q_true=2)
    scfg = svi_gplvm.Config(num_latent=2, num_inducing=8, batch=10)
    sparams = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, scfg)
    dcfg = dp_svi.Config(num_latent=2, num_inducing=8, truncation=1,
                         batch=10)
    dparams = dp_svi.init_params(jax.random.PRNGKey(1), Y, dcfg)
    for k in ("qx_mean", "raw_qx_var"):
        dparams[k] = sparams[k]
    for k in ("z", "raw_variance", "raw_ard", "raw_noise"):
        dparams[k] = sparams[k][None]
    d_opt = dp_svi.set_optimal_qu(dparams, Y, dcfg)
    s_opt = svi_gplvm.set_optimal_qu(sparams, Y, scfg)

    xm = jnp.asarray([[0.3, -0.2], [1.0, 0.5], [-0.7, 0.1]])
    xv = jnp.full_like(xm, 0.05)
    dm, dv = dp_svi.predict_from_latent(d_opt, xm, xv, dcfg)
    sm, sv = svi_gplvm.predict_from_latent(s_opt, xm, xv, scfg)
    np.testing.assert_allclose(np.asarray(dm), np.asarray(sm),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(sv),
                               rtol=1e-5, atol=1e-7)


def test_predict_one_hot_phi_selects_owning_atom():
    """With phi one-hot, every dim's mixture predictive equals the
    predictive of its owning atom alone (mixture variance collapses)."""
    Y, labels, cfg, _, params = _setup(n=40, dims=(4, 4), t=3, m=8)
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    d = Y.shape[1]
    hard = jnp.asarray([0] * 4 + [2] * 4)
    params["phi_logits"] = 60.0 * jax.nn.one_hot(hard, cfg.truncation)

    xm = params["qx_mean"][:3]
    xv = dp_svi.constrain(params)["qx_var"][:3]
    mean, var = dp_svi.predict_from_latent(params, xm, xv, cfg)

    c = dp_svi.constrain(params)
    mu_t, S_t = dp_svi.qu_moments(params)
    from dp_gp_lvm_tpu.core.types import JitterPolicy
    f_t, v_t = dp_svi._atom_predictive(c, xm, xv, mu_t, S_t, cfg,
                                       JitterPolicy())
    for dd in range(d):
        t = int(hard[dd])
        np.testing.assert_allclose(np.asarray(mean[:, dd]),
                                   np.asarray(f_t[t, :, dd]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(var[:, dd]),
                                   np.asarray(v_t[t, :, dd]), rtol=1e-4)


def test_dp_svi_impute_beats_mean_baseline():
    """Train DP-SVI on grouped data, mask half the dims of held-out
    rows, impute: masked-dim MSE must beat predicting zeros (the
    training mean of standardized data)."""
    rng = jax.random.PRNGKey(11)
    Y, labels, _ = synthetic.grouped_dims(
        rng, n=72, dims_per_group=(5, 5), q=2, noise=0.01
    )
    Y_train, Y_test = Y[:56], Y[56:]
    cfg = dp_svi.Config(num_latent=2, num_inducing=10, truncation=3,
                        batch=16)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Y_train, cfg)
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = dp_svi.make_dp_svi_step(cfg, Y_train.shape[0], opt, rho=0.3,
                                   rho_phi=0.1)
    state = init_state(params, opt)
    r = jax.random.PRNGKey(7)
    for _ in range(300):
        r, sub = jax.random.split(r)
        state, _ = step(state, sub, Y_train)

    mask = jnp.zeros_like(Y_test).at[:, ::2].set(1.0)
    mean, var, _, _, _ = dp_svi.impute(state.params, Y_test, mask, cfg,
                                       num_steps=150)
    missing = 1.0 - mask
    mse = float(jnp.sum(missing * (mean - Y_test) ** 2)
                / jnp.sum(missing))
    base = float(jnp.sum(missing * Y_test ** 2) / jnp.sum(missing))
    assert np.isfinite(mse)
    assert mse < 0.5 * base, (mse, base)
    assert bool(jnp.all(var > 0))


def test_dp_svi_serving_imputer_matches_pipeline():
    """The compile-once serving factory (models/serving.py:
    make_dp_svi_imputer) reproduces the dp_svi.impute pipeline exactly
    for the same step budget — the factory only moves the train-data-
    dependent work (candidate latents + their mixture predictions) to
    build time."""
    from dp_gp_lvm_tpu.models import serving

    Y, _, cfg, _, params = _setup(n=48, dims=(4, 4))
    params = dp_svi.set_optimal_qu(params, Y, cfg)
    y_star = Y[:6]
    mask = jnp.zeros_like(y_star).at[:, ::2].set(1.0)

    mean_p, var_p, *_ = dp_svi.impute(params, y_star, mask, cfg,
                                      num_steps=60, tol=None)
    imputer = serving.make_dp_svi_imputer(params, cfg, num_steps=60,
                                          tol=None)
    mean_s, var_s = imputer(y_star, mask)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_p),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_p),
                               rtol=1e-5, atol=1e-8)
    assert bool(jnp.all(jnp.isfinite(mean_s)))
