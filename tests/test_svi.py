"""SVI-GPLVM (uncollapsed Hensman bound, models/svi_gplvm.py).

Oracles:
  1. At the closed-form optimal whitened q(u), the Hensman bound EQUALS
     the Titsias collapsed bound (bgplvm.elbo) — exact identity.
  2. At any other q(u) it is strictly below (u is an explicit
     variational distribution the collapsed bound optimizes out).
  3. The minibatch estimator over a disjoint partition averages to the
     full-batch bound exactly (row terms are linear in the row sums).
"""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import bgplvm, svi_gplvm
from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state


def _setup(n=48, d=5, q=2, m=8):
    Y, _ = synthetic.toy_gplvm(jax.random.PRNGKey(0), n=n, d=d, q_true=2,
                               q_total=q)
    cfg = svi_gplvm.Config(num_latent=q, num_inducing=m, batch=16)
    params = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    return Y, cfg, params


def _collapsed_elbo(params, Y, cfg):
    bcfg = bgplvm.Config(num_latent=cfg.num_latent,
                         num_inducing=cfg.num_inducing)
    bparams = {k: params[k] for k in (
        "qx_mean", "raw_qx_var", "z", "raw_variance", "raw_ard",
        "raw_noise",
    )}
    return float(bgplvm.elbo(bparams, Y, bcfg))


def test_optimal_qu_recovers_collapsed_bound():
    Y, cfg, params = _setup()
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    svi = float(svi_gplvm.elbo(params, Y, cfg))
    collapsed = _collapsed_elbo(params, Y, cfg)
    # rtol floor: collapsed_bound's safe_cholesky jitters B by 1e-6,
    # the whitened bound's logdet S* is unjittered — O(M*jitter/|F|)
    # ~ 1e-8 relative is inherent, anything above 1e-6 is a bug
    np.testing.assert_allclose(svi, collapsed, rtol=1e-6)


def test_optimal_qu_recovers_collapsed_bound_linear_kernel():
    """Same identity with kernel='linear' — regression for the whitened
    core whitening against the WRONG K_uu (the gram calls used to omit
    kernel=, so a linear config's bound/serving paths whitened u against
    the ard_rbf K_uu while the psi statistics were linear)."""
    Y, _, _ = _setup()
    cfg = svi_gplvm.Config(num_latent=2, num_inducing=8, batch=16,
                           kernel="linear")
    params = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    svi = float(svi_gplvm.elbo(params, Y, cfg))
    bcfg = bgplvm.Config(num_latent=2, num_inducing=8, kernel="linear")
    bparams = {k: params[k] for k in (
        "qx_mean", "raw_qx_var", "z", "raw_variance", "raw_ard",
        "raw_noise",
    )}
    collapsed = float(bgplvm.elbo(bparams, Y, bcfg))
    # looser than the rbf identity: linear K_uu is rank-Q (2 of M=8),
    # so safe_cholesky's escalated jitter perturbs the two bound forms
    # asymmetrically at O(jitter/eig_min) — measured 5e-6 rel here,
    # vs the wrong-kernel whitening this guards against at O(1)
    np.testing.assert_allclose(svi, collapsed, rtol=5e-5)
    # and the pathwise sampler agrees with the (now-consistent)
    # predictive at deterministic x* — exact features, so tight
    from dp_gp_lvm_tpu.models import sampling

    x_star = svi_gplvm.constrain(params)["qx_mean"][:6]
    smp = sampling.make_svi_pathwise_sampler(
        jax.random.PRNGKey(2), params, cfg, num_samples=20000,
    )
    f = np.asarray(sampling.sample_at(smp, x_star))
    mean_true, var_full = svi_gplvm.predict_from_latent(
        params, x_star, jnp.zeros_like(x_star), cfg
    )
    noise = float(svi_gplvm.constrain(params)["noise"])
    var_true = np.maximum(np.asarray(var_full) - noise, 0.0)
    se = np.sqrt(var_true / 20000)
    assert np.all(np.abs(f.mean(0) - np.asarray(mean_true))
                  < 6 * se + 1e-4)


def test_suboptimal_qu_is_below_collapsed_bound():
    Y, cfg, params = _setup()
    collapsed = _collapsed_elbo(params, Y, cfg)
    # init q(u) = prior (m=0, S=I): valid but suboptimal
    svi = float(svi_gplvm.elbo(params, Y, cfg))
    assert svi < collapsed - 1.0, (svi, collapsed)
    # perturbed optimum also below
    p2 = svi_gplvm.set_optimal_qu(params, Y, cfg)
    p2 = {**p2, "u_mean": p2["u_mean"] + 0.1}
    svi2 = float(svi_gplvm.elbo(p2, Y, cfg))
    assert svi2 < collapsed, (svi2, collapsed)


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


def test_svi_training_improves_full_elbo():
    Y, cfg, params = _setup()
    n = Y.shape[0]
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = svi_gplvm.make_svi_step(cfg, n, opt)
    state = init_state(params, opt)
    e0 = float(svi_gplvm.elbo(state.params, Y, cfg))
    rng = jax.random.PRNGKey(3)
    for k in range(200):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, sub, Y)
    e1 = float(svi_gplvm.elbo(state.params, Y, cfg))
    assert np.isfinite(e1)
    assert e1 > e0 + 1.0, (e0, e1)


def test_predict_from_latent_sane():
    """Predictions at the TRAINING latents with a well-fit q(u) track the
    data; variances positive and finite."""
    Y, cfg, params = _setup()
    params = svi_gplvm.set_optimal_qu(params, Y, cfg)
    c = svi_gplvm.constrain(params)
    mean, var = svi_gplvm.predict_from_latent(
        params, c["qx_mean"], c["qx_var"], cfg
    )
    assert mean.shape == Y.shape and var.shape == Y.shape
    assert bool(jnp.all(jnp.isfinite(mean)))
    assert bool(jnp.all(var > 0))
    # better than predicting the column means
    base = float(jnp.mean((Y - Y.mean(axis=0)) ** 2))
    mse = float(jnp.mean((mean - Y) ** 2))
    assert mse < 0.7 * base, (mse, base)


def test_svi_sharded_matches_single_device():
    """Sharded minibatch SVI (parallel/sharded_elbo.svi_elbo_sharded)
    equals elbo_minibatch — values and gradients — on the 8-device mesh."""
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
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9
        )


def test_svi_impute_beats_mean_baseline():
    """Train (closed-form q(u) at fitted latents suffices on the toy),
    hold out half the dims of unseen-ish rows, impute from q(u) alone —
    no training data at serving time."""
    Y, cfg, params = _setup(n=48, d=6)
    n = Y.shape[0]
    # quick fit: optimize everything a little, then exact q(u)
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = svi_gplvm.make_svi_step(cfg, n, opt)
    state = init_state(params, opt)
    rng = jax.random.PRNGKey(5)
    for _ in range(300):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, sub, Y)
    params = svi_gplvm.set_optimal_qu(state.params, Y, cfg)

    y_star = Y[::7]
    d = Y.shape[1]
    mask = jnp.ones_like(y_star).at[:, d // 2 :].set(0.0)
    mean, var, m_s, s_s, trace = svi_gplvm.impute(
        params, y_star, mask, cfg, num_steps=150
    )
    miss = 1.0 - mask
    mse = float(jnp.sum(((mean - y_star) ** 2) * miss) / jnp.sum(miss))
    base = float(
        jnp.sum(((Y.mean(axis=0) - y_star) ** 2) * miss) / jnp.sum(miss)
    )
    assert np.isfinite(mse)
    assert mse < 0.5 * base, (mse, base)
    assert bool(jnp.all(var > 0))


def test_natgrad_full_batch_rho1_lands_on_optimum():
    """One natural-gradient step with rho=1 and batch == exactly the
    full data (deterministic sampler) sets q(u) to the closed-form
    optimum of the UPDATED hypers/latents: the post-step q(u) ITSELF
    satisfies the collapsed-bound identity — exercising the blend's
    natural-parameter conversion, rho mixing, and scale factor (no
    set_optimal_qu rewrite of the state under test)."""
    Y, cfg, params = _setup(n=32)
    cfg = cfg._replace(batch=32)
    opt = gp_optimizer(params, lr=1e-3)
    step = svi_gplvm.make_svi_natgrad_step(
        cfg, 32, opt, rho=1.0, sample_idx=lambda rng: jnp.arange(32)
    )
    state = init_state(params, opt)
    state, _ = step(state, jax.random.PRNGKey(0), Y)
    svi = float(svi_gplvm.elbo(state.params, Y, cfg))
    collapsed = _collapsed_elbo(state.params, Y, cfg)
    np.testing.assert_allclose(svi, collapsed, rtol=1e-5)


def test_natgrad_blend_at_grad_full_batch_rho1():
    """blend_at="grad" with rho=1 and a full deterministic batch lands
    q(u) on the optimum of the PRE-update params (the gradient pass's
    statistics); a second zero-lr step then matches the collapsed bound
    at the (unchanged) hypers."""
    Y, cfg, params = _setup(n=32)
    cfg = cfg._replace(batch=32)
    opt = gp_optimizer(params, lr=0.0, hyper_lr=0.0)
    step = svi_gplvm.make_svi_natgrad_step(
        cfg, 32, opt, rho=1.0, blend_at="grad",
        sample_idx=lambda rng: jnp.arange(32),
    )
    state = init_state(params, opt)
    state, _ = step(state, jax.random.PRNGKey(0), Y)
    # lr=0: hypers unchanged, so the grad-pass stats ARE the current
    # stats and the identity holds exactly
    svi = float(svi_gplvm.elbo(state.params, Y, cfg))
    collapsed = _collapsed_elbo(state.params, Y, cfg)
    np.testing.assert_allclose(svi, collapsed, rtol=1e-5)


def test_natgrad_robbins_monro_schedule_trains():
    """rho_t0 enables the Robbins-Monro decay; training stays finite and
    improves, and the schedule value actually decays with t."""
    Y, cfg, params = _setup(n=48)
    n = Y.shape[0]
    opt = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step = svi_gplvm.make_svi_natgrad_step(
        cfg, n, opt, rho=0.5, rho_t0=20.0, rho_kappa=0.7
    )
    e0 = float(svi_gplvm.elbo(params, Y, cfg))
    st = init_state(params, opt)
    rng = jax.random.PRNGKey(11)
    for _ in range(120):
        rng, sub = jax.random.split(rng)
        st, _ = step(st, sub, Y)
    e1 = float(svi_gplvm.elbo(st.params, Y, cfg))
    assert np.isfinite(e1)
    assert e1 > e0 + 10.0, (e0, e1)


def test_natgrad_nonfinite_blend_keeps_previous_qu():
    """The post-blend guard: a non-finite blended q(u) leaves the
    previous q(u) in place instead of poisoning the state."""
    prev = {"u_mean": jnp.ones((3, 2)), "raw_u_scale": jnp.eye(3)}
    bad_mean = jnp.array([[jnp.nan, 1.0], [0.0, 1.0], [0.0, 1.0]])
    out = svi_gplvm._guarded_qu(prev, bad_mean, jnp.eye(3) * 2.0)
    np.testing.assert_array_equal(np.asarray(out["u_mean"]),
                                  np.asarray(prev["u_mean"]))
    np.testing.assert_array_equal(np.asarray(out["raw_u_scale"]),
                                  np.asarray(prev["raw_u_scale"]))
    good = svi_gplvm._guarded_qu(
        prev, jnp.zeros_like(bad_mean), jnp.eye(3) * 2.0
    )
    np.testing.assert_array_equal(np.asarray(good["raw_u_scale"]),
                                  np.asarray(jnp.eye(3) * 2.0))


def test_natgrad_trains_stably():
    """Natural-gradient q(u) updates train stably alongside gradient
    hypers/latents and improve the full bound. (The at-scale comparison
    vs Adam-on-q(u) — natgrad ahead at every rho in 0.05..0.5, ~30x
    fewer wall-seconds to the same bound — is pinned as a committed TPU
    artifact, results/svi_natgrad.json; tiny-batch toys are dominated by
    target variance and are not the regime the method exists for.)"""
    Y, cfg, params = _setup(n=48)
    n = Y.shape[0]
    opt_n = gp_optimizer(params, lr=2e-2, ngd_lr=0.5)
    step_n = svi_gplvm.make_svi_natgrad_step(cfg, n, opt_n, rho=0.2)
    e0 = float(svi_gplvm.elbo(params, Y, cfg))
    st_n = init_state(jax.tree.map(jnp.copy, params), opt_n)
    rng = jax.random.PRNGKey(7)
    for _ in range(120):
        rng, sub = jax.random.split(rng)
        st_n, _ = step_n(st_n, sub, Y)
    e_nat = float(svi_gplvm.elbo(st_n.params, Y, cfg))
    assert np.isfinite(e_nat)
    assert e_nat > e0 + 10.0, (e0, e_nat)


def test_noise_floor_binds_and_elbo_stays_bounded():
    """Config.noise_floor lower-bounds the constrained noise variance
    (the amortized-mode collapse guard — see the c8 postmortem in
    Config.noise_floor's docstring): even at raw_noise -> -inf the
    constrained value stays >= floor, and the full-data ELBO respects
    the per-value information bound -0.5*log(2*pi*floor) that a
    collapsed-noise f32 cancellation would blow through."""
    Y, cfg, params = _setup(n=32, d=4)
    cfg = cfg._replace(noise_floor=1e-3, amortized=False)
    params["raw_noise"] = jnp.asarray(-40.0, Y.dtype)  # softplus -> ~0
    c = svi_gplvm.constrain(params, cfg)
    assert float(c["noise"]) >= 1e-3
    # external callers without a config keep the legacy MIN_NOISE floor
    c_legacy = svi_gplvm.constrain(params)
    assert float(c_legacy["noise"]) < 1e-3
    e = float(svi_gplvm.elbo(params, Y, cfg))
    n_vals = Y.size
    cap = n_vals * 0.5 * (-np.log(2 * np.pi * 1e-3))  # perfect-fit max
    assert np.isfinite(e) and e <= cap + 1.0, (e, cap)


def test_noise_floor_amortized_trains_above_floor():
    """Amortized training under a noise floor stays finite and the
    trained noise respects the floor (regression for the c8 collapse:
    without the floor the encoder memorizes y->x and the bound becomes
    beta~1e6 f32 cancellation noise)."""
    Y, _, _ = _setup(n=64, d=6)
    cfg = svi_gplvm.Config(num_latent=2, num_inducing=8, batch=32,
                           amortized=True, noise_floor=1e-3)
    params = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    opt = gp_optimizer(params, lr=2e-2)
    step = svi_gplvm.make_svi_step(cfg, Y.shape[0], opt)
    state = init_state(params, opt)
    rng = jax.random.PRNGKey(3)
    for _ in range(100):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, sub, Y)
    c = svi_gplvm.constrain(state.params, cfg)
    assert float(c["noise"]) >= 1e-3
    assert np.isfinite(float(svi_gplvm.elbo(state.params, Y, cfg)))


def _naive_natural_blend(u_mean, ls, a, A2, beta, rho):
    """The textbook blend through explicit naturals (the round-3
    implementation) — the f64 oracle for natgrad_blend_qu."""
    m = ls.shape[0]
    eye = jnp.eye(m, dtype=ls.dtype)
    c = {"u_mean": u_mean, "u_scale": ls}
    h, lam = svi_gplvm._natural_from_params(c)
    lam_new = (1.0 - rho) * lam + rho * (eye + beta * A2)
    h_new = (1.0 - rho) * h + rho * beta * a
    return svi_gplvm._params_from_natural(h_new, lam_new)


def _random_blend_inputs(key, m, d, kappa, dtype):
    """q(u) state + batch whitened stats whose precision target
    I + beta*A2 has condition number ~kappa."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # current S = ls ls^T: the fixed point of an earlier blend at the
    # same scale (diag decaying from 1 to 1/kappa)
    lam_eigs = jnp.logspace(0, jnp.log10(kappa), m).astype(dtype)
    q_rot, _ = jnp.linalg.qr(jax.random.normal(k1, (m, m), dtype))
    A2 = (q_rot * ((lam_eigs - 1.0) / 10.0)) @ q_rot.T   # beta=10 below
    A2 = 0.5 * (A2 + A2.T)
    beta = jnp.asarray(10.0, dtype)
    s_cur = (q_rot / (1.0 + 0.7 * (lam_eigs - 1.0))) @ q_rot.T
    ls = jnp.linalg.cholesky(0.5 * (s_cur + s_cur.T))
    u_mean = jax.random.normal(k3, (m, d), dtype)
    a = 50.0 * jax.random.normal(k4, (m, d), dtype)
    return u_mean, ls, a, A2, beta


def test_natgrad_blend_qu_matches_naive_naturals_f64():
    """natgrad_blend_qu is the SAME natural-gradient update as the
    explicit-naturals blend — exact algebra, checked in f64 at a
    moderate condition number where the naive path is accurate."""
    u_mean, ls, a, A2, beta = _random_blend_inputs(
        jax.random.PRNGKey(0), m=12, d=4, kappa=1e4, dtype=jnp.float64
    )
    rho = jnp.asarray(0.2, jnp.float64)
    m_new, raw_new = svi_gplvm.natgrad_blend_qu(u_mean, ls, a, A2, beta,
                                                rho)
    m_ref, raw_ref = _naive_natural_blend(u_mean, ls, a, A2, beta, rho)
    np.testing.assert_allclose(np.asarray(m_new), np.asarray(m_ref),
                               rtol=1e-9, atol=1e-9)
    # compare the S they imply (raw parameterizations may differ by
    # sign conventions; S is the invariant)
    from dp_gp_lvm_tpu.core.transforms import positive

    def s_of(raw):
        l = jnp.tril(raw, -1) + jnp.diag(positive(jnp.diagonal(raw)))
        return l @ l.T

    np.testing.assert_allclose(np.asarray(s_of(raw_new)),
                               np.asarray(s_of(raw_ref)),
                               rtol=1e-8, atol=1e-12)


def test_natgrad_blend_qu_recovers_from_pathological_state_f32():
    """The committed-c8 freeze, reduced to one call: after a spike the
    stored q(u) has S directions ~1e-12, so cond(Lambda) ~ 1e12 and the
    explicit-naturals blend's f32 chol(Lambda) is non-finite EVERY step
    — the guard then pins q(u) to the pathological state for the rest
    of the run. The sandwiched blend never forms Lambda (only solves
    against ls), so the same call stays finite, matches the f64 oracle,
    and pulls q(u) back toward the healthy batch optimum."""
    m, d = 24, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)

    # generate ONE f64 input set; the f32 path gets the cast of the
    # same values (drawing per-dtype would compare different problems)
    diag = jnp.logspace(0, -6, m).astype(jnp.float64)
    ls64 = jnp.diag(diag) + 0.1 * jnp.tril(
        jax.random.normal(k1, (m, m), jnp.float64), -1
    ) * diag[None, :]
    x = jax.random.normal(k2, (4 * m, m), jnp.float64)
    A2_64 = (x.T @ x) * (1e3 / (4 * m))     # beta*A2 ~ 1e4, PD in f32
    A2_64 = 0.5 * (A2_64 + A2_64.T)
    beta64 = jnp.asarray(10.0, jnp.float64)
    u64 = jax.random.normal(k3, (m, d), jnp.float64)
    a64 = 50.0 * jax.random.normal(jax.random.fold_in(k3, 1),
                                   (m, d), jnp.float64)
    inputs64 = (u64, ls64, a64, A2_64, beta64)
    inputs32 = tuple(v.astype(jnp.float32) for v in inputs64)

    def make(dtype):
        return inputs64 if dtype == jnp.float64 else inputs32

    m_oracle, raw_oracle = svi_gplvm.natgrad_blend_qu(
        *make(jnp.float64), jnp.asarray(0.2, jnp.float64)
    )
    m_new, raw_new = svi_gplvm.natgrad_blend_qu(
        *make(jnp.float32), jnp.asarray(0.2, jnp.float32)
    )
    assert bool(jnp.all(jnp.isfinite(m_new)))
    assert bool(jnp.all(jnp.isfinite(raw_new)))
    np.testing.assert_allclose(np.asarray(m_new),
                               np.asarray(m_oracle, np.float32),
                               rtol=1e-3, atol=1e-3)
    # the naive path at the same f32 inputs is non-finite (this is the
    # freeze: _guarded_qu would reject it and keep the bad state)
    m_naive, raw_naive = _naive_natural_blend(
        *make(jnp.float32), jnp.asarray(0.2, jnp.float32)
    )
    assert not bool(jnp.all(jnp.isfinite(m_naive))
                    & jnp.all(jnp.isfinite(raw_naive))), \
        "naive blend unexpectedly fine - make the state more extreme"


def test_elbo_f64_matches_jax_elbo_resident_and_amortized():
    """The numpy/f64 host evaluator (models/eval_f64.py) reproduces
    svi_gplvm.elbo on the f64 CPU path in BOTH q(X) modes — the
    independent oracle that re-derives constrain, the psi statistics,
    and the whitened bound from the math."""
    from dp_gp_lvm_tpu.models import eval_f64

    Y, _ = synthetic.toy_gplvm(jax.random.PRNGKey(5), n=96, d=6,
                               q_true=2, q_total=3, dtype=jnp.float64)
    for kw in (
        {},                                    # resident
        {"amortized": True, "encoder_hidden": 8,
         "noise_floor": 1e-3, "qx_var_floor": 1e-2},
    ):
        cfg = svi_gplvm.Config(num_latent=3, num_inducing=10, batch=32,
                               **kw)
        params = svi_gplvm.init_params(jax.random.PRNGKey(6), Y, cfg)
        # move params off the init manifold so the check is not vacuous
        params = jax.tree_util.tree_map(
            lambda v: v + 0.01 * jnp.sin(jnp.arange(v.size,
                                                    dtype=v.dtype)
                                         ).reshape(v.shape), params)
        ref = float(svi_gplvm.elbo(params, Y, cfg))
        got = eval_f64.elbo_f64(params, Y, cfg, chunk=17)
        np.testing.assert_allclose(got, ref, rtol=5e-5)
