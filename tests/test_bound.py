"""Collapsed-bound properties (SURVEY.md section 4 'Model/ELBO tests'):
the sparse bound is <= the exact GP log marginal, with equality at Z = X;
and an independent dense-algebra oracle reproduces the stable form."""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.core.transforms import positive_inverse
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.models import gp_regression, sparse_gp
from dp_gp_lvm_tpu.models.bound import collapsed_bound, suff_stats_from_psi

POLICY = JitterPolicy(initial=1e-12)


def _data(np_rng, n=30, d=2, q=2):
    X = jnp.asarray(np_rng.normal(size=(n, q)))
    Y = jnp.asarray(np_rng.normal(size=(n, d)))
    return X, Y


def _params(q, z):
    return {
        "raw_variance": positive_inverse(jnp.asarray(1.3)),
        "raw_ard": positive_inverse(jnp.full((q,), 0.8)),
        "raw_noise": positive_inverse(jnp.asarray(0.2)),
        "z": z,
    }


def test_sgpr_equals_exact_gp_at_z_equals_x(np_rng):
    X, Y = _data(np_rng)
    params = _params(2, X)
    exact = float(gp_regression.log_marginal(params, X, Y, POLICY))
    bound = float(sparse_gp.elbo(params, X, Y, POLICY))
    np.testing.assert_allclose(bound, exact, rtol=1e-6)


def test_sgpr_bound_below_exact(np_rng):
    X, Y = _data(np_rng)
    params = _params(2, X[:7])
    exact = float(gp_regression.log_marginal(params, X, Y, POLICY))
    bound = float(sparse_gp.elbo(params, X, Y, POLICY))
    assert bound <= exact + 1e-8


def test_bound_matches_dense_oracle(np_rng):
    """Direct dense evaluation of the Titsias bound:
    F = log N(Y | 0, Q_nn + sigma^2 I) - beta/2 (Psi0 - tr(K_uu^{-1} Psi2))
    for observed inputs (Q_nn = K_nm K_mm^{-1} K_mn)."""
    X, Y = _data(np_rng, n=25, d=3)
    Z = X[:6]
    variance, noise = 1.3, 0.2
    ard = jnp.full((2,), 0.8)
    kuu = ard_rbf.gram(variance, ard, Z)
    p0, p1, p2 = ard_rbf.observed_psi(variance, ard, X, Z)
    stats = suff_stats_from_psi(p0, p1, p2, Y)
    got = float(jnp.sum(collapsed_bound(kuu, stats, noise, POLICY).per_dim))

    kuu_np = np.asarray(kuu) + 1e-12 * np.eye(6)
    knm = np.asarray(p1)
    qnn = knm @ np.linalg.solve(kuu_np, knm.T)
    cov = qnn + noise * np.eye(X.shape[0])
    sign, logdet = np.linalg.slogdet(cov)
    quad = np.sum(np.asarray(Y) * np.linalg.solve(cov, np.asarray(Y)))
    d = Y.shape[1]
    ll = -0.5 * quad - 0.5 * d * logdet - 0.5 * d * X.shape[0] * np.log(2 * np.pi)
    trace_corr = -0.5 / noise * (
        float(p0) - np.trace(np.linalg.solve(kuu_np, np.asarray(p2)))
    ) * d
    np.testing.assert_allclose(got, ll + trace_corr, rtol=1e-6)


def test_sgpr_predict_sane(np_rng):
    X, Y = _data(np_rng, n=40, d=1)
    params = _params(2, X[:10])
    mean, var = sparse_gp.predict(params, X, Y, X[:5], POLICY)
    assert mean.shape == (5, 1)
    assert var.shape == (5,)
    assert bool(jnp.all(var > 0))


def test_gp_regression_loss_grad_finite(np_rng):
    X, Y = _data(np_rng)
    params = {
        "raw_variance": positive_inverse(jnp.asarray(1.0)),
        "raw_ard": positive_inverse(jnp.ones((2,))),
        "raw_noise": positive_inverse(jnp.asarray(0.1)),
    }
    g = jax.grad(gp_regression.loss)(params, X, Y)
    for leaf in jax.tree_util.tree_leaves(g):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_sgpr_predict_equals_exact_gp_at_z_equals_x(np_rng):
    """With Z = X the SGPR predictive equals the exact GP predictive."""
    X, Y = _data(np_rng, n=25, d=2)
    params = _params(2, X)
    Xs = jnp.asarray(np_rng.normal(size=(7, 2)))
    m_exact, v_exact = gp_regression.predict(params, X, Y, Xs, POLICY)
    m_sgpr, v_sgpr = sparse_gp.predict(params, X, Y, Xs, POLICY)
    np.testing.assert_allclose(np.asarray(m_sgpr), np.asarray(m_exact),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v_sgpr), np.asarray(v_exact),
                               rtol=1e-4, atol=1e-6)


def test_collapsed_bound_batched_equals_vmapped():
    """Batch-polymorphic collapsed_bound (round 5) == vmapping the
    per-atom call — per_dim, shared, quad, logdet, trace all equal."""
    from dp_gp_lvm_tpu.models.bound import SuffStats, collapsed_bound

    rng = jax.random.PRNGKey(3)
    T, M, D = 4, 12, 7
    ks = jax.random.split(rng, 5)
    A0 = jax.random.normal(ks[0], (T, M, M))
    kuu = A0 @ jnp.swapaxes(A0, 1, 2) / M + 2.0 * jnp.eye(M)
    P0 = jax.random.normal(ks[1], (T, M, M))
    psi2 = P0 @ jnp.swapaxes(P0, 1, 2) / M
    p1y = jax.random.normal(ks[2], (T, M, D))
    psi0 = jnp.abs(jax.random.normal(ks[3], (T,))) * 50.0
    yty = jnp.abs(jax.random.normal(ks[4], (D,))) * 50.0
    noise = jnp.linspace(0.1, 0.4, T)
    n = jnp.asarray(50.0)

    batched = collapsed_bound(
        kuu, SuffStats(psi0=psi0, psi1T_y=p1y, psi2=psi2, yty=yty, n=n),
        noise,
    )

    def one(k1, p01, p1y1, p21, nv):
        st = SuffStats(psi0=p01, psi1T_y=p1y1, psi2=p21, yty=yty, n=n)
        return collapsed_bound(k1, st, nv)

    ref = jax.vmap(one)(kuu, psi0, p1y, psi2, noise)
    np.testing.assert_allclose(np.asarray(batched.per_dim),
                               np.asarray(ref.per_dim), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(batched.logdet_b),
                               np.asarray(ref.logdet_b), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(batched.trace_a),
                               np.asarray(ref.trace_a), rtol=1e-10)


def test_optimal_qu_batched_equals_vmapped():
    from dp_gp_lvm_tpu.models.bound import SuffStats, optimal_qu

    rng = jax.random.PRNGKey(4)
    T, M, D = 3, 10, 6
    ks = jax.random.split(rng, 4)
    A0 = jax.random.normal(ks[0], (T, M, M))
    kuu = A0 @ jnp.swapaxes(A0, 1, 2) / M + 2.0 * jnp.eye(M)
    P0 = jax.random.normal(ks[1], (T, M, M))
    psi2 = P0 @ jnp.swapaxes(P0, 1, 2) / M
    p1y = jax.random.normal(ks[2], (T, M, D))
    yty = jnp.ones((D,))
    n = jnp.asarray(30.0)
    noise = jnp.linspace(0.2, 0.5, T)

    st_b = SuffStats(psi0=jnp.ones((T,)), psi1T_y=p1y, psi2=psi2,
                     yty=yty, n=n)
    w_b, L_b, LB_b = optimal_qu(kuu, st_b, noise)

    def one(k1, p1y1, p21, nv):
        st = SuffStats(psi0=jnp.asarray(1.0), psi1T_y=p1y1, psi2=p21,
                       yty=yty, n=n)
        return optimal_qu(k1, st, nv)

    w_r, L_r, LB_r = jax.vmap(one)(kuu, p1y, psi2, noise)
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_r),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(L_b), np.asarray(L_r),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(LB_b), np.asarray(LB_r),
                               rtol=1e-10)
