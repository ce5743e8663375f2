"""Distribution tests: KLs vs scipy oracles; stick-breaking properties."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps
import scipy.stats as st

from dp_gp_lvm_tpu.distributions import gaussian, stick_breaking


def test_gaussian_kl_matches_scipy(np_rng):
    mu = jnp.asarray(np_rng.normal(size=(5, 3)))
    s = jnp.asarray(np_rng.uniform(0.1, 2.0, size=(5, 3)))
    got = float(gaussian.kl_to_standard_normal(mu, s))
    want = 0.5 * np.sum(
        np.asarray(mu) ** 2 + np.asarray(s) - np.log(np.asarray(s)) - 1.0
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_beta_kl_matches_numerical(np_rng):
    """KL[Beta(a,b)||Beta(1,alpha)] vs numerical quadrature."""
    a, b, alpha = 2.3, 1.7, 1.5
    got = float(
        stick_breaking.beta_kl(jnp.asarray([a]), jnp.asarray([b]), alpha)
    )
    xs = np.linspace(1e-6, 1 - 1e-6, 400_001)
    p = st.beta.pdf(xs, a, b)
    want = np.trapezoid(
        p * (st.beta.logpdf(xs, a, b) - st.beta.logpdf(xs, 1.0, alpha)), xs
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_beta_kl_zero_at_prior():
    assert abs(float(
        stick_breaking.beta_kl(jnp.ones(3), jnp.full(3, 2.0), 2.0)
    )) < 1e-10


def test_expected_log_pi_normalizes():
    """exp(E[log pi]) under the mean sticks ~ proper weights; pi sums to 1
    in expectation-of-log space: check sum over t of pi(E[v]) == 1."""
    g1 = jnp.asarray([2.0, 1.0, 3.0])
    g2 = jnp.asarray([1.0, 2.0, 1.5])
    e_log_pi = stick_breaking.expected_log_pi(g1, g2)
    assert e_log_pi.shape == (4,)
    # exact property: with deterministic sticks v (gamma1/(g1+g2) as means),
    # the weights from the same cumsum construction sum to 1.
    v = np.asarray(g1 / (g1 + g2))
    pis = []
    rem = 1.0
    for vt in v:
        pis.append(vt * rem)
        rem *= 1 - vt
    pis.append(rem)
    np.testing.assert_allclose(sum(pis), 1.0, rtol=1e-12)
    # E[log pi] must be component-wise <= 0-ish sanity: log of weights
    assert np.all(np.asarray(e_log_pi) < 0.0)


def test_expected_log_sticks_digamma(np_rng):
    g1 = jnp.asarray([1.5, 2.5])
    g2 = jnp.asarray([2.0, 1.0])
    elv, el1mv = stick_breaking.expected_log_sticks(g1, g2)
    np.testing.assert_allclose(
        np.asarray(elv),
        sps.digamma(np.asarray(g1)) - sps.digamma(np.asarray(g1 + g2)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(el1mv),
        sps.digamma(np.asarray(g2)) - sps.digamma(np.asarray(g1 + g2)),
        rtol=1e-10,
    )


def test_assignment_entropy():
    phi = jnp.asarray([[0.5, 0.5], [1.0, 0.0]])
    np.testing.assert_allclose(
        float(stick_breaking.assignment_entropy(phi)), np.log(2), rtol=1e-10
    )


def test_gamma_cavi_update_shapes_and_values():
    phi = jnp.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
    g1, g2 = stick_breaking.gamma_cavi_update(phi, alpha=1.5)
    np.testing.assert_allclose(np.asarray(g1), 1.0 + np.asarray([0.8, 1.0]))
    np.testing.assert_allclose(
        np.asarray(g2), 1.5 + np.asarray([1.0 + 0.2, 0.2])
    )


def test_phi_cavi_update_prefers_better_fit():
    f = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])  # (D=2, T=2)
    g1, g2 = jnp.asarray([1.0]), jnp.asarray([1.0])
    phi = stick_breaking.phi_cavi_update(f, g1, g2)
    assert float(phi[0, 0]) > 0.99
    assert float(phi[1, 1]) > 0.99
    np.testing.assert_allclose(np.asarray(phi.sum(axis=1)), 1.0, rtol=1e-12)


def test_dp_kl_terms_logits_matches_and_is_saturation_stable():
    """dp_kl_terms(logits=...) equals the xlogy form at moderate phi and
    keeps FINITE gradients when softmax saturates to exact zeros (O(N)
    logit gaps at big N), where the xlogy entropy's gradient is
    -inf * 0 = NaN through the softmax chain."""
    import jax

    g1 = jnp.asarray([1.3, 0.9])
    g2 = jnp.asarray([2.1, 1.7])
    moderate = jnp.asarray([[1.0, -0.5, 0.2], [0.3, 0.4, -1.0]])
    phi = jax.nn.softmax(moderate, axis=-1)
    np.testing.assert_allclose(
        float(stick_breaking.dp_kl_terms(phi, g1, g2, 1.0,
                                         logits=moderate)),
        float(stick_breaking.dp_kl_terms(phi, g1, g2, 1.0)),
        rtol=1e-10,
    )

    saturated = jnp.asarray([[1e5, 0.0, -1e5], [0.0, 2e5, -3e5]])

    def f(lg):
        p = jax.nn.softmax(lg, axis=-1)
        return stick_breaking.dp_kl_terms(p, g1, g2, 1.0, logits=lg)

    g = jax.grad(f)(saturated)
    assert bool(jnp.all(jnp.isfinite(g)))
    # and the xlogy form indeed NaNs there (the bug this guards)
    g_bad = jax.grad(
        lambda lg: stick_breaking.dp_kl_terms(
            jax.nn.softmax(lg, axis=-1), g1, g2, 1.0
        )
    )(saturated)
    assert not bool(jnp.all(jnp.isfinite(g_bad)))
