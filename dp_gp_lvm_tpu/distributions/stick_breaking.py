r"""Truncated stick-breaking Dirichlet process posterior.

Blei & Jordan (2006) truncation at T atoms: v_t ~ Beta(1, alpha) for
t = 1..T-1 and v_T := 1, with mixture weights

    pi_t = v_t prod_{s<t} (1 - v_s).

Variational posterior q(v_t) = Beta(gamma_t1, gamma_t2), t = 1..T-1, and a
categorical assignment posterior phi in R^{D x T} over output dimensions
(SURVEY.md section 2a 'Stick-breaking DP'). All expectations are digamma
closed forms; everything is vectorized over T (vmapped over atoms upstream).

ELBO pieces provided:
  - E_q[log pi_t]                          (expected_log_pi)
  - sum_d sum_t phi_dt E[log pi_t]         (expected_assignment_log_prior)
  - categorical entropy -sum phi log phi   (assignment_entropy)
  - KL[q(v) || p(v | alpha)]               (beta_kl, summed over sticks)
  - closed-form CAVI updates for gamma     (gamma_cavi_update)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln


def expected_log_sticks(gamma1, gamma2):
    """E[log v_t], E[log(1 - v_t)] for q(v_t)=Beta(gamma1, gamma2); (T-1,)."""
    tot = digamma(gamma1 + gamma2)
    return digamma(gamma1) - tot, digamma(gamma2) - tot


def expected_log_pi(gamma1, gamma2):
    """E[log pi_t] for t = 1..T, from T-1 Beta sticks (v_T := 1). (T,)."""
    e_log_v, e_log_1mv = expected_log_sticks(gamma1, gamma2)
    # cumulative sum of E[log(1-v_s)] for s < t
    csum = jnp.concatenate(
        [jnp.zeros((1,), e_log_1mv.dtype), jnp.cumsum(e_log_1mv)]
    )  # (T,)
    e_log_v_full = jnp.concatenate(
        [e_log_v, jnp.zeros((1,), e_log_v.dtype)]
    )  # (T,), log v_T = 0
    return e_log_v_full + csum


def beta_kl(gamma1, gamma2, alpha):
    """sum_t KL[Beta(gamma_t1, gamma_t2) || Beta(1, alpha)]."""
    a, b = gamma1, gamma2
    a0 = jnp.ones_like(a)
    b0 = jnp.full_like(b, alpha)
    kl = (
        gammaln(a + b)
        - gammaln(a)
        - gammaln(b)
        - gammaln(a0 + b0)
        + gammaln(a0)
        + gammaln(b0)
        + (a - a0) * digamma(a)
        + (b - b0) * digamma(b)
        - (a + b - a0 - b0) * digamma(a + b)
    )
    return jnp.sum(kl)


def assignment_entropy(phi):
    """-sum_{d,t} phi log phi with 0 log 0 := 0."""
    return -jnp.sum(jax.scipy.special.xlogy(phi, phi))


def expected_assignment_log_prior(phi, gamma1, gamma2):
    """sum_d E_q[log p(z_d | v)] = sum_{d,t} phi_dt E[log pi_t]."""
    return jnp.sum(phi @ expected_log_pi(gamma1, gamma2))


def dp_kl_terms(phi, gamma1, gamma2, alpha, logits=None):
    """Total DP contribution to the ELBO (to be *added*):

    E_q[log p(z|v)] + H[q(z)] - KL[q(v)||p(v)].

    Pass the unnormalized assignment `logits` when phi = softmax(logits)
    and the entropy must stay differentiable at saturation: per-dim free
    energies are O(N), so at big N the logit gaps saturate softmax to
    exact zeros, where xlogy's value is fine but its gradient is
    -inf * (softmax jacobian 0) = NaN — one saturated dim then NaNs the
    whole gradient and apply_if_finite freezes every hyper. The
    log_softmax form is exact and finite everywhere."""
    if logits is not None:
        lsm = jax.nn.log_softmax(logits, axis=-1)
        entropy = -jnp.sum(phi * lsm)
    else:
        entropy = assignment_entropy(phi)
    return (
        expected_assignment_log_prior(phi, gamma1, gamma2)
        + entropy
        - beta_kl(gamma1, gamma2, alpha)
    )


def alpha_log_prior(alpha, a0: float = 1.0, b0: float = 1.0):
    """log Gamma(alpha | a0, b0) up to constants — prior for a learnable
    DP concentration (the paper places a Gamma prior on alpha)."""
    return (a0 - 1.0) * jnp.log(alpha) - b0 * alpha


def alpha_cavi_update(gamma1, gamma2, a0: float = 1.0, b0: float = 1.0):
    """Variational-mean update for alpha with a Gamma(a0, b0) prior.

    Blei & Jordan (2006): q(alpha) = Gamma(w1, w2) with w1 = a0 + (T - 1)
    (one pseudo-count per stick; gamma1.shape[0] == T - 1) and
    w2 = b0 - sum_t E[log(1 - v_t)]; the update returns the mean w1 / w2.
    """
    _, e_log_1mv = expected_log_sticks(gamma1, gamma2)
    t_minus_1 = gamma1.shape[0]
    return (a0 + t_minus_1) / (b0 - jnp.sum(e_log_1mv))


def gamma_cavi_update(phi, alpha):
    """Closed-form coordinate-ascent update for the stick posteriors.

    gamma_t1 = 1 + sum_d phi_dt
    gamma_t2 = alpha + sum_d sum_{s>t} phi_ds,   t = 1..T-1.
    """
    counts = jnp.sum(phi, axis=0)  # (T,)
    # tail[t] = sum_{s > t} counts_s for t = 0..T-2
    rev_csum = jnp.cumsum(counts[::-1])[::-1]  # rev_csum[t] = sum_{s>=t}
    tail = rev_csum[1:]  # (T-1,)
    gamma1 = 1.0 + counts[:-1]
    gamma2 = alpha + tail
    return gamma1, gamma2


def phi_cavi_update(per_dim_bound, gamma1, gamma2):
    """Closed-form assignment update: phi_dt ∝ exp(F_dt + E[log pi_t]).

    per_dim_bound: (D, T) matrix of per-dimension per-atom free energies.
    """
    logits = per_dim_bound + expected_log_pi(gamma1, gamma2)[None, :]
    return jax.nn.softmax(logits, axis=-1)
