r"""ARD-linear kernel and its psi statistics (capability extension).

    k(x, x') = sigma_f^2 sum_q alpha_q x_q x'_q

Unlike the RBF case, every expectation under q(X) = prod N(mu, diag(s))
is already a polynomial moment, so all three psi statistics are exact
matmuls — the MXU-ideal kernel:

    psi0       = sigma_f^2 sum_{n,q} alpha_q (mu_nq^2 + s_nq)
    Psi1[n,m]  = sigma_f^2 sum_q alpha_q mu_nq z_mq
    Psi2[m,m'] = sigma_f^4 z_m^T A ( sum_n (mu_n mu_n^T + diag(s_n)) ) A z_m'
                 with A = diag(alpha).

The reference implements only ARD-RBF (SURVEY.md section 2a); the linear
kernel is a strict superset capability (same Kernel interface, selectable
via model config `kernel="linear"`).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def gram(variance, ard, X1, X2=None):
    ard = jnp.asarray(ard)
    X2 = X1 if X2 is None else X2
    return variance * jnp.dot(X1 * ard[None, :], X2.T, precision=HIGHEST)


def gram_diag(variance, ard, X):
    return variance * jnp.sum(jnp.asarray(ard)[None, :] * X * X, axis=-1)


def psi0(variance, ard, mu, s, weights=None):
    per_row = jnp.sum(jnp.asarray(ard)[None, :] * (mu * mu + s), axis=-1)
    if weights is not None:
        per_row = per_row * weights
    return variance * jnp.sum(per_row)


def psi1(variance, ard, mu, s, Z, weights=None):
    out = variance * jnp.dot(
        mu * jnp.asarray(ard)[None, :], Z.T, precision=HIGHEST
    )
    if weights is not None:
        out = out * weights[:, None]
    return out


def psi2(variance, ard, mu, s, Z, weights=None, block_n=None):
    """Psi2 (M, M); block_n accepted for interface parity (unused — the
    second moment contracts to a (Q, Q) matrix first, no N-sized
    intermediate exists)."""
    ard = jnp.asarray(ard)
    mu_w = mu if weights is None else mu * jnp.sqrt(weights)[:, None]
    s_w = s if weights is None else s * weights[:, None]
    second = jnp.dot(mu_w.T, mu_w, precision=HIGHEST) + jnp.diag(
        jnp.sum(s_w, axis=0)
    )  # (Q, Q)
    za = Z * ard[None, :]  # (M, Q)
    return (variance * variance) * jnp.dot(
        jnp.dot(za, second, precision=HIGHEST), za.T, precision=HIGHEST
    )


def psi_stats(variance, ard, mu, s, Z, weights=None, block_n=None):
    return (
        psi0(variance, ard, mu, s, weights),
        psi1(variance, ard, mu, s, Z, weights),
        psi2(variance, ard, mu, s, Z, weights, block_n),
    )


def observed_psi(variance, ard, X, Z):
    knm = gram(variance, ard, X, Z)
    p0 = jnp.sum(gram_diag(variance, ard, X))
    return p0, knm, jnp.dot(knm.T, knm, precision=HIGHEST)
