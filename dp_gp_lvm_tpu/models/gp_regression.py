r"""Exact GP regression with ARD-RBF kernel.

The base model of the family (SURVEY.md section 2a 'GP regression') and the
oracle for bound-property tests: the sparse variational free energy is a
lower bound on this model's log marginal likelihood, with equality when
Z = X (and M = N).

    log p(Y | X, theta) = sum_d [ -1/2 y_d^T K_y^{-1} y_d
                                  - 1/2 log|K_y| - N/2 log 2 pi ],
    K_y = K_ff + sigma^2 I.

Params (unconstrained pytree): raw_variance (), raw_ard (Q,), raw_noise ().
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax as _lax

_HIGHEST = _lax.Precision.HIGHEST

from dp_gp_lvm_tpu.core.transforms import (
    positive,
    positive_inverse,
    positive_noise,
)
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.linalg import logdet_from_chol, safe_cholesky, tri_solve


def init_params(q: int, dtype=jnp.float64):
    one = jnp.asarray(1.0, dtype)
    return {
        "raw_variance": positive_inverse(one),
        "raw_ard": positive_inverse(jnp.ones((q,), dtype)),
        "raw_noise": positive_inverse(jnp.asarray(0.1, dtype)),
    }


def constrain(params):
    return {
        "variance": positive(params["raw_variance"]),
        "ard": positive(params["raw_ard"]),
        "noise": positive_noise(params["raw_noise"]),
    }


def log_marginal(params, X, Y, policy: JitterPolicy = JitterPolicy()):
    """Exact log marginal likelihood, summed over output dims."""
    hyp = constrain(params)
    n = X.shape[0]
    kff = ard_rbf.gram(hyp["variance"], hyp["ard"], X)
    ky = kff + hyp["noise"] * jnp.eye(n, dtype=X.dtype)
    L, _ = safe_cholesky(ky, policy)
    alpha = tri_solve(L, Y)                          # L^{-1} Y
    quad = -0.5 * jnp.sum(alpha * alpha)
    d = Y.shape[1]
    logdet = -0.5 * d * logdet_from_chol(L)
    const = -0.5 * d * n * jnp.log(2.0 * jnp.pi).astype(X.dtype)
    return quad + logdet + const


def loss(params, X, Y):
    return -log_marginal(params, X, Y)


def predict(params, X, Y, X_star, policy: JitterPolicy = JitterPolicy()):
    """Predictive mean (N*, D) and marginal variance (N*,) (+noise)."""
    hyp = constrain(params)
    n = X.shape[0]
    kff = ard_rbf.gram(hyp["variance"], hyp["ard"], X)
    ky = kff + hyp["noise"] * jnp.eye(n, dtype=X.dtype)
    L, _ = safe_cholesky(ky, policy)
    ks = ard_rbf.gram(hyp["variance"], hyp["ard"], X_star, X)  # (N*, N)
    a = tri_solve(L, ks.T)                                     # (N, N*)
    mean = jnp.dot(a.T, tri_solve(L, Y), precision=_HIGHEST)
    var = (
        ard_rbf.gram_diag(hyp["variance"], hyp["ard"], X_star)
        - jnp.sum(a * a, axis=0)
        + hyp["noise"]
    )
    return mean, var
