"""Bijective transforms between unconstrained and constrained parameters.

All model parameters live in a flat pytree of *unconstrained* arrays (so any
optax optimizer applies directly); positivity (kernel variances, ARD
weights, noise variances, q(X) variances, Beta naturals) is enforced by a
softplus bijector with a numerically exact inverse. The reference keeps TF
Variables in log/softplus space for the same reason (SURVEY.md section 2a,
'ARD-RBF kernel' row).
"""
from __future__ import annotations

import jax.numpy as jnp


def positive(raw):
    """softplus(raw): unconstrained -> (0, inf). Stable for large |raw|."""
    # jax.nn.softplus is log1p(exp(x)) with the large-x branch handled.
    return jnp.logaddexp(raw, jnp.zeros_like(raw))


def positive_inverse(value):
    """Inverse softplus: value -> raw with positive(raw) == value.

    inv_softplus(y) = y + log1p(-exp(-y)); exact and stable for y > 0.
    """
    value = jnp.asarray(value)
    return value + jnp.log(-jnp.expm1(-value))


def probability_simplex(logits, axis=-1):
    """Unconstrained logits -> simplex via softmax (assignment posteriors)."""
    logits = logits - jnp.max(logits, axis=axis, keepdims=True)
    e = jnp.exp(logits)
    return e / jnp.sum(e, axis=axis, keepdims=True)
