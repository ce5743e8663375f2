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


# Floors keep f32 training on TPU away from the blow-up chain
# noise -> 0  =>  beta -> inf  =>  bound/gradients overflow  =>  NaN params.
# (Observed on config 1: Adam pushed raw_noise far negative; the f64 CPU
# path tolerates it, f32 does not.) Values are far below any statistically
# meaningful scale for standardized data.
MIN_NOISE = 1e-6
MIN_VARIATIONAL_VAR = 1e-8


def positive(raw, floor: float = 0.0):
    """softplus(raw) + floor: unconstrained -> (floor, inf)."""
    # jnp.logaddexp(x, 0) is softplus with the large-x branch handled.
    out = jnp.logaddexp(raw, jnp.zeros_like(raw))
    return out + floor if floor else out


def positive_noise(raw):
    """Noise-variance transform with the f32 stability floor."""
    return positive(raw, MIN_NOISE)


def positive_variational_var(raw):
    """q(X) variance transform with the f32 stability floor."""
    return positive(raw, MIN_VARIATIONAL_VAR)


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
