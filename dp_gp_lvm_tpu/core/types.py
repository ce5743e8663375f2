"""Numerics policy: dtypes, jitter, stability constants.

The reference (TF1, see SURVEY.md L1 'Utils / config') pins float64 and a
module-level jitter constant. Here the policy is explicit and dtype-
polymorphic: every function computes in the dtype of its inputs, so the same
code runs f64 on CPU (parity path) and f32 on TPU (fast path). The jitter
policy is scale-aware (relative to the mean diagonal) and escalates on
Cholesky failure (see linalg/chol.py) instead of being a single constant.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# Base relative jitter added to K_uu before Cholesky. The reference uses an
# absolute constant (~1e-6..1e-8 in f64); a relative jitter is more robust
# across dtypes and kernel-variance scales.
DEFAULT_JITTER = 1e-6

# Floor on variational variances / noise variances after the positive
# transform, preventing log(0) in KL terms.
MIN_POSITIVE = 1e-12


@dataclasses.dataclass(frozen=True)
class JitterPolicy:
    """Scale-aware escalating jitter for Cholesky factorizations.

    ``initial`` is relative to the mean diagonal of the matrix; on failure
    (NaNs in the factor) the jitter is multiplied by ``growth`` up to
    ``max_tries`` attempts. This is the numerical 'sanitizer' of this model
    family: a non-PSD K_uu + beta*Psi2 is caught and repaired early.

    ``initial_f32`` replaces ``initial`` when factoring float32 matrices:
    when an atom's ARD weights legitimately collapse (unused dimensions —
    expected DP behavior), K_uu approaches rank deficiency and a 1e-6
    relative jitter leaves chol(K_uu)^-1 amplifying f32 noise into the
    A = beta L^-1 Psi2 L^-T terms — the dominant f32 training blow-up.
    The reference never faced this (f64 everywhere).
    """

    initial: float = DEFAULT_JITTER
    growth: float = 10.0
    max_tries: int = 6
    initial_f32: float = 1e-4

    def initial_for(self, dtype) -> float:
        if jnp.dtype(dtype) == jnp.dtype(jnp.float64):
            return self.initial
        return max(self.initial, self.initial_f32)


def finfo_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)


def default_real_dtype() -> jnp.dtype:
    """f64 when x64 is enabled (CPU parity), else f32 (TPU fast path)."""
    return jnp.asarray(1.0).dtype
