r"""The collapsed sparse-variational free energy, from sufficient statistics.

This is the shared inner kernel of every model family (SURVEY.md section
3.4): SGPR, Bayesian GP-LVM, each MRD view, and each DP-GP-LVM atom all
evaluate the Titsias (2009) collapsed bound

    F_d = -N/2 log(2 pi sigma^2) - 1/2 log|B|
          - 1/(2 sigma^2) y_d^T y_d + 1/2 c_d^T c_d
          - 1/(2 sigma^2) Psi0 + 1/2 tr(A)

with
    L   = chol(K_uu + jitter I)
    A   = (1/sigma^2) L^{-1} Psi2 L^{-T}
    B   = I + A,  LB = chol(B)
    c_d = (1/sigma^2) LB^{-1} L^{-1} (Psi1^T y_d).

Key structural point (drives both the DP model and the parallel path): the
data enter only through the sufficient statistics

    S = (Psi0, Psi1^T Y  in R^{M x D}, Psi2 in R^{M x M},
         yty_d = y_d^T y_d in R^D, N),

which are all *sums over n* — so they shard over the data axis and psum
exactly (parallel/sharded_elbo.py), and the per-dimension split
(shared + quad_d) is what the DP model phi-weights per (d, t).

Everything is pure jnp on (batched) arrays; vmapping over DP atoms batches
the Cholesky factorizations and triangular solves onto the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.linalg import (
    logdet_from_chol,
    safe_cholesky,
    safe_cholesky_spec,
    tri_solve,
)


class SuffStats(NamedTuple):
    """Sufficient statistics of the collapsed bound (all sums over n)."""

    psi0: jnp.ndarray     # scalar
    psi1T_y: jnp.ndarray  # (M, D)
    psi2: jnp.ndarray     # (M, M)
    yty: jnp.ndarray      # (D,)
    n: jnp.ndarray        # scalar (weighted row count; supports padding)


def suff_stats_from_psi(psi0, psi1, psi2, Y, weights=None):
    """Assemble SuffStats from explicit psi statistics and data Y (N, D)."""
    Yw = Y if weights is None else Y * weights[:, None]
    n = (
        jnp.asarray(Y.shape[0], Y.dtype)
        if weights is None
        else jnp.sum(weights)
    )
    return SuffStats(
        psi0=psi0,
        # psi1 already carries row weights if any; full-f32 MXU pass (the
        # TPU default would demote this contraction to bf16)
        psi1T_y=jnp.dot(psi1.T, Y, precision=lax.Precision.HIGHEST),
        psi2=psi2,
        yty=jnp.sum(Y * Yw, axis=0),
        n=n,
    )


class BoundTerms(NamedTuple):
    """Per-dimension free energies plus diagnostics for ELBO decomposition."""

    per_dim: jnp.ndarray   # (D,) F_d
    shared: jnp.ndarray    # scalar: terms identical across dims
    quad: jnp.ndarray      # (D,) data-dependent terms
    logdet_b: jnp.ndarray  # scalar
    trace_a: jnp.ndarray   # scalar
    jitter: jnp.ndarray    # jitter used for chol(K_uu)


def collapsed_bound(
    kuu,
    stats: SuffStats,
    noise_var,
    policy: JitterPolicy = JitterPolicy(),
) -> BoundTerms:
    """Per-output-dimension collapsed bound F_d (..., D), numerically
    stable.

    kuu: (..., M, M); noise_var: scalar or (...,). BATCH-POLYMORPHIC
    (round 5): pass the whole atom stack directly — leading batch dims
    broadcast through every op and the safe Cholesky runs its
    speculate-then-repair fast path with a SCALAR fallback predicate
    (linalg.safe_cholesky_spec). Prefer this over vmapping over atoms:
    the vmapped jitter-search while_loop measures 4.28 ms vs 0.76 ms
    for the identical math in isolation on the bench row; in the full
    step XLA overlap shrinks the difference to ~0.3-0.5 ms, and the
    batched form matches the no-search fast_chol step time while
    keeping the self-repair fallback. stats.yty (D,) and stats.n
    (scalar) are shared across the batch.
    """
    dtype = kuu.dtype
    m = kuu.shape[-1]
    noise_var = jnp.asarray(noise_var, dtype)
    beta = 1.0 / noise_var                          # (...,)
    beta_mm = beta[..., None, None]

    L, jit_used = safe_cholesky_spec(kuu, policy)
    # A = beta * L^{-1} Psi2 L^{-T}
    half = tri_solve(L, stats.psi2)                 # L^{-1} Psi2
    A = beta_mm * tri_solve(L, jnp.swapaxes(half, -1, -2))
    B = jnp.eye(m, dtype=dtype) + 0.5 * (A + jnp.swapaxes(A, -1, -2))
    LB, _ = safe_cholesky_spec(B, policy)
    logdet_b = logdet_from_chol(LB)                 # (...,)
    trace_a = jnp.trace(A, axis1=-2, axis2=-1)      # (...,)

    # C = beta * LB^{-1} L^{-1} (Psi1^T Y)  : (..., M, D); column d is c_d
    tmp = tri_solve(L, stats.psi1T_y)
    C = beta_mm * tri_solve(LB, tmp)
    quad = (
        -0.5 * beta[..., None] * stats.yty
        + 0.5 * jnp.sum(C * C, axis=-2)
    )                                               # (..., D)

    log2pi = jnp.asarray(jnp.log(2.0 * jnp.pi), dtype)
    shared = (
        -0.5 * stats.n * (log2pi + jnp.log(noise_var))
        - 0.5 * logdet_b
        - 0.5 * beta * stats.psi0
        + 0.5 * trace_a
    )                                               # (...,)
    per_dim = shared[..., None] + quad
    return BoundTerms(
        per_dim=per_dim,
        shared=shared,
        quad=quad,
        logdet_b=logdet_b,
        trace_a=trace_a,
        jitter=jit_used,
    )


def optimal_qu(kuu, stats: SuffStats, noise_var, policy=JitterPolicy()):
    """Optimal collapsed q(u_d) = N(m_d, S_u) for prediction.

    Returns (w, Sigma_B_chol_pair) where w = K_uu^{-1} m_d = beta *
    (K_uu + beta Psi2)^{-1} Psi1^T y_d  (..., M, D), and the pieces
    needed for predictive variances: L = chol(K_uu), LB = chol(I + A).
    Batch-polymorphic like `collapsed_bound` — pass the whole atom
    stack rather than vmapping (the vmapped jitter search dominates the
    runtime; see collapsed_bound's docstring).
    """
    noise_var = jnp.asarray(noise_var, kuu.dtype)
    beta = 1.0 / noise_var
    beta_mm = beta[..., None, None]
    m = kuu.shape[-1]
    L, _ = safe_cholesky_spec(kuu, policy)
    half = tri_solve(L, stats.psi2)
    A = beta_mm * tri_solve(L, jnp.swapaxes(half, -1, -2))
    B = jnp.eye(m, dtype=kuu.dtype) + 0.5 * (A + jnp.swapaxes(A, -1, -2))
    LB, _ = safe_cholesky_spec(B, policy)
    # w = beta L^{-T} B^{-1} L^{-1} Psi1^T Y
    tmp = tri_solve(L, stats.psi1T_y)
    tmp = tri_solve(LB, tmp)
    tmp = tri_solve(LB, tmp, trans=True)
    w = beta_mm * tri_solve(L, tmp, trans=True)   # (..., M, D)
    return w, L, LB
