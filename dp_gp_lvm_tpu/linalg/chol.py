"""Safe Cholesky with scale-aware escalating jitter, plus solve helpers.

Everything here is jit-safe (no Python control flow on traced values) and
vmap-safe (used batched over DP truncation atoms, where XLA lowers the
batched Cholesky/solves onto the MXU). JAX's `cholesky` returns NaNs rather
than raising on a non-PSD input, which lets failure detection live inside
the compiled program as a `lax.while_loop` escalating the jitter — the
GP-model equivalent of a runtime sanitizer (SURVEY.md section 5).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dp_gp_lvm_tpu.core.types import JitterPolicy


def _chol_ok(L):
    return jnp.all(jnp.isfinite(L))


def _find_jitter(A_nograd, scale, policy: JitterPolicy):
    """Smallest escalated relative jitter giving a finite Cholesky factor.

    Runs entirely on stop_gradient'd values: `lax.while_loop` has no
    transpose rule, so the search must not carry differentiated inputs.
    The *final* (differentiable) factorization happens in the caller.
    """
    m = A_nograd.shape[-1]
    eye = jnp.eye(m, dtype=A_nograd.dtype)

    def attempt(rel_jitter):
        return jnp.linalg.cholesky(A_nograd + rel_jitter * scale * eye)

    init_jitter = jnp.asarray(
        policy.initial_for(A_nograd.dtype), A_nograd.dtype
    )

    def cond(state):
        jitter, tries = state
        return jnp.logical_and(
            ~_chol_ok(attempt(jitter)), tries < policy.max_tries
        )

    def body(state):
        jitter, tries = state
        return jitter * jnp.asarray(policy.growth, A_nograd.dtype), tries + 1

    jitter, _ = lax.while_loop(cond, body, (init_jitter, jnp.asarray(0)))
    return jitter


def safe_cholesky(A, policy: JitterPolicy = JitterPolicy()):
    """Cholesky of A + jitter*scale*I with escalating jitter.

    Returns (L, jitter_used). `jitter_used` is the *relative* jitter that
    produced a finite factor (or the final attempted value); callers can log
    it as a conditioning diagnostic. Fully reverse-mode differentiable: the
    jitter search runs on a stop_gradient branch, then one differentiable
    Cholesky is taken at the selected jitter.
    """
    A = jnp.asarray(A)
    m = A.shape[-1]
    eye = jnp.eye(m, dtype=A.dtype)
    # Scale-aware: jitter proportional to the mean diagonal magnitude.
    scale = jnp.mean(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1)
    scale = jnp.maximum(scale, jnp.asarray(1.0, A.dtype))[..., None, None]
    scale = lax.stop_gradient(scale)

    if policy.max_tries == 0:
        # static fast path: no search factorization at all — the hot
        # training step uses this (failures are rare at the f32 jitter
        # floor and a non-finite step is skipped by apply_if_finite)
        jitter = jnp.asarray(policy.initial_for(A.dtype), A.dtype)
    else:
        jitter = _find_jitter(lax.stop_gradient(A), scale, policy)
    L = jnp.linalg.cholesky(A + jitter * scale * eye)
    return L, jitter


def safe_cholesky_spec(A, policy: JitterPolicy = JitterPolicy()):
    """Speculate-then-repair safe Cholesky for FULL-BATCH call sites.

    Factors ONCE at the initial jitter and falls back to the escalating
    `_find_jitter` search only when that factor is non-finite. The
    fallback predicate reduces over the WHOLE input — batch dims
    included — so on a batched call (e.g. the (T, M, M) atom stack) it
    is a SCALAR and `lax.cond` is a real branch: the common path costs
    exactly one Cholesky. `safe_cholesky`'s unconditional
    `lax.while_loop` search evaluates an extra factorization in its
    cond AND blocks XLA from scheduling around the loop: the bench-row
    bound algebra IN ISOLATION measured 4.28 ms with it vs 0.76 ms
    without (honest chunked-scan protocol, 2026-08-21). In the full
    training step XLA overlaps the search chains with the psi work, so
    the measured END-TO-END effect is smaller — the step lands at
    4.25 ms, matching the no-search fast_chol bound within noise while
    keeping the self-repair fallback (isolated component timings do
    not compose under XLA scheduling; trust marginal A/Bs).

    Do NOT call this under vmap: the per-example predicate lowers the
    cond to a select and BOTH branches execute every step — keep using
    `safe_cholesky` there, or restructure the call site to pass the
    full batch (models/bound.py is batch-polymorphic for exactly this
    reason). Fallback semantics on a batched call: ONE shared jitter
    level that makes every batch member finite, vs per-example jitters
    under the vmapped search — more jitter than strictly needed for
    healthy batch members in the (rare) repair branch, identical
    everywhere else. Same (L, jitter) contract; jitter has shape
    A.shape[:-2].
    """
    A = jnp.asarray(A)
    m = A.shape[-1]
    eye = jnp.eye(m, dtype=A.dtype)
    scale = jnp.mean(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1)
    scale = jnp.maximum(scale, jnp.asarray(1.0, A.dtype))[..., None, None]
    scale = lax.stop_gradient(scale)
    init = jnp.asarray(policy.initial_for(A.dtype), A.dtype)

    if policy.max_tries == 0:
        L = jnp.linalg.cholesky(A + init * scale * eye)
        return L, jnp.broadcast_to(init, A.shape[:-2])

    L0 = jnp.linalg.cholesky(A + init * scale * eye)
    ok = _chol_ok(L0)

    def _good(_):
        return L0, jnp.broadcast_to(init, A.shape[:-2])

    def _repair(_):
        jitter = _find_jitter(lax.stop_gradient(A), scale, policy)
        L = jnp.linalg.cholesky(A + jitter * scale * eye)
        return L, jnp.broadcast_to(jitter, A.shape[:-2])

    return lax.cond(ok, _good, _repair, None)


def tri_solve(L, B, lower: bool = True, trans: bool = False):
    """Solve op(L) X = B for triangular L. Batched over leading dims."""
    return lax.linalg.triangular_solve(
        L, B, left_side=True, lower=lower, transpose_a=trans
    )


def cho_solve(L, B):
    """Solve (L L^T) X = B given lower Cholesky factor L."""
    return tri_solve(L, tri_solve(L, B, lower=True), lower=True, trans=True)


def logdet_from_chol(L):
    """log|A| = 2 * sum(log diag L) for A = L L^T."""
    return 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )


def solve_psd(A, B, policy: JitterPolicy = JitterPolicy()):
    """PSD solve A X = B via safe Cholesky."""
    L, _ = safe_cholesky(A, policy)
    return cho_solve(L, B)


def add_jitter(A, rel_jitter: float):
    m = A.shape[-1]
    scale = jnp.mean(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1)
    scale = jnp.maximum(scale, jnp.asarray(1.0, A.dtype))[..., None, None]
    return A + rel_jitter * scale * jnp.eye(m, dtype=A.dtype)
