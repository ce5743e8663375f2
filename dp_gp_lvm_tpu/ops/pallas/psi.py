r"""Fused Pallas (Mosaic) kernels for the psi statistics.

Psi2 is the hot op of the whole family — O(N M^2 Q) FLOPs per kernel per
atom per step (SURVEY.md call stack 3.1) — and its naive lowering
materializes an (N, M, M) intermediate. The fused kernel tiles N into
blocks, keeps the (M, M) accumulator and the per-block (B, M, M)
exponent tile entirely in VMEM, and feeds the three matmul stages
((b*mu) Z^T, b (Z*Z)^T, and the batched Z diag(b_n) Z^T contraction) to
the MXU, writing only the final (M, M) result to HBM.

The math matches kernels/ard_rbf.py::psi2 exactly (same expansion of the
Titsias & Lawrence 2010 closed form); equivalence is asserted in
tests/test_pallas.py via interpret mode on CPU and on real TPU when
available.

`psi2_fused` wraps the kernel in a custom_vjp whose backward pass
differentiates the pure-JAX reference implementation (rematerialized) —
forward fused now, hand-written backward kernel is a later optimization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dp_gp_lvm_tpu.kernels import ard_rbf


def _psi2_kernel(var_ref, ard_ref, mu_ref, s_ref, w_ref, z_ref, out_ref):
    """One grid step: accumulate a block of rows into the (M, M) output."""
    i = pl.program_id(0)
    alpha = ard_ref[0, :]                                  # (Q,)
    mu = mu_ref[:]                                         # (B, Q)
    s = s_ref[:]                                           # (B, Q)
    w = w_ref[:]                                           # (B, 1)
    z = z_ref[:]                                           # (M, Q)

    denom = 2.0 * alpha[None, :] * s + 1.0                 # (B, Q)
    b = alpha[None, :] / denom
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=1)      # (B,)
    sterm = jnp.sum(b * mu * mu, axis=1)                   # (B,)
    zt = z.T                                               # (Q, M)
    t = jnp.dot(b * mu, zt, preferred_element_type=jnp.float32)   # (B, M)
    p = jnp.dot(b, (z * z).T, preferred_element_type=jnp.float32)  # (B, M)

    # n-independent -1/4 alpha-weighted Z pair distance
    zs = z * jnp.sqrt(alpha)[None, :]
    zn = jnp.sum(zs * zs, axis=1)
    zd2 = zn[:, None] - 2.0 * jnp.dot(
        zs, zs.T, preferred_element_type=jnp.float32
    ) + zn[None, :]
    log_e = -0.25 * jnp.maximum(zd2, 0.0)                  # (M, M)

    # c[n, m, l] = sum_q b_nq z_mq z_lq  — batched MXU contraction
    zb = z[None, :, :] * b[:, None, :]                     # (B, M, Q)
    c = jax.lax.dot_general(
        zb, z,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (B, M, M)

    half = t - 0.25 * p                                    # (B, M)
    expo = (
        log_e[None, :, :]
        + (log_norm - sterm)[:, None, None]
        + half[:, :, None]
        + half[:, None, :]
        - 0.5 * c
    )
    # exponent <= 0 exactly (each factor <= 1); clamp is a no-op that
    # stops f32 cancellation error from overflowing exp()
    contrib = jnp.sum(
        jnp.exp(jnp.minimum(expo, 0.0)) * w[:, :, None], axis=0
    )                                                      # (M, M)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    var = var_ref[0, 0]
    out_ref[:] += (var * var) * contrib


def psi2_pallas(
    variance,
    ard,
    mu,
    s,
    Z,
    weights=None,
    block_n: int = 32,
    interpret: bool = False,
):
    """Fused Psi2 (M, M). Pads N up to a multiple of block_n with
    zero-weight rows; all compute stays in VMEM per block."""
    n, q = mu.shape
    m = Z.shape[0]
    dtype = mu.dtype
    if weights is None:
        weights = jnp.ones((n,), dtype)
    pad = (-n) % block_n
    if pad:
        mu = jnp.concatenate([mu, jnp.zeros((pad, q), dtype)], axis=0)
        s = jnp.concatenate([s, jnp.ones((pad, q), dtype)], axis=0)
        weights = jnp.concatenate([weights, jnp.zeros((pad,), dtype)], axis=0)
    n_pad = mu.shape[0]
    grid = (n_pad // block_n,)

    out = pl.pallas_call(
        _psi2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, m), dtype),
        interpret=interpret,
    )(
        jnp.reshape(variance.astype(dtype), (1, 1)),
        jnp.reshape(ard.astype(dtype), (1, q)),
        mu,
        s,
        weights[:, None],
        Z,
    )
    return out


def _psi1_kernel(var_ref, ard_ref, mu_ref, s_ref, w_ref, z_ref, out_ref):
    """Psi1 block: (B, M) tile, fully fused (matmuls + exp)."""
    alpha = ard_ref[0, :]
    mu = mu_ref[:]
    s = s_ref[:]
    z = z_ref[:]
    denom = alpha[None, :] * s + 1.0
    a = alpha[None, :] / denom
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=1)      # (B,)
    row = jnp.sum(a * mu * mu, axis=1)
    cross = jnp.dot(a * mu, z.T, preferred_element_type=jnp.float32)
    zsq = jnp.dot(a, (z * z).T, preferred_element_type=jnp.float32)
    quad = row[:, None] - 2.0 * cross + zsq
    var = var_ref[0, 0]
    expo = jnp.minimum(log_norm[:, None] - 0.5 * quad, 0.0)  # <= 0 exactly
    out_ref[:] = var * jnp.exp(expo) * w_ref[:]


def psi1_pallas(
    variance, ard, mu, s, Z, weights=None, block_n: int = 128,
    interpret: bool = False,
):
    """Fused Psi1 (N, M)."""
    n, q = mu.shape
    m = Z.shape[0]
    dtype = mu.dtype
    if weights is None:
        weights = jnp.ones((n,), dtype)
    pad = (-n) % block_n
    if pad:
        mu = jnp.concatenate([mu, jnp.zeros((pad, q), dtype)], axis=0)
        s = jnp.concatenate([s, jnp.ones((pad, q), dtype)], axis=0)
        weights = jnp.concatenate([weights, jnp.zeros((pad,), dtype)], axis=0)
    n_pad = mu.shape[0]
    grid = (n_pad // block_n,)
    out = pl.pallas_call(
        _psi1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m), dtype),
        interpret=interpret,
    )(
        jnp.reshape(variance.astype(dtype), (1, 1)),
        jnp.reshape(ard.astype(dtype), (1, q)),
        mu,
        s,
        weights[:, None],
        Z,
    )
    return out[:n]


# ---------------------------------------------------------------------------
# Differentiable wrappers: Pallas forward, hand-derived analytic backward
# (kernels/ard_rbf_vjp.py; exactness asserted in tests/test_psi2_vjp.py)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def psi2_fused(variance, ard, mu, s, Z, block_n=32, interpret=False):
    return psi2_pallas(variance, ard, mu, s, Z, block_n=block_n,
                       interpret=interpret)


def _psi2_fwd(variance, ard, mu, s, Z, block_n, interpret):
    out = psi2_pallas(variance, ard, mu, s, Z, block_n=block_n,
                      interpret=interpret)
    return out, (variance, ard, mu, s, Z)


def _psi2_bwd(block_n, interpret, res, g):
    from dp_gp_lvm_tpu.kernels import ard_rbf_vjp

    variance, ard, mu, s, Z = res
    gvar, gard, gmu, gs, gz, _ = ard_rbf_vjp._bwd(
        block_n, (variance, ard, mu, s, Z, None), g
    )
    return gvar, gard, gmu, gs, gz


psi2_fused.defvjp(_psi2_fwd, _psi2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def psi1_fused(variance, ard, mu, s, Z, block_n=128, interpret=False):
    return psi1_pallas(variance, ard, mu, s, Z, block_n=block_n,
                       interpret=interpret)


def _psi1_fwd(variance, ard, mu, s, Z, block_n, interpret):
    out = psi1_pallas(variance, ard, mu, s, Z, block_n=block_n,
                      interpret=interpret)
    return out, (variance, ard, mu, s, Z)


def _psi1_bwd(block_n, interpret, res, g):
    from dp_gp_lvm_tpu.kernels import ard_rbf_vjp

    variance, ard, mu, s, Z = res
    return ard_rbf_vjp._psi1_bwd((variance, ard, mu, s, Z), g)


psi1_fused.defvjp(_psi1_fwd, _psi1_bwd)
