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

Kernel inventory:
  - `psi2_pallas` / `psi1_pallas`: single-kernel (one atom) forwards.
  - `psi2_batched_pallas`: DP path — grid (T, N/block), atoms on the
    grid (vmapping the single-atom kernel would lift the whole atom
    batch into VMEM at once).
  - `_psi2_bwd_batched_kernel` / `psi2_bwd_batched_pallas`: fully fused
    analytic backward (derivation in kernels/ard_rbf_vjp.py) — grid over
    N-blocks, atoms looped in-kernel, every (B, M, M) tile VMEM-resident.
  - `psi2_batched_fused`: custom_vjp pairing the batched forward with the
    fused backward. ~2.0x faster than XLA at N=8192/M=128/T=20 with
    honest in-kernel f32 (89.8 vs 177.4 ms — round-2 re-sweep, see
    SCALING.md and results/roofline.json, the single source of truth for
    these numbers); selected by `resolve_pallas` at M >= 96 AND tile
    volume above ~5e8 (XLA's single-shot fusions win at M <= 64).

Mosaic constraints encountered (also in CLAUDE.md): no scalar or
1-element stores to VMEM, no multi-axis reductions straight to rank-1,
dynamically-indexed reads inside fori_loop must keep a leading length-1
dim via pl.ds. Block sizes come from the round-2 sweep under the raised
64 MB VMEM scope (`_COMPILER_PARAMS`; v5e has 128 MB physical): B=256 at
M <= 64, B=128 at M = 128 (`_fwd_block`/`_bwd_block`/`_vmem_block_cap`).

Dot precision inside Mosaic (round-2 PALLAS_TPU gate finding): Mosaic
supports only Precision.DEFAULT and Precision.HIGHEST — HIGH fails to
lower, and DEFAULT is a SINGLE bf16 MXU pass even for f32 operands, so
the TPU bf16 trap applies INSIDE Pallas kernels too (~5e-3 scaled error
vs f64 through the exponent, vs ~7e-5 for any honest f32 path). Every
dot/dot_general in this file therefore pins precision=HIGHEST; measured
dense rates on this chip are 21.3 TF/s (HIGHEST) vs 47.7 (DEFAULT), and
HIGHEST also beats a manual 3-pass bf16 split (~16 TF/s), so it is the
fastest CORRECT option, not just the safest.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dp_gp_lvm_tpu.kernels import ard_rbf

# full-f32 MXU passes (precision=HIGHEST, required: default bf16
# demotion costs ~1e-2 scaled error vs f64 — PALLAS_TPU gate) need
# more scoped VMEM than the 16MB compiler default at the swept block
# sizes; v5e has 128MB physical VMEM per core.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


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
    t = jnp.dot(b * mu, zt, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)   # (B, M)
    p = jnp.dot(b, (z * z).T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # (B, M)

    # n-independent -1/4 alpha-weighted Z pair distance
    zs = z * jnp.sqrt(alpha)[None, :]
    zn = jnp.sum(zs * zs, axis=1)
    zd2 = zn[:, None] - 2.0 * jnp.dot(
        zs, zs.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    ) + zn[None, :]
    log_e = -0.25 * jnp.maximum(zd2, 0.0)                  # (M, M)

    # c[n, m, l] = sum_q b_nq z_mq z_lq  — batched MXU contraction
    zb = z[None, :, :] * b[:, None, :]                     # (B, M, Q)
    c = jax.lax.dot_general(
        zb, z,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
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
        compiler_params=_COMPILER_PARAMS,
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
    cross = jnp.dot(a * mu, z.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    zsq = jnp.dot(a, (z * z).T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
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
        compiler_params=_COMPILER_PARAMS,
    )(
        jnp.reshape(variance.astype(dtype), (1, 1)),
        jnp.reshape(ard.astype(dtype), (1, q)),
        mu,
        s,
        weights[:, None],
        Z,
    )
    return out[:n]


def _psi2_batched_kernel(var_ref, ard_ref, mu_ref, s_ref, w_ref, z_ref,
                         out_ref):
    """Grid (T, N/B): atom t on axis 0, data block i on axis 1.

    Identical math to _psi2_kernel but with the DP truncation atoms as an
    explicit grid dimension — vmapping the single-atom kernel would lift
    the whole atom batch into VMEM at once (T x block tile > 16 MB),
    which is exactly the wrong layout; here VMEM holds one atom's block.
    """
    a_idx = pl.program_id(0)
    i = pl.program_id(1)
    alpha = ard_ref[0, 0, :]                               # (Q,)
    mu = mu_ref[:]
    s = s_ref[:]
    w = w_ref[:]
    z = z_ref[0]                                           # (M, Q)

    denom = 2.0 * alpha[None, :] * s + 1.0
    b = alpha[None, :] / denom
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=1)
    sterm = jnp.sum(b * mu * mu, axis=1)
    t = jnp.dot(b * mu, z.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    p = jnp.dot(b, (z * z).T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)

    zs = z * jnp.sqrt(alpha)[None, :]
    zn = jnp.sum(zs * zs, axis=1)
    zd2 = zn[:, None] - 2.0 * jnp.dot(
        zs, zs.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    ) + zn[None, :]
    log_e = -0.25 * jnp.maximum(zd2, 0.0)

    zb = z[None, :, :] * b[:, None, :]
    c = jax.lax.dot_general(
        zb, z, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    half = t - 0.25 * p
    expo = (
        log_e[None, :, :]
        + (log_norm - sterm)[:, None, None]
        + half[:, :, None]
        + half[:, None, :]
        - 0.5 * c
    )
    contrib = jnp.sum(
        jnp.exp(jnp.minimum(expo, 0.0)) * w[:, :, None], axis=0
    )

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    var = var_ref[a_idx, 0]
    out_ref[0] += (var * var) * contrib


def psi2_batched_pallas(
    variances,   # (T,)
    ards,        # (T, Q)
    mu,          # (N, Q) shared
    s,           # (N, Q) shared
    Zs,          # (T, M, Q)
    weights=None,
    block_n: int = 256,
    interpret: bool = False,
):
    """Per-atom Psi2 stack (T, M, M) in one kernel, grid (T, N/block)."""
    t, m, q = Zs.shape
    n = mu.shape[0]
    dtype = mu.dtype
    if weights is None:
        weights = jnp.ones((n,), dtype)
    pad = (-n) % block_n
    if pad:
        mu = jnp.concatenate([mu, jnp.zeros((pad, q), dtype)], axis=0)
        s = jnp.concatenate([s, jnp.ones((pad, q), dtype)], axis=0)
        weights = jnp.concatenate([weights, jnp.zeros((pad,), dtype)], axis=0)
    n_pad = mu.shape[0]
    grid = (t, n_pad // block_n)

    return pl.pallas_call(
        _psi2_batched_kernel,
        grid=grid,
        in_specs=[
            # full (T, 1) scalar table in SMEM, indexed by program_id(0)
            pl.BlockSpec((t, 1), lambda a, i: (0, 0),
                         memory_space=pltpu.SMEM),
            # (T, 1, Q): block (1, 1, Q) keeps the last-two-dims tiling
            # rule satisfied (1 == array dim, Q == array dim)
            pl.BlockSpec((1, 1, q), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, q), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, m), lambda a, i: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, m, m), dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        variances.astype(dtype)[:, None],
        ards.astype(dtype)[:, None, :],
        mu,
        s,
        weights[:, None],
        Zs,
    )


def _psi2_bwd_batched_kernel(
    var_ref, ard_ref, mu_ref, s_ref, w_ref, zs_ref, g_ref,
    gvar_ref, gard_ref, gz_ref, v_ref, gmu_ref, gs_ref, gw_ref,
):
    """Fused analytic Psi2 backward (see kernels/ard_rbf_vjp.py for the
    derivation): grid over N-blocks only; the T atoms loop *inside* the
    kernel so every (B, M, M) tile lives and dies in VMEM/registers. HBM
    traffic is just the inputs plus gmu/gs blocks and tiny per-atom
    accumulators — this is what the XLA backward cannot do (its batched-
    matmul W tiles materialize in HBM).

    Outputs: gvar (T,1), gard (T,Q), gz-partial (T,M,Q), V (T,M,M)
    [all accumulated across grid steps], gmu/gs/gw (B,·) per block
    (gw_n = sum_t var_t^2 <exp(expo_t,n), G_t> — the row-weight
    cotangent, so masked/weighted training keeps the fused path).
    The n-independent E0 pulls are finished outside from V.
    """
    i = pl.program_id(0)
    mu = mu_ref[:]                                       # (B, Q)
    s = s_ref[:]                                         # (B, Q)
    w = w_ref[:]                                         # (B, 1)
    t_total = zs_ref.shape[0]
    b_sz, q = mu.shape
    m = zs_ref.shape[1]

    @pl.when(i == 0)
    def _():
        gvar_ref[:] = jnp.zeros_like(gvar_ref)
        gard_ref[:] = jnp.zeros_like(gard_ref)
        gz_ref[:] = jnp.zeros_like(gz_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    gmu_acc = jnp.zeros((b_sz, q), mu.dtype)
    gs_acc = jnp.zeros((b_sz, q), mu.dtype)
    gw_acc = jnp.zeros((b_sz, 1), mu.dtype)

    def atom_body(t, carry):
        gmu_acc, gs_acc, gw_acc = carry
        # dynamic reads keep a leading length-1 dim (pl.ds) — Mosaic's
        # layout inference crashes on dynamically-indexed rank-reducing
        # reads inside fori_loop bodies
        var = var_ref[t, 0]  # scalar SMEM read (dynamic index OK)
        alpha = ard_ref[pl.ds(t, 1), :][0]               # (Q,)
        z = zs_ref[pl.ds(t, 1)][0]                       # (M, Q)
        g = g_ref[pl.ds(t, 1)][0]                        # (M, M)

        u = 2.0 * alpha[None, :] * s + 1.0
        b = alpha[None, :] / u
        log_norm = -0.5 * jnp.sum(jnp.log(u), axis=1)
        sterm = jnp.sum(b * mu * mu, axis=1)
        t_mat = jnp.dot(b * mu, z.T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
        p_mat = jnp.dot(b, (z * z).T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
        zs_sc = z * jnp.sqrt(alpha)[None, :]
        zn = jnp.sum(zs_sc * zs_sc, axis=1)
        zd2 = zn[:, None] - 2.0 * jnp.dot(
            zs_sc, zs_sc.T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST
        ) + zn[None, :]
        log_e = -0.25 * jnp.maximum(zd2, 0.0)
        zb = z[None, :, :] * b[:, None, :]
        c = jax.lax.dot_general(
            zb, z, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST,
        )
        half = t_mat - 0.25 * p_mat
        expo = (
            log_e[None, :, :]
            + (log_norm - sterm)[:, None, None]
            + half[:, :, None]
            + half[:, None, :]
            - 0.5 * c
        )
        e_raw = jnp.exp(jnp.minimum(expo, 0.0))          # (B, M, M)
        e = e_raw * w[:, :, None]
        # per-m partial row (rank-2 store; Mosaic crashes on scalar
        # stores/reshape-to-(1,1) of full reductions) — finished outside
        # single-axis reduces only — Mosaic's layout inference crashes
        # on multi-axis reductions straight to rank-1
        gv_m = jnp.sum(jnp.sum(e * g[None, :, :], axis=0), axis=0)  # (M,)
        # row-weight pullback: Psi2 is linear in w, dPsi2/dw_n = var^2 e_raw
        gw_t = (var * var) * jnp.sum(
            jnp.sum(e_raw * g[None, :, :], axis=2), axis=1
        )                                                # (B,)
        wmat = (var * var) * e * (expo < 0.0).astype(mu.dtype) * g[None]
        # every W contraction below only ever uses W through W + W^T
        # (u_quad contracts with the symmetric z_mq z_lq kernel; bz_c
        # needs wz + wtz) — so symmetrize once and do ONE batched
        # (B,M,M)x(M,Q) matmul instead of two (halves the dominant bwd
        # MXU cost; measured in experiments/roofline.py).
        ws = wmat + jnp.transpose(wmat, (0, 2, 1))       # (B, M, M)
        a_vec = jnp.sum(jnp.sum(wmat, axis=2), axis=1)   # (B,)
        rsum = jnp.sum(ws, axis=2)                       # (B, M)
        wsz = jax.lax.dot_general(
            ws, z, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST,
        )                                                # (B, M, Q)
        u_quad = 0.5 * jnp.sum(wsz * z[None, :, :], axis=1)  # (B, Q)
        rz = jnp.dot(rsum, z, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
        rz2 = jnp.dot(rsum, z * z, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
        v_blk = jnp.sum(wmat, axis=0)                    # (M, M)

        gb = (-mu * mu * a_vec[:, None] + mu * rz - 0.25 * rz2
              - 0.5 * u_quad)
        gmu_t = b * (-2.0 * mu * a_vec[:, None] + rz)
        gs_t = gb * (-2.0 * b * b) - a_vec[:, None] * b
        gard_blk = jnp.sum(gb / (u * u), axis=0) - jnp.sum(
            a_vec[:, None] * s / u, axis=0
        )
        bz_t = jax.lax.dot_general(
            rsum, b * mu, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST,
        )                                                # (M, Q)
        bz_p = jax.lax.dot_general(
            rsum, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST,
        )                                                # (M, Q)
        bz_c = jnp.sum(wsz * b[:, None, :], axis=0)      # (M, Q)
        gz_blk = bz_t - 0.5 * z * bz_p - 0.5 * bz_c

        # (1, ...) shaped stores — Mosaic rejects scalar stores to VMEM
        gvar_ref[pl.ds(t, 1), :] += gv_m[None, :]
        gard_ref[pl.ds(t, 1), :] += gard_blk[None, :]
        gz_ref[pl.ds(t, 1)] += gz_blk[None]
        v_ref[pl.ds(t, 1)] += v_blk[None]
        return gmu_acc + gmu_t, gs_acc + gs_t, gw_acc + gw_t[:, None]

    gmu_acc, gs_acc, gw_acc = jax.lax.fori_loop(
        0, t_total, atom_body, (gmu_acc, gs_acc, gw_acc)
    )
    gmu_ref[:] = gmu_acc
    gs_ref[:] = gs_acc
    gw_ref[:] = gw_acc


def psi2_bwd_batched_pallas(
    variances, ards, mu, s, Zs, G, weights=None, block_n: int = 64,
    interpret: bool = False,
):
    """Fused backward. Returns (gvar (T,), gard (T,Q), gmu (N,Q),
    gs (N,Q), gz (T,M,Q), gw (N,)) — E0 pulls finished here from the V
    output; gw is the row-weight cotangent (zeros-free, exact)."""
    t, m, q = Zs.shape
    n = mu.shape[0]
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
    out_shapes = (
        jax.ShapeDtypeStruct((t, m), dtype),      # gvar per-m partials
        jax.ShapeDtypeStruct((t, q), dtype),      # gard (no E0 yet)
        jax.ShapeDtypeStruct((t, m, q), dtype),   # gz (no E0 yet)
        jax.ShapeDtypeStruct((t, m, m), dtype),   # V
        jax.ShapeDtypeStruct((n_pad, q), dtype),  # gmu
        jax.ShapeDtypeStruct((n_pad, q), dtype),  # gs
        jax.ShapeDtypeStruct((n_pad, 1), dtype),  # gw
    )
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    gvar, gard, gz, V, gmu, gs, gw = pl.pallas_call(
        _psi2_bwd_batched_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 1), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((t, q), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, m, q), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, m, m), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, m), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, q), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, m, q), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, m, m), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        variances.astype(dtype)[:, None],
        ards.astype(dtype),
        mu,
        s,
        weights[:, None],
        Zs,
        G,
    )
    # E0 pulls (n-independent, via V): same algebra as ard_rbf_vjp._bwd
    HIGHEST = jax.lax.Precision.HIGHEST

    def finish(ard_t, z_t, v_t, gard_t, gz_t):
        v1 = jnp.sum(v_t, axis=1)
        v2 = jnp.sum(v_t, axis=0)
        vz = jnp.dot(v_t, z_t, precision=HIGHEST)
        vtz = jnp.dot(v_t.T, z_t, precision=HIGHEST)
        diag_zvz = jnp.sum(z_t * vz, axis=0)
        gard_f = gard_t - 0.25 * (
            jnp.dot(v1 + v2, z_t * z_t, precision=HIGHEST) - 2.0 * diag_zvz
        )
        gz_f = gz_t - 0.5 * ard_t[None, :] * (
            z_t * (v1 + v2)[:, None] - (vz + vtz)
        )
        return gard_f, gz_f

    gard, gz = jax.vmap(finish)(ards, Zs, V, gard, gz)
    gvar_final = 2.0 * variances * jnp.sum(gvar, axis=1)
    return gvar_final, gard, gmu[:n], gs[:n], gz, gw[:n, 0]


def _vmem_block_cap(m: int) -> int:
    """Largest power-of-two row block whose ~5 live (B, M, M) f32 tiles
    fit in ~48 MB of the 64 MB VMEM limit (_COMPILER_PARAMS), capped at
    256. Matches the v5e sweep at the limit: 256 @ M<=64, 128 @ M=128
    (256 there is a Mosaic compile failure), 32 @ M=256."""
    cap = 8
    while cap < 256 and (2 * cap) * m * m * 4 * 5 <= 48 * 1024 * 1024:
        cap *= 2
    return cap


def _bwd_block(m: int, n: int) -> int:
    """Backward block. Re-swept on v5e at the 64 MB VMEM limit: B=256
    edges out 128 at M<=64 (29.5 vs 29.9 ms, N=8192); B=128 now fits
    AND wins at M=128 (55.4 vs 58.8 ms with the old 16 MB-limit B=32)."""
    return min(_vmem_block_cap(m), max(8, n))


def _fwd_block(m: int, n: int) -> int:
    """Forward (suffstats) block. Re-swept at the 64 MB VMEM limit:
    256 at M<=64 (15.8 ms vs 16.1 @128, N=8192); 128 at M=128 (27.4 vs
    32.2 @32, the old 16 MB-limit choice). The fwd kernel's live-tile
    count behaves like the bwd's in practice (B=256 @ M=128 also fails
    to compile), so both share _vmem_block_cap."""
    return min(_vmem_block_cap(m), max(8, n))


def _suffstats_batched_kernel(var_ref, ard_ref, mu_ref, s_ref, w_ref,
                              z_ref, y_ref, psi2_ref, p1y_ref):
    """Grid (T, N/B): per-atom Psi2 AND Psi1^T Y in one pass.

    The Psi1 (T, N, M) tensor never exists: each block computes its
    psi1 tile in registers/VMEM and immediately contracts it with the
    Y block on the MXU into the (M, D) accumulator.
    """
    a_idx = pl.program_id(0)
    i = pl.program_id(1)
    alpha = ard_ref[0, 0, :]
    mu = mu_ref[:]
    s = s_ref[:]
    w = w_ref[:]
    z = z_ref[0]
    y = y_ref[:]                                           # (B, D)
    var = var_ref[a_idx, 0]

    # ---- psi2 block (same math as _psi2_batched_kernel) ----
    denom = 2.0 * alpha[None, :] * s + 1.0
    b = alpha[None, :] / denom
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=1)
    sterm = jnp.sum(b * mu * mu, axis=1)
    t = jnp.dot(b * mu, z.T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
    p = jnp.dot(b, (z * z).T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
    zs = z * jnp.sqrt(alpha)[None, :]
    zn = jnp.sum(zs * zs, axis=1)
    zd2 = zn[:, None] - 2.0 * jnp.dot(
        zs, zs.T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST
    ) + zn[None, :]
    log_e = -0.25 * jnp.maximum(zd2, 0.0)
    zb = z[None, :, :] * b[:, None, :]
    c = jax.lax.dot_general(
        zb, z, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST,
    )
    half = t - 0.25 * p
    expo = (
        log_e[None, :, :]
        + (log_norm - sterm)[:, None, None]
        + half[:, :, None]
        + half[:, None, :]
        - 0.5 * c
    )
    contrib = jnp.sum(
        jnp.exp(jnp.minimum(expo, 0.0)) * w[:, :, None], axis=0
    )

    # ---- psi1 block, contracted immediately: P1Y += psi1^T y ----
    u1 = alpha[None, :] * s + 1.0
    a1 = alpha[None, :] / u1
    log_norm1 = -0.5 * jnp.sum(jnp.log(u1), axis=1)
    row1 = jnp.sum(a1 * mu * mu, axis=1)
    cross1 = jnp.dot(a1 * mu, z.T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
    zsq1 = jnp.dot(a1, (z * z).T, preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST)
    e1 = jnp.minimum(
        log_norm1[:, None] - 0.5 * (row1[:, None] - 2.0 * cross1 + zsq1),
        0.0,
    )
    psi1_blk = var * jnp.exp(e1) * w                       # (B, M)
    p1y_blk = jax.lax.dot_general(
        psi1_blk, y, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=mu.dtype, precision=jax.lax.Precision.HIGHEST,
    )                                                      # (M, D)

    @pl.when(i == 0)
    def _():
        psi2_ref[:] = jnp.zeros_like(psi2_ref)
        p1y_ref[:] = jnp.zeros_like(p1y_ref)

    psi2_ref[0] += (var * var) * contrib
    p1y_ref[0] += p1y_blk


def suffstats_batched_pallas(
    variances, ards, mu, s, Zs, Y, weights=None, block_n: int = 64,
    interpret: bool = False,
):
    """Fused per-atom (Psi2 (T,M,M), Psi1^T Y (T,M,D)) in one kernel."""
    t, m, q = Zs.shape
    n, d = Y.shape
    dtype = mu.dtype
    if weights is None:
        weights = jnp.ones((n,), dtype)
    pad = (-n) % block_n
    if pad:
        mu = jnp.concatenate([mu, jnp.zeros((pad, q), dtype)], axis=0)
        s = jnp.concatenate([s, jnp.ones((pad, q), dtype)], axis=0)
        weights = jnp.concatenate([weights, jnp.zeros((pad,), dtype)], axis=0)
        Y = jnp.concatenate([Y, jnp.zeros((pad, d), dtype)], axis=0)
    n_pad = mu.shape[0]
    grid = (t, n_pad // block_n)
    return pl.pallas_call(
        _suffstats_batched_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 1), lambda a, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, q), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, q), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, q), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda a, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m, m), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda a, i: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, m, m), dtype),
            jax.ShapeDtypeStruct((t, m, d), dtype),
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(
        variances.astype(dtype)[:, None],
        ards.astype(dtype)[:, None, :],
        mu,
        s,
        weights[:, None],
        Zs,
        Y,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def suffstats_batched_fused(variances, ards, mu, s, Zs, Y, weights=None,
                            block_n=64, interpret=False):
    """(Psi2 (T,M,M), Psi1^T Y (T,M,D)) with fused forward and a mixed
    backward: fused Pallas kernel for the Psi2 pullback + analytic
    pure-JAX Psi1 pullback (cheap; (N, M)-sized). Row `weights` are fully
    differentiable — the masked/weighted training regime keeps this fast
    path (VERDICT r1 item 3)."""
    return suffstats_batched_pallas(variances, ards, mu, s, Zs, Y,
                                    weights=weights, block_n=block_n,
                                    interpret=interpret)


def _ssb_fwd(variances, ards, mu, s, Zs, Y, weights, block_n, interpret):
    out = suffstats_batched_pallas(variances, ards, mu, s, Zs, Y,
                                   weights=weights, block_n=block_n,
                                   interpret=interpret)
    return out, (variances, ards, mu, s, Zs, Y, weights)


def _ssb_bwd(block_n, interpret, res, cts):
    from dp_gp_lvm_tpu.kernels import ard_rbf_vjp

    variances, ards, mu, s, Zs, Y, weights = res
    G2, G1Y = cts
    gvar2, gard2, gmu2, gs2, gz2, gw2 = psi2_bwd_batched_pallas(
        variances, ards, mu, s, Zs, G2, weights=weights,
        block_n=_bwd_block(Zs.shape[1], mu.shape[0]),
        interpret=interpret,
    )

    def one_atom(v, a, z, g1y):
        # P1Y = (w . psi1)^T Y  =>  dL/dpsi1 = w (Y G1Y^T);
        # dL/dY = w (psi1 G1Y);  dL/dw_n = <psi1_n, (Y G1Y^T)_n>.
        yg = jnp.dot(Y, g1y.T, precision=jax.lax.Precision.HIGHEST)
        g_psi1 = yg if weights is None else yg * weights[:, None]
        gv, ga, gm, gs_, gz = ard_rbf_vjp._psi1_bwd((v, a, mu, s, z), g_psi1)
        psi1 = ard_rbf_vjp.psi1_analytic(v, a, mu, s, z)
        gy = jnp.dot(psi1, g1y, precision=jax.lax.Precision.HIGHEST)
        if weights is not None:
            gy = gy * weights[:, None]
        gw1 = jnp.sum(psi1 * yg, axis=1)
        return gv, ga, gm, gs_, gz, gy, gw1

    gv1, ga1, gm1, gs1, gz1, gy, gw1 = jax.vmap(one_atom)(
        variances, ards, Zs, G1Y
    )
    gw = None if weights is None else gw2 + jnp.sum(gw1, axis=0)
    return (
        gvar2 + gv1,
        gard2 + ga1,
        gmu2 + jnp.sum(gm1, axis=0),
        gs2 + jnp.sum(gs1, axis=0),
        gz2 + gz1,
        jnp.sum(gy, axis=0),
        gw,
    )


suffstats_batched_fused.defvjp(_ssb_fwd, _ssb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def psi2_batched_fused(variances, ards, mu, s, Zs, weights=None,
                       block_n=256, interpret=False):
    """(T, M, M) per-atom Psi2: batched Pallas forward (one kernel, grid
    (T, N/block)), fused Pallas backward. The DP-GP-LVM hot path. Row
    `weights` are fully differentiable."""
    return psi2_batched_pallas(variances, ards, mu, s, Zs, weights=weights,
                               block_n=block_n, interpret=interpret)


def _psi2b_fwd(variances, ards, mu, s, Zs, weights, block_n, interpret):
    out = psi2_batched_pallas(variances, ards, mu, s, Zs, weights=weights,
                              block_n=block_n, interpret=interpret)
    return out, (variances, ards, mu, s, Zs, weights)


def _psi2b_bwd(block_n, interpret, res, G):
    variances, ards, mu, s, Zs, weights = res
    gvar, gard, gmu, gs, gz, gw = psi2_bwd_batched_pallas(
        variances, ards, mu, s, Zs, G, weights=weights,
        block_n=_bwd_block(Zs.shape[1], mu.shape[0]),
        interpret=interpret,
    )
    return gvar, gard, gmu, gs, gz, (None if weights is None else gw)


psi2_batched_fused.defvjp(_psi2b_fwd, _psi2b_bwd)


# ---------------------------------------------------------------------------
# Differentiable wrappers: Pallas forward, hand-derived analytic backward
# (kernels/ard_rbf_vjp.py; exactness asserted in tests/test_psi2_vjp.py)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def psi2_fused(variance, ard, mu, s, Z, weights=None, block_n=32,
               interpret=False):
    """Single-kernel Psi2: Pallas forward, analytic recompute backward
    (kernels/ard_rbf_vjp.py). Row `weights` fully differentiable."""
    return psi2_pallas(variance, ard, mu, s, Z, weights=weights,
                       block_n=block_n, interpret=interpret)


def _psi2_fwd(variance, ard, mu, s, Z, weights, block_n, interpret):
    out = psi2_pallas(variance, ard, mu, s, Z, weights=weights,
                      block_n=block_n, interpret=interpret)
    return out, (variance, ard, mu, s, Z, weights)


def _psi2_bwd(block_n, interpret, res, g):
    from dp_gp_lvm_tpu.kernels import ard_rbf_vjp

    variance, ard, mu, s, Z, weights = res
    gvar, gard, gmu, gs, gz, gw = ard_rbf_vjp._bwd(
        block_n, (variance, ard, mu, s, Z, weights), g
    )
    return gvar, gard, gmu, gs, gz, gw


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
