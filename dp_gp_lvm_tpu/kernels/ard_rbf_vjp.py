r"""Hand-derived VJP for the ARD-RBF Psi2 statistic.

Autodiff of the blockwise Psi2 stores the (B, M, M) exponential tile of
every block as a residual (HBM traffic ~ N*M^2 floats each way). This
custom VJP instead *recomputes* each block's tile once in the backward
pass and contracts it immediately with the cotangent G — the backward
becomes a second scan with only (M, M)/(N, Q)-sized state, all heavy ops
batched matmuls.

Derivation (same notation as kernels/ard_rbf.py): with
    u_nq = 2 a_q s_nq + 1,  b_nq = a_q / u_nq,
    L_n = -1/2 sum_q log u_nq,      S_n = sum_q b_nq mu_nq^2,
    t_nm = sum_q b_nq mu_nq z_mq,   p_nm = sum_q b_nq z_mq^2,
    h = t - p/4,                     c_nml = sum_q b_nq z_mq z_lq,
    E0_ml = -1/4 sum_q a_q (z_mq - z_lq)^2,
    expo = E0 + (L - S) + h_m + h_l - c/2    (clamped at 0),
    Psi2 = var^2 sum_n w_n exp(expo),
define W_nml = var^2 w_n exp(expo) 1[expo < 0] G_ml and the reductions
    A_n = sum_ml W,   R_nm = [(W_n + W_n^T) 1]_m,   V_ml = sum_n W_nml,
    U_nq = sum_ml W_nml z_mq z_lq.
Then
    d var  = (2 / var) sum G . Psi2-contrib   (through exp itself)
    d b_nq = -mu^2 A_n + mu (R Z)_nq - 1/4 (R Z^2)_nq - 1/2 U_nq
    d mu   = b (-2 mu A_n + (R Z)_nq)
    d s    = d b * (-2 b^2) - A_n b
    d a_q  = sum_n d b_nq / u_nq^2 - sum_n A_n s_nq / u_nq
             - 1/4 [ (V1 + V2) . Z^2 - 2 diag(Z^T V Z) ]_q
    d z_mq = b-weighted t/p/c pulls + E0 pull (see code).

Verified against jax.grad of the reference implementation to f64
precision in tests/test_psi2_vjp.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def _forward_pieces(variance, ard, mu, s, Z, log_e):
    """Shared forward quantities for a block of rows."""
    u = 2.0 * ard[None, :] * s + 1.0
    b = ard[None, :] / u
    log_norm = -0.5 * jnp.sum(jnp.log(u), axis=-1)
    sterm = jnp.sum(b * mu * mu, axis=-1)
    t = jnp.dot(b * mu, Z.T, precision=HIGHEST)
    p = jnp.dot(b, (Z * Z).T, precision=HIGHEST)
    Zb = Z[None, :, :] * b[:, None, :]
    c = jnp.einsum("bmq,lq->bml", Zb, Z, precision=HIGHEST)
    h = t - 0.25 * p
    expo = (
        log_e[None, :, :]
        + (log_norm - sterm)[:, None, None]
        + h[:, :, None]
        + h[:, None, :]
        - 0.5 * c
    )
    return u, b, expo


def _log_e(ard, Z):
    Zs = Z * jnp.sqrt(ard)[None, :]
    zn = jnp.sum(Zs * Zs, axis=-1)
    zd2 = jnp.maximum(
        zn[:, None] - 2.0 * jnp.dot(Zs, Zs.T, precision=HIGHEST)
        + zn[None, :],
        0.0,
    )
    return -0.25 * zd2


def _block_bwd(variance, ard, mu, s, Z, w, log_e, G):
    """Gradient contributions of one block of rows.

    Returns (gvar, gard, gmu, gs, gz_partial, V_partial) where gz_partial
    excludes the E0 term (n-independent, added once by the caller via V).
    """
    u, b, expo = _forward_pieces(variance, ard, mu, s, Z, log_e)
    mask = (expo < 0.0).astype(mu.dtype)
    E = jnp.exp(jnp.minimum(expo, 0.0)) * w[:, None, None]
    # gvar goes through exp itself (no clamp mask)
    gvar_blk = 2.0 * variance * jnp.sum(E * G[None, :, :])

    W = (variance * variance) * E * mask * G[None, :, :]     # (B, M, M)
    A = jnp.sum(W, axis=(1, 2))                              # (B,)
    # W only enters the Q-contractions through W + W^T (U contracts with
    # the symmetric z_mq z_lq kernel; the c-pull needs WZ + WTZ), so
    # symmetrize once: ONE (B,M,M)x(M,Q) einsum instead of two.
    WS = W + jnp.swapaxes(W, 1, 2)                           # (B, M, M)
    Wsym_rows = jnp.sum(WS, axis=2)                          # R (B, M)
    WSZ = jnp.einsum("bml,lq->bmq", WS, Z, precision=HIGHEST)  # (B, M, Q)
    U = 0.5 * jnp.einsum("bmq,mq->bq", WSZ, Z, precision=HIGHEST)  # (B, Q)
    RZ = jnp.dot(Wsym_rows, Z, precision=HIGHEST)            # (B, Q)
    RZ2 = jnp.dot(Wsym_rows, Z * Z, precision=HIGHEST)       # (B, Q)
    V = jnp.sum(W, axis=0)                                   # (M, M)

    gb = -mu * mu * A[:, None] + mu * RZ - 0.25 * RZ2 - 0.5 * U
    gmu = b * (-2.0 * mu * A[:, None] + RZ)
    gs = gb * (-2.0 * b * b) - A[:, None] * b
    gard_blk = jnp.sum(gb / (u * u), axis=0) - jnp.sum(
        A[:, None] * s / u, axis=0
    )
    # z pulls that need per-n b weighting:
    #   t:  sum_n b mu R_nm ; p: -1/2 z sum_n b R_nm ; c: -1/2 sum_n b (W+W^T)Z
    bz_t = jnp.einsum("bm,bq->mq", Wsym_rows, b * mu, precision=HIGHEST)
    bz_p = jnp.einsum("bm,bq->mq", Wsym_rows, b, precision=HIGHEST)
    bz_c = jnp.einsum("bmq,bq->mq", WSZ, b, precision=HIGHEST)
    gz_blk = bz_t - 0.5 * Z * bz_p - 0.5 * bz_c
    return gvar_blk, gard_blk, gmu, gs, gz_blk, V


def psi2_value(variance, ard, mu, s, Z, weights=None, block_n=None):
    from dp_gp_lvm_tpu.kernels import ard_rbf

    return ard_rbf.psi2(variance, ard, mu, s, Z, weights, block_n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def psi2_analytic(variance, ard, mu, s, Z, weights, block_n=None):
    """Psi2 with the hand-derived backward. weights may be None."""
    return psi2_value(variance, ard, mu, s, Z, weights, block_n)


def _fwd(variance, ard, mu, s, Z, weights, block_n):
    out = psi2_value(variance, ard, mu, s, Z, weights, block_n)
    return out, (variance, ard, mu, s, Z, weights)


def _bwd(block_n, res, G):
    variance, ard, mu, s, Z, weights = res
    n, q = mu.shape
    m = Z.shape[0]
    dtype = mu.dtype
    w = jnp.ones((n,), dtype) if weights is None else weights
    log_e = _log_e(ard, Z)
    blk = block_n or n
    pad = (-n) % blk
    mu_p, s_p, w_p = mu, s, w
    if pad:
        mu_p = jnp.concatenate([mu_p, jnp.zeros((pad, q), dtype)], axis=0)
        s_p = jnp.concatenate([s_p, jnp.ones((pad, q), dtype)], axis=0)
        w_p = jnp.concatenate([w_p, jnp.zeros((pad,), dtype)], axis=0)
    nb = mu_p.shape[0] // blk

    def step(carry, xs):
        gvar, gard, gz, V = carry
        mub, sb, wb = xs
        gv_b, ga_b, gmu_b, gs_b, gz_b, V_b = _block_bwd(
            variance, ard, mub, sb, Z, wb, log_e, G
        )
        return (
            (gvar + gv_b, gard + ga_b, gz + gz_b, V + V_b),
            (gmu_b, gs_b),
        )

    init = (
        jnp.zeros((), dtype),
        jnp.zeros((q,), dtype),
        jnp.zeros((m, q), dtype),
        jnp.zeros((m, m), dtype),
    )
    (gvar, gard, gz, V), (gmu_b, gs_b) = lax.scan(
        step,
        init,
        (
            mu_p.reshape(nb, blk, q),
            s_p.reshape(nb, blk, q),
            w_p.reshape(nb, blk),
        ),
    )
    gmu = gmu_b.reshape(nb * blk, q)[:n]
    gs = gs_b.reshape(nb * blk, q)[:n]

    # n-independent E0 pulls (through V = sum_n W):
    V1 = jnp.sum(V, axis=1)
    V2 = jnp.sum(V, axis=0)
    VZ = jnp.dot(V, Z, precision=HIGHEST)
    VTZ = jnp.dot(V.T, Z, precision=HIGHEST)
    # d a_q from E0: -1/4 [ (V1+V2) . Z^2 - 2 diag(Z^T V Z) ]
    diag_ZVZ = jnp.sum(Z * VZ, axis=0)
    gard = gard - 0.25 * (
        jnp.dot(V1 + V2, Z * Z, precision=HIGHEST) - 2.0 * diag_ZVZ
    )
    # d z from E0: -1/2 a_q [ z_mq (V1+V2)_m - ((V+V^T) Z)_mq ]
    gz = gz - 0.5 * ard[None, :] * (
        Z * (V1 + V2)[:, None] - (VZ + VTZ)
    )

    # weights gradient: dPsi2/dw_n = var^2 exp(expo_n..) contracted with G
    if weights is None:
        gw = None
    else:
        def wstep(_, xs):
            mub, sb = xs
            _, _, expo = _forward_pieces(variance, ard, mub, sb, Z, log_e)
            e = jnp.exp(jnp.minimum(expo, 0.0))
            return None, (variance * variance) * jnp.einsum(
                "bml,ml->b", e, G
            )

        _, gw_b = lax.scan(
            wstep, None,
            (mu_p.reshape(nb, blk, q), s_p.reshape(nb, blk, q)),
        )
        gw = gw_b.reshape(nb * blk)[:n]

    return gvar, gard, gmu, gs, gz, gw


psi2_analytic.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Psi1 analytic VJP (same derivation style; no blocking needed — the
# intermediate is only (N, M))
# ---------------------------------------------------------------------------


def _psi1_pieces(variance, ard, mu, s, Z):
    u = ard[None, :] * s + 1.0
    a = ard[None, :] / u
    log_norm = -0.5 * jnp.sum(jnp.log(u), axis=-1)
    row = jnp.sum(a * mu * mu, axis=-1)
    cross = jnp.dot(a * mu, Z.T, precision=HIGHEST)
    zsq = jnp.dot(a, (Z * Z).T, precision=HIGHEST)
    e = log_norm[:, None] - 0.5 * (row[:, None] - 2.0 * cross + zsq)
    return u, a, e


@jax.custom_vjp
def psi1_analytic(variance, ard, mu, s, Z):
    u, a, e = _psi1_pieces(variance, ard, mu, s, Z)
    return variance * jnp.exp(jnp.minimum(e, 0.0))


def _psi1_fwd(variance, ard, mu, s, Z):
    return psi1_analytic(variance, ard, mu, s, Z), (variance, ard, mu, s, Z)


def _psi1_bwd(res, G):
    variance, ard, mu, s, Z = res
    u, a, e = _psi1_pieces(variance, ard, mu, s, Z)
    ec = jnp.exp(jnp.minimum(e, 0.0))
    gvar = jnp.sum(G * ec)
    W = variance * ec * (e < 0.0).astype(mu.dtype) * G      # (N, M)
    A = jnp.sum(W, axis=1)                                  # (N,)
    WZ = jnp.dot(W, Z, precision=HIGHEST)                   # (N, Q)
    WZ2 = jnp.dot(W, Z * Z, precision=HIGHEST)              # (N, Q)
    ga = -0.5 * mu * mu * A[:, None] + mu * WZ - 0.5 * WZ2
    gmu = a * (-mu * A[:, None] + WZ)
    gs = ga * (-a * a) - 0.5 * A[:, None] * a
    gard = jnp.sum(ga / (u * u), axis=0) - 0.5 * jnp.sum(
        A[:, None] * s / u, axis=0
    )
    gz = jnp.dot(W.T, a * mu, precision=HIGHEST) - Z * jnp.dot(
        W.T, a, precision=HIGHEST
    )
    return gvar, gard, gmu, gs, gz


psi1_analytic.defvjp(_psi1_fwd, _psi1_bwd)


def psi1_weighted(variance, ard, mu, s, Z, weights=None):
    """Analytic-VJP Psi1; row weights applied outside the custom_vjp."""
    out = psi1_analytic(variance, ard, mu, s, Z)
    if weights is not None:
        out = out * weights[:, None]
    return out
