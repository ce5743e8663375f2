r"""ARD-RBF (squared-exponential) kernel and its psi statistics.

Math (Titsias & Lawrence 2010, "Bayesian Gaussian Process Latent Variable
Model", closed-form RBF kernel expectations under a diagonal Gaussian
q(X) = prod_n N(x_n | mu_n, diag(s_n)); SURVEY.md section 2a 'Psi
statistics'):

    k(x, x') = sigma_f^2 exp(-1/2 sum_q alpha_q (x_q - x'_q)^2)

    Psi0       = sum_n <k(x_n, x_n)>_q           = sum_n sigma_f^2
    Psi1[n,m]  = <k(x_n, z_m)>_q
               = sigma_f^2 prod_q (alpha_q s_nq + 1)^{-1/2}
                 exp(-1/2 alpha_q (mu_nq - z_mq)^2 / (alpha_q s_nq + 1))
    Psi2[m,m'] = sum_n <k(x_n, z_m) k(x_n, z_{m'})>_q
               = sigma_f^4 sum_n prod_q (2 alpha_q s_nq + 1)^{-1/2}
                 exp(-alpha_q (z_mq - z_{m'q})^2 / 4
                     - alpha_q (mu_nq - zbar_q)^2 / (2 alpha_q s_nq + 1)),
                 zbar = (z_m + z_{m'}) / 2.

TPU-first formulation: every quadratic form is expanded so the N-by-M and
N-by-M-by-M interactions become (batched) matmuls that XLA tiles onto the
MXU, instead of materializing (N, M, Q) broadcast differences on the VPU:

    sum_q a_nq (mu_nq - z_mq)^2
      = [sum_q a mu^2]_n - 2 [(a*mu) Z^T]_{nm} + [a (Z^2)^T]_{nm}

and the only genuinely 3-way term in Psi2, sum_q b_nq z_mq z_{m'q}, is an
N-batched (M,Q)x(Q,M) matmul. Psi2 additionally supports blockwise
accumulation over N (`block_n`) so the N-by-M-by-M intermediate never
exceeds block_n*M^2 — the same structure the fused Pallas kernel
(ops/pallas/psi2.py) and the data-parallel psum path (parallel/) exploit.

All functions follow input dtypes (f64 on the CPU parity path, f32 on TPU).
`weights` lets callers zero out padded rows (data-parallel padding).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# TPU matmul precision: JAX's default demotes f32 dots to bf16 on TPU,
# which destroys the exponentiated distance computations (K_uu goes
# non-PSD, psi stats lose the tail). Every distance-critical contraction
# pins full-f32 MXU passes.
HIGHEST = lax.Precision.HIGHEST


def gram(variance, ard, X1, X2=None):
    """Gram matrix k(X1, X2). X1: (N1,Q), X2: (N2,Q) or None for symmetric."""
    ard = jnp.asarray(ard)
    Xs1 = X1 * jnp.sqrt(ard)[None, :]
    Xs2 = Xs1 if X2 is None else X2 * jnp.sqrt(ard)[None, :]
    n1 = jnp.sum(Xs1 * Xs1, axis=-1)
    n2 = n1 if X2 is None else jnp.sum(Xs2 * Xs2, axis=-1)
    d2 = n1[:, None] - 2.0 * jnp.dot(Xs1, Xs2.T, precision=HIGHEST) + n2[None, :]
    d2 = jnp.maximum(d2, 0.0)
    return variance * jnp.exp(-0.5 * d2)


def gram_diag(variance, ard, X):
    """diag k(X, X) = sigma_f^2."""
    return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * variance


def psi0(variance, mu, weights=None):
    """Psi0 = sum_n w_n sigma_f^2."""
    n = mu.shape[0]
    if weights is None:
        return variance * jnp.asarray(n, dtype=mu.dtype)
    return variance * jnp.sum(weights)


def psi1(variance, ard, mu, s, Z, weights=None):
    """Psi1 (N, M): <k(x_n, z_m)> under q(X).

    mu, s: (N, Q) variational means / diagonal variances; Z: (M, Q).
    """
    ard = jnp.asarray(ard)
    denom = ard[None, :] * s + 1.0                     # (N, Q)
    a = ard[None, :] / denom                           # (N, Q)
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=-1)  # (N,)
    row = jnp.sum(a * mu * mu, axis=-1)                # (N,)
    cross = jnp.dot(a * mu, Z.T, precision=HIGHEST)                             # (N, M)  MXU
    zsq = jnp.dot(a, (Z * Z).T, precision=HIGHEST)                                # (N, M)  MXU
    quad = row[:, None] - 2.0 * cross + zsq            # (N, M)
    # each Psi1 factor is <= 1, so the exponent is <= 0 exactly; the clamp
    # is a mathematical no-op that stops f32 cancellation error from
    # reaching exp() as a large positive number (inf) when ARD weights grow
    expo = jnp.minimum(log_norm[:, None] - 0.5 * quad, 0.0)
    out = variance * jnp.exp(expo)
    if weights is not None:
        out = out * weights[:, None]
    return out


def _psi2_block(variance, ard, mu, s, Z, log_e, weights):
    """Psi2 contribution of a block of rows. mu, s: (B, Q); returns (M, M)."""
    denom = 2.0 * ard[None, :] * s + 1.0               # (B, Q)
    b = ard[None, :] / denom                           # (B, Q)
    log_norm = -0.5 * jnp.sum(jnp.log(denom), axis=-1)  # (B,)
    sterm = jnp.sum(b * mu * mu, axis=-1)              # (B,)
    t = jnp.dot(b * mu, Z.T, precision=HIGHEST)                                 # (B, M)  MXU
    p = jnp.dot(b, (Z * Z).T, precision=HIGHEST)                                  # (B, M)  MXU
    # c[n, m, m'] = sum_q b_nq z_mq z_m'q : N-batched matmul on the MXU.
    Zb = Z[None, :, :] * b[:, None, :]                 # (B, M, Q)
    c = jnp.einsum("bmq,lq->bml", Zb, Z, precision=HIGHEST)               # (B, M, M)
    expo = (
        log_e[None, :, :]
        + (log_norm - sterm)[:, None, None]
        + (t - 0.25 * p)[:, :, None]
        + (t - 0.25 * p)[:, None, :]
        - 0.5 * c
    )
    # each per-n Psi2 factor is <= 1 => exponent <= 0 exactly; clamp kills
    # the f32 cancellation -> exp overflow path (see psi1)
    e = jnp.exp(jnp.minimum(expo, 0.0))
    if weights is not None:
        e = e * weights[:, None, None]
    return (variance * variance) * jnp.sum(e, axis=0)


def psi2(variance, ard, mu, s, Z, weights=None, block_n=None):
    """Psi2 (M, M) = sum_n <k(x_n, Z) k(x_n, Z)^T> under q(X).

    block_n: optional static chunk size over N; bounds the (B, M, M)
    intermediate (VMEM/HBM working set) and matches the Pallas/psum tiling.
    """
    ard = jnp.asarray(ard)
    n, q = mu.shape
    # n-independent factor: -1/4 alpha-weighted squared distance of Z pairs.
    Zs = Z * jnp.sqrt(ard)[None, :]
    zn = jnp.sum(Zs * Zs, axis=-1)
    zd2 = jnp.maximum(zn[:, None] - 2.0 * jnp.dot(Zs, Zs.T, precision=HIGHEST) + zn[None, :], 0.0)
    log_e = -0.25 * zd2                                # (M, M)

    if block_n is None or block_n >= n:
        return _psi2_block(variance, ard, mu, s, Z, log_e, weights)

    pad = (-n) % block_n
    if pad:
        mu = jnp.concatenate([mu, jnp.zeros((pad, q), mu.dtype)], axis=0)
        s = jnp.concatenate([s, jnp.ones((pad, q), s.dtype)], axis=0)
        w = jnp.ones((n,), mu.dtype) if weights is None else weights
        weights = jnp.concatenate([w, jnp.zeros((pad,), mu.dtype)], axis=0)
    nb = mu.shape[0] // block_n
    mu_b = mu.reshape(nb, block_n, q)
    s_b = s.reshape(nb, block_n, q)
    w_b = (
        weights.reshape(nb, block_n)
        if weights is not None
        else jnp.ones((nb, block_n), mu.dtype)
    )

    def step(acc, blk):
        mub, sb, wb = blk
        return acc + _psi2_block(variance, ard, mub, sb, Z, log_e, wb), None

    m = Z.shape[0]
    init = jnp.zeros((m, m), mu.dtype)
    out, _ = lax.scan(step, init, (mu_b, s_b, w_b))
    return out


def psi_stats(variance, ard, mu, s, Z, weights=None, block_n=None):
    """(Psi0, Psi1, Psi2) in one call."""
    return (
        psi0(variance, mu, weights),
        psi1(variance, ard, mu, s, Z, weights),
        psi2(variance, ard, mu, s, Z, weights, block_n),
    )


def observed_psi(variance, ard, X, Z):
    """Degenerate psi statistics for observed inputs (s -> 0): the sparse
    GP regression (SGPR) case. Psi1 = K_nm, Psi2 = K_mn K_nm, Psi0 = N*var.
    """
    knm = gram(variance, ard, X, Z)
    p0 = variance * jnp.asarray(X.shape[0], X.dtype)
    return p0, knm, jnp.dot(knm.T, knm, precision=HIGHEST)
