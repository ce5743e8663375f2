"""Kernel + psi-statistic dispatch.

Two axes of choice, both driven by model configs:
  - `kernel`: "ard_rbf" (reference parity) or "linear" (extension);
  - `use_pallas`: fused Pallas psi kernels for ARD-RBF (compiled on TPU,
    interpret-mode elsewhere, equivalence-tested in tests/test_pallas.py).
    The linear kernel's psi stats are plain matmuls — XLA is already
    optimal there, so the flag is a no-op for it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.kernels import ard_rbf, linear
from dp_gp_lvm_tpu.kernels.ard_rbf_vjp import psi1_weighted, psi2_analytic
from dp_gp_lvm_tpu.ops.pallas import psi as psi_pallas

_PSI2_BLOCK_PALLAS = 32
_PSI1_BLOCK_PALLAS = 128

KERNELS = {"ard_rbf": ard_rbf, "linear": linear}


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def gram(variance, ard, X1, X2=None, kernel: str = "ard_rbf"):
    return KERNELS[kernel].gram(variance, ard, X1, X2)


def gram_diag(variance, ard, X, kernel: str = "ard_rbf"):
    return KERNELS[kernel].gram_diag(variance, ard, X)


def observed_psi(variance, ard, X, Z, kernel: str = "ard_rbf"):
    return KERNELS[kernel].observed_psi(variance, ard, X, Z)


def psi_stats(
    variance, ard, mu, s, Z, weights=None, block_n=None,
    use_pallas: bool = False, kernel: str = "ard_rbf",
):
    """(Psi0, Psi1, Psi2) via the selected kernel and implementation."""
    if kernel == "linear":
        return linear.psi_stats(
            variance, ard, mu, s, Z, weights=weights, block_n=block_n
        )
    if kernel != "ard_rbf":
        raise ValueError(f"unknown kernel {kernel!r}")
    if not use_pallas:
        # default path: pure-JAX forward + hand-derived Psi2 VJP
        # (recompute-based backward, ~13% faster than autodiff on TPU and
        # with only (block, M, M)-sized transients; exactness asserted in
        # tests/test_psi2_vjp.py).
        return (
            ard_rbf.psi0(variance, mu, weights),
            psi1_weighted(variance, ard, mu, s, Z, weights),
            psi2_analytic(variance, ard, mu, s, Z, weights, block_n),
        )
    interpret = not _on_tpu()
    p0 = ard_rbf.psi0(variance, mu, weights)
    # psi1: Pallas forward is unweighted; the row weight is a rank-1
    # rescale XLA fuses for free, and it keeps the VJP exact for weights.
    p1 = psi_pallas.psi1_fused(
        variance, ard, mu, s, Z, _PSI1_BLOCK_PALLAS, interpret
    )
    if weights is not None:
        p1 = p1 * weights[:, None]
    # psi2: weights thread through the fused forward AND its VJP
    # (kernels/ard_rbf_vjp.py backward recompute carries them).
    p2 = psi_pallas.psi2_fused(
        variance, ard, mu, s, Z, weights, _PSI2_BLOCK_PALLAS, interpret
    )
    return p0, p1, p2


def psi0(variance, ard, mu, s, weights=None, kernel: str = "ard_rbf"):
    if kernel == "linear":
        return linear.psi0(variance, ard, mu, s, weights)
    return ard_rbf.psi0(variance, mu, weights)


def expected_gram_diag(variance, ard, mu, s, kernel: str = "ard_rbf"):
    """Per-row expected kernel diagonal E_{q(x_n)}[k(x_n, x_n)], (N,).

    The RBF's diagonal is the constant signal variance; the linear
    kernel's depends on the latent second moment — prediction paths must
    dispatch on this rather than hardcode `variance`."""
    if kernel == "ard_rbf":
        return variance * jnp.ones(mu.shape[0], mu.dtype)
    if kernel == "linear":
        return variance * jnp.sum(
            jnp.asarray(ard)[None, :] * (mu * mu + s), axis=-1
        )
    raise ValueError(f"unknown kernel {kernel!r}")


def resolve_pallas(use_pallas, kernel: str, t: int, n: int, m: int) -> bool:
    """Static fused-kernel decision: M >= 96 AND tile volume t*n*m^2
    above ~5e8.

    Both cuts are measured on v5e with identical-precision arithmetic
    (results/roofline.json; the compiled kernels pin in-kernel f32 —
    see ops/pallas/psi.py): at M=128 the fused fwd+bwd wins ~2x
    (89.8 vs 177.4 ms at N=8192/T=20) and the margin grows with N; at
    M<=64 XLA's single-shot lowering is consistently faster (40.5 vs
    45.0 ms at N=8192, 148.8 vs 164.3 at N=32768) because the (B, M)
    stages pad half the 128-wide MXU lanes while XLA fuses the whole
    step. The same rule serves single-device ("auto" in model configs)
    and the shard_map path (which passes PER-DEVICE shapes — the
    crossover is about local work).
    """
    if kernel != "ard_rbf":
        return False
    if use_pallas == "auto":
        return m >= 96 and t * n * m * m > int(5e8)
    return bool(use_pallas)


def dp_batched_suffstats(
    variance, ard, mu, s, Zs, Y, weights=None, block_n=None,
    use_pallas="auto", kernel: str = "ard_rbf",
):
    """Stacked per-atom sufficient statistics for the DP family:
    (psi0 (T,), psi1T_y (T, M, D), psi2 (T, M, M), yty (D,), n).

    One fused Pallas kernel over grid (T, N/block) when `resolve_pallas`
    selects it (Psi1 never materializes in HBM), else vmapped pure JAX.
    Shared by the full-batch DP bound, the minibatch DP-SVI bound, and
    the per-shard program in parallel/sharded_elbo.py (which passes
    PER-DEVICE shapes)."""
    t_local, m = Zs.shape[0], Zs.shape[1]
    if kernel == "ard_rbf" and resolve_pallas(
        use_pallas, kernel, t_local, mu.shape[0], m
    ):
        blk = block_n or psi_pallas._fwd_block(m, mu.shape[0])
        p2, p1y = psi_pallas.suffstats_batched_fused(
            variance, ard, mu, s, Zs, Y, weights, blk, not _on_tpu()
        )
        p0 = ard_rbf.psi0(variance, mu, weights)
    elif kernel == "ard_rbf":
        p2 = jax.vmap(
            lambda v, a, zt: psi2_analytic(v, a, mu, s, zt, weights, block_n)
        )(variance, ard, Zs)
        Yw = Y if weights is None else Y * weights[:, None]
        p1y = jax.vmap(
            lambda v, a, zt: jnp.dot(
                psi1_weighted(v, a, mu, s, zt, None).T, Yw,
                precision=jax.lax.Precision.HIGHEST,
            )
        )(variance, ard, Zs)
        p0 = ard_rbf.psi0(variance, mu, weights)
    else:
        def one(v, a, zt):
            p0_t, p1_t, p2_t = psi_stats(
                v, a, mu, s, zt, weights=weights, block_n=block_n,
                use_pallas=False, kernel=kernel,
            )
            return p0_t, jnp.dot(
                p1_t.T, Y, precision=jax.lax.Precision.HIGHEST
            ), p2_t

        p0, p1y, p2 = jax.vmap(one)(variance, ard, Zs)
    Yw = Y if weights is None else Y * weights[:, None]
    n_eff = (
        jnp.asarray(Y.shape[0], Y.dtype) if weights is None
        else jnp.sum(weights)
    )
    return p0, p1y, p2, jnp.sum(Y * Yw, axis=0), n_eff


def suff_stats(
    variance, ard, mu, s, Z, Y, weights=None, block_n=None,
    use_pallas="auto", kernel: str = "ard_rbf",
):
    """SuffStats of the collapsed bound for ONE kernel (a BGPLVM model or
    a single MRD view), with the same auto fused-kernel dispatch as the
    DP atom path. On the fused path Psi2 and Psi1^T Y come from one
    pallas_call (grid (1, N/B)) and Psi1 never materializes in HBM."""
    from dp_gp_lvm_tpu.models.bound import SuffStats, suff_stats_from_psi

    n, m = mu.shape[0], Z.shape[0]
    if resolve_pallas(use_pallas, kernel, 1, n, m):
        blk = block_n or psi_pallas._fwd_block(m, n)
        p2, p1y = psi_pallas.suffstats_batched_fused(
            variance[None], ard[None], mu, s, Z[None], Y, weights,
            blk, not _on_tpu(),
        )
        Yw = Y if weights is None else Y * weights[:, None]
        n_eff = (
            jnp.asarray(n, Y.dtype) if weights is None
            else jnp.sum(weights)
        )
        return SuffStats(
            psi0=ard_rbf.psi0(variance, mu, weights),
            psi1T_y=p1y[0],
            psi2=p2[0],
            yty=jnp.sum(Y * Yw, axis=0),
            n=n_eff,
        )
    p0, p1, p2 = psi_stats(
        variance, ard, mu, s, Z, weights=weights, block_n=block_n,
        use_pallas=False, kernel=kernel,
    )
    return suff_stats_from_psi(p0, p1, p2, Y, weights)
