"""Psi-statistic dispatch: pure-JAX reference path vs fused Pallas kernels.

Models call `psi_stats(...)` with their config's `use_pallas` flag; the
Pallas path runs compiled on TPU and interpret-mode elsewhere (so the same
model code is runnable and testable on CPU). Both paths are equivalence-
tested in tests/test_pallas.py.
"""
from __future__ import annotations

import jax

from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.ops.pallas import psi as psi_pallas

_PSI2_BLOCK_PALLAS = 32
_PSI1_BLOCK_PALLAS = 128


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def psi_stats(
    variance, ard, mu, s, Z, weights=None, block_n=None,
    use_pallas: bool = False,
):
    """(Psi0, Psi1, Psi2) via the selected implementation."""
    if not use_pallas or weights is not None:
        # pure-JAX reference path (also used when row weights are needed —
        # the fused wrappers don't thread weights through the VJP yet)
        return ard_rbf.psi_stats(
            variance, ard, mu, s, Z, weights=weights, block_n=block_n
        )
    interpret = not _on_tpu()
    p0 = ard_rbf.psi0(variance, mu, weights)
    p1 = psi_pallas.psi1_fused(
        variance, ard, mu, s, Z, _PSI1_BLOCK_PALLAS, interpret
    )
    p2 = psi_pallas.psi2_fused(
        variance, ard, mu, s, Z, _PSI2_BLOCK_PALLAS, interpret
    )
    return p0, p1, p2
