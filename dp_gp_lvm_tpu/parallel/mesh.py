"""Device mesh construction and axis conventions.

Axes (SURVEY.md section 2b):
  - "data":  shards N (data rows). Psi-statistic partial sums, the
             data-fit quadratics, and KL[q(X)] partials are all sums over
             n, so they reduce with one psum over this axis — the exact
             blockwise/ring analogue of the reference's full-batch sums.
  - "model": shards T (DP truncation atoms) — the natural model axis of
             this family: per-atom psi stats / Cholesky factorizations are
             independent given the shared q(X). (For MRD the same axis can
             shard views; for very large D it can shard output dims.)

The reference has no parallelism of any kind (single-process TF1); both
axes are new in the TPU build. PP/EP do not apply (no layered network, no
MoE) — documented as intentionally out of scope.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Mesh over available devices; data axis absorbs the remainder."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} != {n} devices; pass explicit axes"
        )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Rows over the data axis: (N, ...) arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def atom_sharding(mesh: Mesh) -> NamedSharding:
    """Leading atom axis over the model axis: (T, ...) arrays."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
