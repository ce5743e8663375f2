"""The multi-chip production recipe, shared by the user-facing entry
(`experiments/run.py --mesh data,model`) and the driver's
`__graft_entry__.dryrun_multichip` — ONE code path from "dryrun proves
it" to "the flagship experiment uses it" (SURVEY.md section 2b).

`sharded_setup` returns, for a named model family, the sharded loss and
the params/data placed on the mesh; the caller's training loop
(train.loop.make_multi_step_fn or the SVI step factories with mesh=...)
is unchanged from single-device — optimizer state inherits the param
shardings through optax's init, and orbax checkpoints round-trip
sharded arrays natively (exercised by dryrun_multichip).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh

from dp_gp_lvm_tpu.parallel import auto
from dp_gp_lvm_tpu.parallel.sharded_elbo import (
    bgplvm_loss_sharded,
    dp_loss_sharded,
    mrd_loss_sharded,
)


def parse_mesh(spec: str) -> tuple[int, int]:
    """"4,2" -> (data=4, model=2); "8" -> (8, 1)."""
    parts = [int(p) for p in spec.split(",")]
    if len(parts) == 1:
        return parts[0], 1
    if len(parts) != 2:
        raise ValueError(f"mesh spec must be DATA[,MODEL], got {spec!r}")
    return parts[0], parts[1]


def sharded_setup(model: str, params, data: tuple, config, mesh: Mesh):
    """(loss_fn, params_placed, data_placed) for a full-batch model
    family on a mesh. loss_fn(params, *data) is the exact sharded
    equivalent of the single-device loss (tests/test_parallel.py);
    `data` arrays are row-sharded over "data" (N must divide the data
    axis), params laid out per parallel.auto.

    SVI families (svi_gplvm, dp_svi) don't go through here — their step
    factories take mesh= directly (the batch, not the dataset, is the
    sharded axis); use `place_svi` for their param/data placement."""
    if model == "bgplvm":
        loss_fn = lambda p, y: bgplvm_loss_sharded(p, y, config, mesh)
        p_shard, row = auto.bgplvm_shardings(mesh)
    elif model == "dp_gp_lvm":
        loss_fn = lambda p, y: dp_loss_sharded(p, y, config, mesh)
        p_shard, row = auto.dp_shardings(mesh)
    elif model == "mrd":
        loss_fn = lambda p, *ys: mrd_loss_sharded(p, list(ys), config,
                                                  mesh)
        p_shard, row = auto.mrd_shardings(mesh, len(data))
    else:
        raise ValueError(f"no sharded recipe for model {model!r}")
    params = auto.place(params, p_shard)
    data = tuple(jax.device_put(y, row) for y in data)
    return loss_fn, params, data


def place_svi(model: str, params, data: tuple, mesh: Mesh):
    """(params_placed, data_placed) for the SVI families: atom leaves
    over "model" (dp_svi) or fully replicated (svi_gplvm); the dataset
    replicates (rows are gathered by index each step)."""
    if model == "dp_svi":
        p_shard, rep = auto.dp_svi_shardings(mesh, params)
    elif model in ("svi_gplvm", "mrd_svi"):
        # mrd_svi replicates everything too (per-view q(u^v) is tiny;
        # batch rows shard inside the step program) — tree_map descends
        # into the nested views list
        p_shard, rep = auto.svi_shardings(mesh, params)
    else:
        raise ValueError(f"not an SVI family: {model!r}")
    params = auto.place(params, p_shard)
    data = tuple(jax.device_put(y, rep) for y in data)
    return params, data
