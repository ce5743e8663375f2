"""GSPMD auto-sharding path: jit + NamedSharding annotations.

The idiomatic alternative to the explicit shard_map programs in
sharded_elbo.py: annotate how the data-dependent arrays lie on the mesh
and let XLA's SPMD partitioner insert the collectives. Because the model
code reduces everything through sums over n (SuffStats), the partitioner
recovers exactly the psum-of-partials schedule the explicit path writes
by hand — both paths are tested equal (tests/test_parallel.py).

Use this when you want one code path for any mesh; use sharded_elbo when
you want the collective schedule pinned down explicitly.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dp_gp_lvm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def bgplvm_shardings(mesh: Mesh):
    """(params_sharding, data_sharding) pytrees for the B-GPLVM layout:
    q(X) and Y row-sharded over "data"; everything else replicated."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    params = {
        "qx_mean": row,
        "raw_qx_var": row,
        "z": rep,
        "raw_variance": rep,
        "raw_ard": rep,
        "raw_noise": rep,
    }
    return params, row


def dp_shardings(mesh: Mesh):
    """DP-GP-LVM layout: rows over "data", atom-stacked params over
    "model", assignments/sticks replicated."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    atom = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    params = {
        "qx_mean": row,
        "raw_qx_var": row,
        "z": atom,
        "raw_variance": atom,
        "raw_ard": atom,
        "raw_noise": atom,
        "phi_logits": rep,
        "raw_gamma1": rep,
        "raw_gamma2": rep,
    }
    return params, row


def mrd_shardings(mesh: Mesh, num_views: int):
    """MRD layout: q(X) and every view's rows over "data"; per-view
    kernel/inducing params replicated."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    view = {"z": rep, "raw_variance": rep, "raw_ard": rep, "raw_noise": rep}
    params = {
        "qx_mean": row,
        "raw_qx_var": row,
        "views": [dict(view) for _ in range(num_views)],
    }
    return params, row


def svi_shardings(mesh: Mesh, params):
    """SVI-GPLVM layout: every param replicates (the full-N q(X) table is
    gathered by batch index each step; batch rows shard INSIDE the step
    program, parallel/sharded_elbo.svi_elbo_sharded). Data stays
    replicated too — rows are gathered per step."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, params), rep


def dp_svi_shardings(mesh: Mesh, params):
    """Minibatch DP-SVI layout: atom-stacked hypers and q(u|t) naturals
    over "model"; q(X) table, phi, sticks replicated; batch rows shard
    inside the step program (dp_svi_elbo_sharded)."""
    atom = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())
    atom_keys = ("z", "raw_variance", "raw_ard", "raw_noise",
                 "u_h", "u_lam")
    shard = {
        k: (atom if k in atom_keys else rep) for k in params
    }
    return shard, rep


def place(tree, shardings):
    """Device-put a pytree according to a matching shardings pytree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


def auto_sharded_value_and_grad(loss_fn: Callable, params_sharding, mesh):
    """jit(value_and_grad(loss)) with GSPMD input/output constraints.

    loss_fn(params, Y) must be written in plain jnp (the single-device
    model code) — no shard_map required.
    """
    return jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(params_sharding, NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=(
            NamedSharding(mesh, P()),
            params_sharding,
        ),
    )
