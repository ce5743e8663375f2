"""Staged split-init training recipe for the minibatch DP-SVI flagship
(config c7) as a library call, with stage-boundary checkpoints.

Why staged (every claim measured at c7 scale, N=131072 — see
results/c7): cold multi-atom starts sit on a symmetric saddle —
near-uniform phi gives every atom the same phi-weighted gradient, atoms
never differentiate, and the mixture collapses to one atom (measured at
N=32k on every cold phi variant). The recipe:

1. **stage1 (T=1 warm start, 60% of the budget)** trains the shared fit
   once at truncation=1 — exactly the proven big-N SVI path. Stage-1
   ELBO plateaus by ~60% of the c7 budget; the rest goes to assignment
   and refinement.
2. **split**: clone the atom across a noise ladder built from the
   per-dim residual quantiles of the stage-1 fit (one full-data pass) —
   brackets every group's actual residual level, unlike a fixed
   log-spread (`dp_svi.split_single_atom(residuals=...)`).
3. **stage2 warmup (phi frozen, zero learning rate)**: only the
   per-atom natural-gradient q(u|t) blend acts, so each clone's q(u|t)
   equilibrates to its own noise level before the first (one-hot at
   O(N) logit gaps) CAVI reassignment; assigning at step 1 instead
   locks in the post-split transient (measured: groups merged onto one
   atom). Hypers must not train here: with phi uniform every atom gets
   the SAME hyper gradient and the noise ladder would drift back
   together.
4. **stage2b assignment at a fixed manifold**: latents, ARD, inducing
   and signal variances freeze (`gp_optimizer(freeze=...)`), so every
   dim's residual level is static while damped CAVI forms the
   assignments and each atom's noise tracks only its OWN dims. Joint
   training here instead shrinks all residuals together and the moving
   noise ladder crosses group levels — measured at c7: two groups
   merged onto the atom passing between them.
5. **stage2c joint fine-tune with assignments locked**
   (phi_update="frozen"): everything trains; phi stays at the settled
   clustering so ladder drift can no longer reassign dims.

Fault tolerance: with `ckpt_dir` set, each completed stage writes its
output params atomically as `<ckpt_dir>/<stage>.npz` (the DP-SVI param
pytree is a flat dict of arrays). A rerun with `resume=True` restarts
at the first incomplete stage — a mid-stage interruption replays at
most one stage — and consumes the SAME rng splits for skipped stages,
so an interrupted-and-resumed run finishes bit-identical to an
uninterrupted one (asserted in tests/test_dp_recipe.py).

Mesh: pass a `jax.sharding.Mesh` to run stages 2+ through the sharded
recipe (`parallel/recipe.place_svi`: batch rows over "data", atoms over
"model"). Stage 1 trains truncation=1 and cannot shard atoms; it runs
unsharded by design.
"""
from __future__ import annotations

import os
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

# stage2b freeze set: the manifold/hyper leaves that must stay fixed
# while damped CAVI forms the assignments (see module docstring, item 4)
FROZEN_MANIFOLD = frozenset(
    {"qx_mean", "raw_qx_var", "z", "raw_variance", "raw_ard"}
)


def _frozen_manifold_for(params) -> frozenset:
    """FROZEN_MANIFOLD extended to recognition-network leaves when the
    model is amortized (models/amortized.py) — the encoder IS the
    manifold parameterization there."""
    return FROZEN_MANIFOLD | frozenset(
        k for k in params if k.startswith("enc_")
    )

RECIPE = (
    "split-init: T=1 warm start + residual-quantile clone "
    "+ frozen-phi q(u) warmup + fixed-manifold CAVI "
    "assignment + locked-phi joint fine-tune"
)

# stage-boundary checkpoint names, in completion order
STAGE_SPLIT = "stage1_split"       # post-split full-T params
STAGE_WARM = "stage2_warm"         # post-warmup params
STAGE_ASSIGN = "stage2b_assign"    # post-assignment params
_BOUNDARIES = (STAGE_SPLIT, STAGE_WARM, STAGE_ASSIGN)


def plan(steps: int, chunk: int) -> dict[str, int]:
    """Step budget per stage (all multiples of the scan chunk)."""
    s1_steps = max(chunk, (int(steps * 0.6) // chunk) * chunk)
    s2_steps = max(chunk, steps - s1_steps)
    warm = max(50, min(250, s2_steps // 5))
    s2_assign = max(chunk, ((s2_steps - warm) // 2 // chunk) * chunk)
    s2_joint = max(chunk, s2_steps - warm - s2_assign)
    return {"s1_steps": s1_steps, "s2_steps": s2_steps, "warm": warm,
            "s2_assign": s2_assign, "s2_joint": s2_joint}


def _path(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, f"{stage}.npz")


def _save_boundary(ckpt_dir: str | None, stage: str, params) -> None:
    if ckpt_dir is None:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = _path(ckpt_dir, stage) + ".tmp"
    with open(tmp, "wb") as f:       # file handle: np.savez must not
        np.savez(f, **{k: np.asarray(v)   # append .npz to the tmp name
                       for k, v in params.items()})
    os.replace(tmp, _path(ckpt_dir, stage))   # atomic publish


def _load_boundary(ckpt_dir: str, stage: str) -> dict:
    with np.load(_path(ckpt_dir, stage)) as f:
        return {k: jnp.asarray(f[k]) for k in f.files}


def _latest_boundary(ckpt_dir: str | None) -> str | None:
    if ckpt_dir is None:
        return None
    done = [s for s in _BOUNDARIES if os.path.exists(_path(ckpt_dir, s))]
    return done[-1] if done else None


def staged_dp_svi(
    rng,
    rng_run,
    Y: jax.Array,
    config,
    n_total: int,
    *,
    steps: int,
    chunk: int,
    lr: float,
    ngd_lr: float | None,
    drive: Callable,
    mesh=None,
    ckpt_dir: str | None = None,
    resume: bool = False,
    log: Callable[[str], None] = lambda s: print(s, flush=True),
):
    """Run the staged split-init DP-SVI schedule. Returns
    (state, optimizer, info) where `optimizer` is the final-stage
    optimizer (for downstream checkpoint/export of `state`) and `info`
    carries per-stage step counts, timing, and resume provenance.

    `drive(step_fn, state, n_steps, rng, Y, label=...)` must run
    n_steps of step_fn via chunked scans and return
    (state, post_compile_seconds_per_step, wall_seconds) — the caller
    owns dispatch/logging policy (experiments/run.py passes its chunked
    logger-aware loop; tests pass a bare scan).
    """
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state

    p = plan(steps, chunk)
    s1_steps, s2_steps = p["s1_steps"], p["s2_steps"]
    warm, s2_assign, s2_joint = p["warm"], p["s2_assign"], p["s2_joint"]

    start_after = _latest_boundary(ckpt_dir) if resume else None
    info: dict = {"stage1_steps": s1_steps, "stage2_steps": s2_steps,
                  "recipe": RECIPE}
    if start_after is not None:
        info["resumed_from"] = start_after
        log(f"  [resume] skipping ahead: {start_after} checkpoint found "
            f"in {ckpt_dir}")

    mcfg1 = config._replace(truncation=1)
    # rng split ORDER is part of the contract: resume consumes the same
    # splits for skipped stages so the remaining stages see the same
    # streams as an uninterrupted run (bit-identical finish; tested).
    rng_run, r1, r2 = jax.random.split(rng_run, 3)
    tt1 = 0.0

    if start_after is None:
        params1 = dp_svi.init_params(rng, Y, mcfg1)
        opt1 = gp_optimizer(params1, lr=lr, decay_steps=s1_steps,
                            ngd_lr=ngd_lr)
        step1 = dp_svi.make_dp_svi_step(mcfg1, n_total, opt1, rho=0.3)
        state, _, tt1 = drive(step1, init_state(params1, opt1),
                              s1_steps, r1, Y, label="[stage1 T=1] ")
        # noise ladder from the per-dim residual quantiles of the
        # stage-1 fit (one full-data pass)
        resid = dp_svi.expected_residuals(state.params, Y, mcfg1)
        params = dp_svi.split_single_atom(state.params, config,
                                          residuals=resid)
        _save_boundary(ckpt_dir, STAGE_SPLIT, params)
    else:
        params = _load_boundary(ckpt_dir, start_after)

    if mesh is not None:
        from dp_gp_lvm_tpu.parallel import recipe

        params, (Y,) = recipe.place_svi("dp_svi", params, (Y,), mesh)

    t2_start = time.perf_counter()
    if start_after in (None, STAGE_SPLIT):
        opt_w = gp_optimizer(params, lr=0.0, hyper_lr=0.0)
        warm_step = dp_svi.make_dp_svi_step(
            config, n_total, opt_w, rho=0.5, phi_update="frozen",
            mesh=mesh,
        )
        rng_run, rw = jax.random.split(rng_run)
        state_w = init_state(params, opt_w)
        rngs_w = jax.random.split(rw, warm)

        @jax.jit
        def warm_scan(st, rr):
            def one_w(s, r):
                s, m = warm_step(s, r, Y)
                return s, m["loss"]

            return jax.lax.scan(one_w, st, rr)

        state_w, warm_losses = warm_scan(state_w, rngs_w)
        jax.block_until_ready(warm_losses)
        params = state_w.params
        log(f"  [stage2 warmup] {warm} frozen-phi steps, "
            f"loss {float(warm_losses[-1]):.4g}")
        _save_boundary(ckpt_dir, STAGE_WARM, params)
    else:
        rng_run, _ = jax.random.split(rng_run)

    if start_after in (None, STAGE_SPLIT, STAGE_WARM):
        opt_a = gp_optimizer(params, lr=lr, decay_steps=s2_assign,
                             freeze=_frozen_manifold_for(params))
        assign_step = dp_svi.make_dp_svi_step(
            config, n_total, opt_a, rho=0.3, rho_phi=0.2,
            phi_update="cavi", mesh=mesh,
        )
        state, _, _ = drive(
            assign_step, init_state(params, opt_a), s2_assign, r2, Y,
            label=f"[stage2b assign T={config.truncation}] ",
        )
        params = state.params
        _save_boundary(ckpt_dir, STAGE_ASSIGN, params)

    opt2 = gp_optimizer(params, lr=lr, decay_steps=s2_joint,
                        ngd_lr=ngd_lr)
    nat_step = dp_svi.make_dp_svi_step(
        config, n_total, opt2, rho=0.3, phi_update="frozen", mesh=mesh,
    )
    rng_run, r2c = jax.random.split(rng_run)
    state, per_step, _ = drive(
        nat_step, init_state(params, opt2), s2_joint, r2c, Y,
        label=f"[stage2c joint T={config.truncation}] ",
    )
    info["per_step"] = per_step
    info["seconds"] = tt1 + (time.perf_counter() - t2_start)
    return state, opt2, info
