"""Staged structure-then-recalibrate training recipe for the minibatch
multi-view MRD family (config c9) as a library call.

Why staged (every claim measured at c9 scale, N=131072 — the round-4
diagnosis, results/c9_diag.json):

- **Calm rates never separate the ARD.** At the production lr/10 hyper
  rate the per-view relevance stays flat (cross-private ratio 0.98
  after 8k steps, results/c9_ngd) — each view keeps a nonzero weight on
  the OTHER view's private latent dim, the serving-side q(x*) is then
  (wrongly) confident on dims the observed view carries no information
  about, and the cross-view predictive variance loses the ~0.5
  irreducible private-signal variance.
- **Hot rates separate the ARD but collapse the likelihood
  temperature.** 10x-hot hypers reach ratio 0.375 (results/c9_long),
  but sigma_f^2 collapses 0.40 -> 0.068 and noise to 0.02: whitened
  q(u) means carry the O(1) signal through a near-degenerate kernel,
  predictive variance is structurally capped at sigma_f^2 + noise ~ 0.09
  against a 0.54 irreducible cross-view residual, and PLL craters to
  -8.3 (err^2/var = 17.8). The collapse is bound-preferred (hot final
  ELBO -187k vs calm -6.6e6), so more calm training cannot undo it.

The recipe therefore splits the run:

1. **Phase A (structure, default 2/3 of the budget)**: the WHOLE model
   runs hot (`hot_lr`, default 2e-2, hypers at hot_lr/10 with a warmup
   ramp) — the exact regime results/c9_long measured at c9 scale:
   finite over 16k steps and separated to ratio 0.375. Heating only
   the hypers at calm-lr multiples was tried at full scale and came up
   short both ways: 10x diverged from a cold start (first aborted
   c9_r5), hypers-at-lr separated only to 0.70 in the full 16k-step
   phase (second c9_r5) — the latents must move WITH the relevance
   weights for the signature to form. Calibration is knowingly
   sacrificed in this phase.
2. **Phase B (recalibrate, the rest)**: freeze the separated `raw_ard`
   AND `raw_variance` (reset per view to `reset_variance` — the
   calibrated equilibrium the calm runs find, c9_ngd: 0.40), reset
   noise to `reset_noise`, and retrain everything else at calm rates.
   The per-view natural-gradient q(u^v) blend re-equilibrates the
   explicit whitened q(u) to the restored kernel scale within tens of
   steps; the noise then settles at the honest residual level because
   the temperature dials it previously used to collapse the likelihood
   are pinned. Freezing (not flooring) raw_variance is deliberate: the
   collapse is bound-preferred, so a free sigma_f^2 would walk straight
   back down.

Fault tolerance: with `ckpt_dir` set the phase-A boundary params write
atomically as `<ckpt_dir>/phaseA.npz`; `resume=True` restarts at phase B
consuming the same rng splits (the dp_recipe.staged_dp_svi contract).
"""
from __future__ import annotations

import os
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.core.transforms import positive, positive_inverse

RECIPE = (
    "structure-then-recalibrate: hot-hyper ARD separation + frozen-ARD "
    "variance-reset calm recalibration"
)

PHASE_A = "phaseA"

# phase-B freeze set: the separated relevance signature must not drift,
# and the likelihood temperature must not re-collapse (both are
# bound-preferred failure modes — module docstring)
FROZEN_STRUCTURE = frozenset({"raw_ard", "raw_variance"})


def plan(steps: int, chunk: int, phase_a_frac: float = 2.0 / 3.0):
    a = max(chunk, (int(steps * phase_a_frac) // chunk) * chunk)
    b = max(chunk, steps - a)
    return {"phase_a_steps": a, "phase_b_steps": b}


def _path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, f"{PHASE_A}.npz")


def _save_boundary(ckpt_dir: str | None, params) -> None:
    if ckpt_dir is None:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = {}
    for k, v in params.items():
        if k == "views":
            for i, vp in enumerate(v):
                for kk, vv in vp.items():
                    flat[f"views/{i}/{kk}"] = np.asarray(vv)
        else:
            flat[k] = np.asarray(v)
    tmp = _path(ckpt_dir) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, _path(ckpt_dir))


def _load_boundary(ckpt_dir: str) -> dict:
    with np.load(_path(ckpt_dir)) as f:
        views: dict[int, dict] = {}
        out: dict = {}
        for k in f.files:
            if k.startswith("views/"):
                _, i, leaf = k.split("/", 2)
                views.setdefault(int(i), {})[leaf] = jnp.asarray(f[k])
            else:
                out[k] = jnp.asarray(f[k])
        out["views"] = [views[i] for i in sorted(views)]
        return out


def recalibrated(params, reset_variance: float, reset_noise: float,
                 qx_reexpand: float = 0.05):
    """Phase-B boundary surgery: per view, reset sigma_f^2 and noise to
    calibrated levels, rescaling the whitened q(u^v) mean so the
    predictive mean is INVARIANT at the boundary (f = Psi1 Kuu^{-1/2} m
    with Psi1 ~ sigma_f^2 and Kuu^{-1/2} ~ 1/sigma_f, so f ~ sigma_f m:
    m must shrink by sqrt(old/new)).

    qx_reexpand: floor the resident q(X) variance at this value at the
    boundary. The hot phase leaves the latents nearly interpolating
    (qx_var ~ 0.006, results/c9_long) — with sigma_f^2 then frozen, the
    noise is the only temperature left in phase B and it ran away to a
    +3.6e6 'bound' and NaN at full scale (aborted c9_r5 #2, 2026-08-20)
    before this re-expansion and the config noise floor existed."""
    from dp_gp_lvm_tpu.core.transforms import MIN_VARIATIONAL_VAR

    params = dict(params)
    if qx_reexpand and "raw_qx_var" in params:
        raw_floor = positive_inverse(
            jnp.asarray(qx_reexpand - MIN_VARIATIONAL_VAR,
                        params["raw_qx_var"].dtype)
        )
        params["raw_qx_var"] = jnp.maximum(params["raw_qx_var"], raw_floor)
    views = []
    for vp in params["views"]:
        var_old = positive(vp["raw_variance"])
        dtype = vp["u_mean"].dtype
        var_new = jnp.asarray(reset_variance, dtype)
        scale = jnp.sqrt(var_old / var_new).astype(dtype)
        views.append({
            **vp,
            "raw_variance": positive_inverse(var_new),
            "raw_noise": positive_inverse(jnp.asarray(reset_noise, dtype)),
            "u_mean": vp["u_mean"] * scale,
        })
    return {**params, "views": views}


def staged_mrd_svi(
    rng,
    rng_run,
    Ys,
    config,
    n_total: int,
    *,
    steps: int,
    chunk: int,
    lr: float,
    drive: Callable,
    mesh=None,
    ckpt_dir: str | None = None,
    resume: bool = False,
    hot_lr: float = 2e-2,
    phase_a_frac: float = 2.0 / 3.0,
    reset_variance: float = 0.4,
    reset_noise: float = 0.25,
    rho: float = 0.2,
    log: Callable[[str], None] = lambda s: print(s, flush=True),
):
    """Run the staged structure-then-recalibrate MRD-SVI schedule.
    Returns (state, optimizer, info) — the dp_recipe.staged_dp_svi
    contract; `drive` is the caller-owned chunked dispatch loop.

    hot_lr: phase-A learning rate for ALL params (hypers at hot_lr/10,
    ramped from 0 over the first tenth of the phase). Default 2e-2 =
    the c9_long regime (module docstring)."""
    from dp_gp_lvm_tpu.models import mrd_svi
    from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state

    p = plan(steps, chunk, phase_a_frac)
    sa, sb = p["phase_a_steps"], p["phase_b_steps"]
    info: dict = {"phase_a_steps": sa, "phase_b_steps": sb,
                  "recipe": RECIPE, "hot_lr": hot_lr,
                  "reset_variance": reset_variance,
                  "reset_noise": reset_noise}

    resume_b = resume and ckpt_dir is not None and os.path.exists(
        _path(ckpt_dir)
    )
    rng_run, ra, rb = jax.random.split(rng_run, 3)
    ta = 0.0

    if not resume_b:
        params = mrd_svi.init_params(rng, list(Ys), config)
        if mesh is not None:
            from dp_gp_lvm_tpu.parallel import recipe

            params, Ys = recipe.place_svi("mrd_svi", params, tuple(Ys),
                                          mesh)
        opt_a = gp_optimizer(params, lr=hot_lr, hyper_lr=hot_lr / 10.0,
                             decay_steps=sa, hyper_warmup=max(1, sa // 10))
        step_a = mrd_svi.make_svi_natgrad_step(
            config, n_total, opt_a, rho=rho, mesh=mesh,
        )
        state, _, ta = drive(step_a, init_state(params, opt_a), sa, ra,
                             tuple(Ys), label="[phaseA hot] ")
        params = state.params
        _save_boundary(ckpt_dir, jax.device_get(params))
    else:
        info["resumed_from"] = PHASE_A
        log(f"  [resume] phaseA checkpoint found in {ckpt_dir}")
        params = _load_boundary(ckpt_dir)
        if mesh is not None:
            from dp_gp_lvm_tpu.parallel import recipe

            params, Ys = recipe.place_svi("mrd_svi", params, tuple(Ys),
                                          mesh)

    tb_start = time.perf_counter()
    ard = np.asarray(mrd_svi.ard_relevance(params))
    log(f"  [phaseB] boundary relevance {np.round(ard, 3).tolist()}; "
        f"freezing raw_ard+raw_variance, reset sigma_f^2="
        f"{reset_variance} noise={reset_noise}")
    params = recalibrated(params, reset_variance, reset_noise)
    opt_b = gp_optimizer(params, lr=lr, decay_steps=sb,
                         freeze=FROZEN_STRUCTURE)
    step_b = mrd_svi.make_svi_natgrad_step(
        config, n_total, opt_b, rho=rho, mesh=mesh,
    )
    state, per_step, _ = drive(step_b, init_state(params, opt_b), sb, rb,
                               tuple(Ys), label="[phaseB recal] ")
    info["per_step"] = per_step
    info["seconds"] = ta + (time.perf_counter() - tb_start)
    return state, opt_b, info
