"""Run a named BASELINE config end-to-end (SURVEY.md section 2a
'Experiments'): data -> init -> jitted training loop -> metrics, with
JSONL logging, optional checkpoints, and an .npz export of learned params.

    python experiments/run.py c1_bgplvm_toy --steps 500
    python experiments/run.py c4_dp_mocap --out /tmp/run_c4
    python experiments/run.py c5_dp_missing        # trains, then imputes

On the single TPU this runs f32; pass --f64 on CPU for the parity path.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ard_cross_private_ratio(rel) -> float:
    """Shared/private MRD signature as ONE gateable scalar: per view,
    the weakest ARD weight (the other view's private dim, which the
    generator gives ZERO weight) over the mean of the two strongest
    (the shared dims); reported as the max over views. Truth on the
    two_view generators: 0. Flat relevance (structure not learned, the
    round-3 c9 failure): 1. Gated in core/config.CHECKS for both MRD
    configs."""
    import numpy as np

    rel = np.asarray(rel, dtype=np.float64)
    ratios = []
    for row in rel:
        w = np.sort(row)[::-1]
        ratios.append(w[-1] / max(w[:2].mean(), 1e-30))
    return float(max(ratios))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="name from dp_gp_lvm_tpu.core.config")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ngd-lr", type=float, default=None,
                    help="override config.ngd_lr (natural-gradient rate\n                    for the q(X) variational params)")
    ap.add_argument("--out", default=None, help="output dir (logs/ckpts/npz)")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ckpt-every", type=int, default=0)
    ap.add_argument("--data-dir", default=None,
                    help="directory with real oil-flow / AMC files")
    ap.add_argument("--mesh", default=None, metavar="DATA[,MODEL]",
                    help="train on a device mesh: rows shard over the "
                         "data axis, DP atoms over the model axis "
                         "(parallel/recipe.py — the dryrun_multichip "
                         "production recipe by name). DATAxMODEL must "
                         "equal the visible device count.")
    ap.add_argument("--plots", action="store_true",
                    help="save latent/ARD/assignment plots to the out dir")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax_debug_nans (eager NaN localization)")
    ap.add_argument("--check", action="store_true",
                    help="assert the committed regression gates "
                         "(core/config.CHECKS) on the finished run; "
                         "exit 1 on any failure")
    ap.add_argument("--n", type=int, default=None,
                    help="override the config's data size (smoke runs "
                         "on small hosts / fake-device meshes)")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the SVI minibatch size (smoke runs)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override config.lr (sweeps)")
    ap.add_argument("--hyper-lr", type=float, default=None,
                    help="override the kernel-hyper Adam rate (default "
                         "lr/10; sweeps — c9's ARD separation needs "
                         "hyper-distance without hot variational rates)")
    ap.add_argument("--ard-lr", type=float, default=None,
                    help="hot Adam rate for raw_ard ALONE (keeps "
                         "sigma_f^2/noise at the calm hyper rate — "
                         "heating all hypers collapses the kernel "
                         "variance and destroys predictive calibration; "
                         "see results/c9_diag.json)")
    ap.add_argument("--restarts", type=int, default=None,
                    help="override the config's restart count "
                         "(non-convex models keep the best final ELBO)")
    ap.add_argument("--stop-after", type=int, default=None,
                    help="stop the SVI minibatch loop after this many "
                         "steps (schedules still built for --steps; "
                         "pairs with --ckpt-every/--resume for "
                         "interruption-and-resume)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint: the generic "
                         "SVI loop restores <out>/ckpt (pairs with "
                         "--ckpt-every; bit-identical continuation), the "
                         "staged dp_svi recipe restarts at the first "
                         "incomplete stage from <out>/stages")
    ap.add_argument("--staged", choices=("on", "off"), default=None,
                    help="mrd_svi: override ExperimentConfig.staged "
                         "(two-phase structure-then-recalibrate recipe, "
                         "train/mrd_recipe.py)")
    ap.add_argument("--inject-nonfinite-at", type=int, default=None,
                    metavar="STEP",
                    help="fault injection (tests): treat chunk losses "
                         "as NaN from this global step on, exercising "
                         "the K-consecutive-non-finite abort path "
                         "without waiting for a real divergence")
    ap.add_argument("--stream", action="store_true",
                    help="SVI configs: feed minibatches through the "
                         "host streaming input pipeline (data/stream.py "
                         "mmap + async C++ gather) instead of keeping Y "
                         "device-resident — the beyond-HBM-N path; "
                         "composes with --mesh (chunks land pre-sharded "
                         "over the data axis)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import optax

    from dp_gp_lvm_tpu.core import config as config_lib
    from dp_gp_lvm_tpu.data import mocap, oil_flow, synthetic
    from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm, mrd, prediction
    from dp_gp_lvm_tpu.train import checkpoint as ckpt_lib
    from dp_gp_lvm_tpu.train.logging import JsonlLogger
    from dp_gp_lvm_tpu.train.loop import (
        init_state,
        make_multi_step_fn,
        make_step_fn,
        time_steps,
    )

    cfg = config_lib.get(args.config)
    if args.n or args.restarts or args.lr:
        import dataclasses

        if args.n:
            cfg = dataclasses.replace(cfg, n=args.n)
        if args.restarts:
            cfg = dataclasses.replace(cfg, restarts=args.restarts)
        if args.lr:
            cfg = dataclasses.replace(cfg, lr=args.lr)
    steps = args.steps or cfg.steps
    dtype = jnp.float64 if args.f64 else jnp.float32
    rng = jax.random.PRNGKey(cfg.seed)

    out_dir = args.out or f"/tmp/dpgp_{cfg.name}"
    os.makedirs(out_dir, exist_ok=True)
    logger = JsonlLogger(os.path.join(out_dir, "train.jsonl"))

    # ---- data -------------------------------------------------------------
    tag = cfg.dataset
    if cfg.dataset == "toy_gplvm":
        Y, _ = synthetic.toy_gplvm(rng, n=cfg.n, d=cfg.d, q_true=2,
                                   q_total=cfg.q, dtype=dtype)
        data = (Y,)
    elif cfg.dataset == "oil_flow":
        Y, labels, tag = oil_flow.load_oil_flow(args.data_dir, dtype=dtype)
        data = (Y,)
    elif cfg.dataset == "two_view":
        # shared-dominant generator (calibration note in core/config.py)
        Y1, Y2, _ = synthetic.two_view(rng, n=cfg.n, d1=cfg.views[0],
                                       d2=cfg.views[1], q_shared=2,
                                       private_weight=0.5, dtype=dtype)
        # strided row holdout for the cross-view prediction metric (the
        # MRD quality gate): every 8th row is test, like config 5.
        import numpy as _np

        keep = _np.ones(Y1.shape[0], bool)
        keep[7::8] = False
        Y1_test, Y2_test = Y1[~keep], Y2[~keep]
        Y1, Y2 = Y1[keep], Y2[keep]
        data = (Y1, Y2)
    elif cfg.dataset == "two_view_big":
        # c9: O(n) RFF two-view draw in the c3 signal regime, +512
        # held-out rows from the SAME draw for the cross-view metric
        n_hold = 512
        Y1, Y2, _ = synthetic.two_view_big(
            rng, n=cfg.n + n_hold, d1=cfg.views[0], d2=cfg.views[1],
            q_shared=2, q_private=1, private_weight=0.5, dtype=dtype,
        )
        Y1_test, Y2_test = Y1[cfg.n:], Y2[cfg.n:]
        Y1, Y2 = Y1[:cfg.n], Y2[:cfg.n]
        tag = "synthetic:two_view_big"
        data = (Y1, Y2)
    elif cfg.dataset == "pose":
        Y, _, _ = synthetic.pose_like(rng, n=cfg.n, dtype=dtype)
        tag = "synthetic:pose_like"
        data = (Y,)
    elif cfg.dataset == "grouped_big":
        # 4 planted output-dim groups, each driven by a different latent
        # dim, at any N (O(n) RFF draw — no (N, N) Cholesky)
        per = cfg.d // 4
        # default per-group noise/lengthscale contrasts (see the
        # generator docstring: latent-subset structure alone stops being
        # identifiable at big N)
        # +512 held-out rows from the SAME function draw (one call, one
        # rng) for the imputation metric; a separate draw would be a
        # different GP sample and unimputable by construction
        n_hold = 512
        Y, group_labels, _ = synthetic.grouped_dims_big(
            rng, n=cfg.n + n_hold,
            dims_per_group=(per, per, per, cfg.d - 3 * per),
            q=cfg.q, dtype=dtype,
        )
        Y, Y_test = Y[:cfg.n], Y[cfg.n:]
        tag = "synthetic:grouped_big"
        data = (Y,)
    elif cfg.dataset == "mocap":
        amc = None
        if args.data_dir:
            amcs = [f for f in os.listdir(args.data_dir)
                    if f.endswith(".amc")]
            amc = os.path.join(args.data_dir, amcs[0]) if amcs else None
        Y, tag = mocap.load_mocap(amc, n=cfg.n, d=cfg.d, dtype=dtype,
                                  rng=rng)
        data = (Y,)
    else:
        raise ValueError(cfg.dataset)

    # ---- model ------------------------------------------------------------
    if cfg.model == "bgplvm":
        mcfg = bgplvm.Config(num_latent=cfg.q, num_inducing=cfg.m,
                             psi2_block=cfg.psi2_block)
        init_fn = lambda k: bgplvm.init_params(k, data[0], mcfg)
        params = init_fn(rng)
        loss_fn = lambda p, y: bgplvm.loss(p, y, mcfg)
        terms_fn = lambda p: bgplvm.elbo_terms(p, data[0], mcfg)
    elif cfg.model == "mrd":
        mcfg = mrd.Config(num_latent=cfg.q, num_inducing=cfg.m,
                          num_views=len(cfg.views),
                          psi2_block=cfg.psi2_block)
        init_fn = lambda k: mrd.init_params(k, list(data), mcfg)
        params = init_fn(rng)
        loss_fn = lambda p, *ys: mrd.loss(p, list(ys), mcfg)
        terms_fn = lambda p: mrd.elbo_terms(p, list(data), mcfg)
    elif cfg.model == "dp_gp_lvm":
        mcfg = dp_gp_lvm.Config(num_latent=cfg.q, num_inducing=cfg.m,
                                truncation=cfg.t, alpha=cfg.alpha,
                                psi2_block=cfg.psi2_block)
        if cfg.missing_fraction > 0:
            # config 5: strided row holdout (every 8th frame) so the metric
            # measures interpolation, not trajectory extrapolation; both
            # splits are re-standardized with TRAIN-split statistics only
            # (standardizing before the split leaks test moments).
            import numpy as _np

            Y_all = _np.asarray(data[0])
            keep = _np.ones(Y_all.shape[0], bool)
            keep[7::8] = False
            Y_train_np, Y_test_np = Y_all[keep], Y_all[~keep]
            mu_tr = Y_train_np.mean(axis=0)
            sd_tr = Y_train_np.std(axis=0) + 1e-8
            Y_train = jnp.asarray((Y_train_np - mu_tr) / sd_tr, dtype)
            Y_test = jnp.asarray((Y_test_np - mu_tr) / sd_tr, dtype)
            data = (Y_train,)
        init_fn = lambda k: dp_gp_lvm.init_params(k, data[0], mcfg)
        params = init_fn(rng)
        loss_fn = lambda p, y: dp_gp_lvm.loss(p, y, mcfg)
        terms_fn = lambda p: dp_gp_lvm.elbo_terms(p, data[0], mcfg)
    elif cfg.model == "svi_gplvm":
        from dp_gp_lvm_tpu.models import svi_gplvm

        mcfg = svi_gplvm.Config(num_latent=cfg.q, num_inducing=cfg.m,
                                batch=args.batch or 1024,
                                psi2_block=cfg.psi2_block,
                                amortized=cfg.amortized,
                                noise_floor=cfg.noise_floor,
                                qx_var_floor=cfg.qx_var_floor)
        if cfg.missing_fraction > 0:
            # same clean protocol as config 5: strided interpolation
            # holdout, train-only standardization
            import numpy as _np

            Y_all = _np.asarray(data[0])
            keep = _np.ones(Y_all.shape[0], bool)
            keep[7::8] = False
            Y_train_np, Y_test_np = Y_all[keep], Y_all[~keep]
            mu_tr = Y_train_np.mean(axis=0)
            sd_tr = Y_train_np.std(axis=0) + 1e-8
            Y_train = jnp.asarray((Y_train_np - mu_tr) / sd_tr, dtype)
            Y_test = jnp.asarray((Y_test_np - mu_tr) / sd_tr, dtype)
            # hold the imputation metric to a bounded row count
            Y_test = Y_test[:256]
            data = (Y_train,)
        init_fn = lambda k: svi_gplvm.init_params(k, data[0], mcfg)
        params = init_fn(rng)
        loss_fn = None          # stochastic: custom minibatch loop below
        from dp_gp_lvm_tpu.models import eval_f64 as _eval_f64

        # final full-N ELBO in HOST float64 (models/eval_f64.py): the
        # round-3 c8 artifact reported +4.56e8 from a single-shot f32
        # reduction over N=131072 — gating metrics must not inherit the
        # training path's precision
        terms_fn = lambda p: {
            "elbo": _eval_f64.elbo_f64(p, data[0], mcfg),
            # trained noise variance: the collapse diagnostic
            "noise": svi_gplvm.constrain(p, mcfg)["noise"],
        }
    elif cfg.model == "mrd_svi":
        from dp_gp_lvm_tpu.models import mrd_svi

        mcfg = mrd_svi.config_from_experiment(cfg, batch=args.batch)
        init_fn = lambda k: mrd_svi.init_params(k, list(data), mcfg)
        params = init_fn(rng)
        loss_fn = None          # stochastic: custom minibatch loop below
        terms_fn = lambda p: {
            "elbo": mrd_svi.elbo(p, list(data), mcfg),
            "noise_min": jnp.min(jnp.stack([
                c["noise"] for c in mrd_svi.constrain_views(p, mcfg)
            ])),
        }
    elif cfg.model == "dp_svi":
        from dp_gp_lvm_tpu.models import dp_svi

        # ard_init ~ 1/Q keeps cold-init kernel distances O(1) so stage-1
        # ARD pruning reaches the data scale within the step budget
        # (dp_svi.Config.ard_init); batch=2048 is the tuned c7 recipe.
        mcfg = dp_svi.Config(num_latent=cfg.q, num_inducing=cfg.m,
                             truncation=cfg.t, alpha=cfg.alpha,
                             batch=args.batch or 2048,
                             psi2_block=cfg.psi2_block,
                             ard_init=1.0 / cfg.q,
                             amortized=cfg.amortized,
                             noise_floor=cfg.noise_floor,
                             qx_var_floor=cfg.qx_var_floor)
        init_fn = lambda k: dp_svi.init_params(k, data[0], mcfg)
        params = init_fn(rng)
        loss_fn = None          # stochastic: custom minibatch loop below
        terms_fn = lambda p: {
            "elbo": dp_svi.elbo(p, data[0], mcfg),
            "noise_min": jnp.min(dp_svi.constrain(p, mcfg)["noise"]),
        }
    else:
        raise ValueError(cfg.model)

    staged_mrd = cfg.model == "mrd_svi" and (
        args.staged == "on" if args.staged is not None else cfg.staged
    )

    mesh = None
    if args.mesh:
        from dp_gp_lvm_tpu.parallel import mesh as mesh_lib, recipe

        d_ax, m_ax = recipe.parse_mesh(args.mesh)
        mesh = mesh_lib.make_mesh(data=d_ax, model=m_ax)
        if loss_fn is not None:
            loss_fn, params, data = recipe.sharded_setup(
                cfg.model, params, data, mcfg, mesh
            )
        elif not (cfg.model == "dp_svi" and mcfg.truncation > 1) and \
                not (cfg.model == "mrd_svi" and staged_mrd):
            params, data = recipe.place_svi(cfg.model, params, data, mesh)
        # staged dp_svi (truncation > 1) defers placement: stage 1 trains
        # a truncation-1 model (atoms can't shard over "model" yet); the
        # split params are placed on the mesh before stage 2 below.
        # staged mrd_svi defers too: the recipe re-inits and places.

    print(f"[{cfg.name}] data={tag} model={cfg.model} steps={steps} "
          f"device={jax.devices()[0].device_kind}"
          + (f" mesh={args.mesh}" if mesh is not None else ""),
          flush=True)

    # ---- train ------------------------------------------------------------
    from dp_gp_lvm_tpu.train.loop import gp_optimizer

    ngd_lr = args.ngd_lr if args.ngd_lr is not None else cfg.ngd_lr
    # Amortized mode: full-rate inducing points cluster under the
    # encoder-compressed latent cloud and drive cond(K_uu) past the f32
    # whitening limit (measured in experiments/debug_c8.py: zmin
    # 1.2 -> 0.16, lambda_min 0.32 -> 1e-4, then the natgrad q(u)
    # recursion diverges). Z at the hyper rate keeps K_uu conditioned
    # AND out-trains frozen Z (-3.4e5 vs -5.3e5 at equal steps).
    slow = frozenset({"z"}) if cfg.amortized else frozenset()
    ard_lr = args.ard_lr if args.ard_lr is not None else cfg.ard_lr
    optimizer = gp_optimizer(params, lr=cfg.lr, hyper_lr=args.hyper_lr,
                             ard_lr=ard_lr, decay_steps=steps,
                             ngd_lr=ngd_lr, slow=slow)

    if cfg.model in ("svi_gplvm", "dp_svi", "mrd_svi"):
        # stochastic minibatch loop: CHUNK steps per dispatch via
        # lax.scan with per-step rng (pattern of experiments/svi_scale.py)
        import optax as _optax

        from dp_gp_lvm_tpu.models import svi_gplvm
        from dp_gp_lvm_tpu.train.loop import TrainState

        # mrd_svi steps take the TUPLE of resident views (aligned rows)
        Y_res = tuple(data) if cfg.model == "mrd_svi" else data[0]
        n_total = data[0].shape[0]
        # minibatch steps are ~1 ms; a small chunk makes the host
        # round-trip the bottleneck on the tunneled TPU (~1.5 s per
        # dispatch), so floor the scan length at 250 there. On CPU the
        # floor only bloats smoke runs (8 fake-device collectives
        # timeshare one core), so honor --log-every directly. Keep at
        # least TWO chunks either way so a timed post-compile chunk
        # exists (a single chunk would divide ~0s elapsed by max(1, 0)
        # and report nonsense rows/s).
        chunk_floor = 250 if jax.devices()[0].platform != "cpu" else 1
        chunk = max(1, min(max(args.log_every, chunk_floor), steps))
        if chunk >= steps:
            chunk = max(1, steps // 2)
        if args.stop_after:
            # per-step keys are chunk-invariant, so shrinking the chunk
            # to hit --stop-after exactly cannot change the trajectory
            chunk = max(1, min(chunk, args.stop_after))

        from dp_gp_lvm_tpu.train.loop import NonFiniteGuard

        def _abort_nonfinite(guard, done):
            """Mark the run failed and exit nonzero (VERDICT r4 weak-4:
            the c9_ardlr run burned 30k NaN steps because nothing
            halted the loop once params were poisoned)."""
            failed = {
                "config": cfg.name,
                "aborted_nonfinite": True,
                "aborted_at_step": int(done),
                "first_nonfinite_step": int(guard.first_bad_step or done),
            }
            with open(os.path.join(out_dir, "result.json"), "w") as fh:
                json.dump(failed, fh, indent=2)
            print(f"[{cfg.name}] ABORT: {guard.k} consecutive scan-chunks "
                  f"with non-finite losses (first bad chunk at step "
                  f"~{guard.first_bad_step}); run marked failed in "
                  f"{out_dir}/result.json", flush=True)
            raise SystemExit(3)

        def _maybe_injected(losses, start_step):
            if args.inject_nonfinite_at is None:
                return losses
            import numpy as _np

            arr = _np.array(losses, dtype=_np.float64)
            k = max(0, args.inject_nonfinite_at - int(start_step))
            if k < arr.shape[0]:
                arr[k:] = _np.nan
            return arr

        def drive(nat_step, state, n_steps, rng_run, Y_cur, label="",
                  ck=None, ckpt_every=0):
            """Run up to n_steps through chunked lax.scan dispatches;
            returns (state, post-compile s/step, wall seconds). Y_cur is
            passed explicitly because the staged recipe re-places the
            dataset on the mesh between stages (train/dp_recipe.py).

            Resume-aware: the loop starts at state.step (0 for a fresh
            state; the restored step after ck.restore), and EVERY STEP's
            rng derives from its global step index (fold_in) — the key
            stream is invariant to the chunk size and to how many times
            the process restarted, so a run interrupted at any
            checkpoint boundary and resumed continues bit-identical to
            an uninterrupted one even across a --log-every change
            (tests/test_resume_cli.py). ck/ckpt_every: save every
            ckpt_every steps (must be a chunk multiple to actually
            fire — run.py warns when it is not).

            Timing uses time.perf_counter (monotonic), never
            time.time: the wall clock inside this VM steps under
            NTP/resume adjustments, and the round-3 c9 artifact shipped
            a 22 ms/step figure whose own perf_counter-based
            train.jsonl showed 2.8 ms (first wall_dt_s even exceeded
            the run's total seconds — impossible without a clock
            step). results/c9_profile.json re-measures the identical
            drive at ~2.7 ms/step."""
            def one(st, step_rng):
                st, metrics = nat_step(st, step_rng, Y_cur)
                return st, metrics["loss"]

            @jax.jit
            def svi_multi(st, start_step):
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rng_run, i)
                )(start_step + jnp.arange(chunk))
                return jax.lax.scan(one, st, keys)

            t0 = time.perf_counter()
            done = int(state.step)
            start = done
            t_post = None
            guard = NonFiniteGuard()
            while done < n_steps:
                state, losses = svi_multi(state, jnp.int32(done))
                jax.block_until_ready(losses)
                if t_post is None:
                    t_post = time.perf_counter()   # exclude the compile chunk
                losses = _maybe_injected(losses, done)
                if guard.update(losses, done):
                    _abort_nonfinite(guard, done + chunk)
                done += chunk
                elbo_now = -float(losses[-1])
                logger.log(done - 1, elbo_estimate=elbo_now)
                print(f"  {label}step {done - 1}: "
                      f"elbo_estimate={elbo_now:.4g}", flush=True)
                if ck is not None and ckpt_every and \
                        done % ckpt_every == 0:
                    ck.save(state)
            timed_steps = done - start - chunk   # post-compile steps
            per_step = ((time.perf_counter() - t_post) / timed_steps
                        if timed_steps > 0 else float("nan"))
            return state, per_step, time.perf_counter() - t0

        # q(u) by stochastic natural gradient (measured ahead of Adam
        # at this scale for every rho in 0.05-0.5 —
        # results/svi_natgrad.json); hypers/latents by gradient.
        rng_run = jax.random.PRNGKey(cfg.seed + 100)
        result_extra = {"batch": mcfg.batch}
        restart_elbos = []
        if cfg.model == "dp_svi" and mcfg.truncation > 1:
            # SPLIT-INIT staged recipe, as a library call — schedule,
            # rationale (every stage ordering is a measured necessity),
            # stage-boundary checkpoints and resume all live in
            # train/dp_recipe.py. Boundary params always save to
            # <out>/stages; --resume restarts at the first incomplete
            # stage and finishes bit-identical to an uninterrupted run.
            from dp_gp_lvm_tpu.train import dp_recipe

            state, optimizer, rinfo = dp_recipe.staged_dp_svi(
                rng, rng_run, Y_res, mcfg, n_total,
                steps=steps, chunk=chunk, lr=cfg.lr, ngd_lr=ngd_lr,
                drive=drive, mesh=mesh,
                ckpt_dir=os.path.join(out_dir, "stages"),
                resume=args.resume,
            )
            per_step = rinfo.pop("per_step")
            total = rinfo.pop("seconds")
            result_extra.update(rinfo)
        elif staged_mrd:
            # two-phase structure-then-recalibrate recipe as a library
            # call (train/mrd_recipe.py): hot-hyper ARD separation,
            # then frozen-ARD variance-reset calm recalibration —
            # single-phase c9 runs either stay flat (calm) or end
            # overconfident (hot); results/c9_diag.json.
            from dp_gp_lvm_tpu.train import mrd_recipe

            state, optimizer, rinfo = mrd_recipe.staged_mrd_svi(
                rng, rng_run, Y_res, mcfg, n_total,
                steps=steps, chunk=chunk, lr=cfg.lr, drive=drive,
                mesh=mesh, ckpt_dir=os.path.join(out_dir, "stages"),
                resume=args.resume,
            )
            per_step = rinfo.pop("per_step")
            total = rinfo.pop("seconds")
            result_extra.update(rinfo)
        else:
            if cfg.model == "dp_svi":
                from dp_gp_lvm_tpu.models import dp_svi

                nat_step = dp_svi.make_dp_svi_step(
                    mcfg, n_total, optimizer, rho=0.3, rho_phi=0.1,
                    mesh=mesh, streaming=args.stream,
                )
            elif cfg.model == "mrd_svi":
                from dp_gp_lvm_tpu.models import mrd_svi

                nat_step = mrd_svi.make_svi_natgrad_step(
                    mcfg, n_total, optimizer, rho=0.2, mesh=mesh,
                    streaming=args.stream,
                    qu_trust=100.0 if cfg.amortized else None,
                )
            else:
                nat_step = svi_gplvm.make_svi_natgrad_step(
                    mcfg, n_total, optimizer, rho=0.2, mesh=mesh,
                    streaming=args.stream,
                    qu_trust=100.0 if cfg.amortized else None,
                )
            rng_run, r1 = jax.random.split(rng_run)
            if args.stream:
                # host streaming pipeline: Y lives in an mmap'd file,
                # the C++ worker gathers chunk k+1 while the device
                # runs chunk k (identical math to the resident path —
                # tests/test_stream.py)
                import numpy as _np

                from dp_gp_lvm_tpu.data import stream as _stream
                from dp_gp_lvm_tpu.train.loop import (
                    make_streaming_scan_fn,
                )

                # mrd_svi streams ONE concatenated (N, sum D_v) matrix;
                # the step splits columns back via Config.view_dims
                Y_flat = (_np.concatenate(
                    [_np.asarray(y, _np.float32) for y in Y_res], axis=1
                ) if isinstance(Y_res, tuple)
                    else _np.asarray(Y_res, _np.float32))
                y_path = _stream.write_rows(
                    os.path.join(out_dir, "y_stream.f32"), Y_flat,
                )
                scan_chunk = make_streaming_scan_fn(nat_step)
                if mesh is not None:
                    # place each host chunk with the batch rows already
                    # sharded over "data" (the layout the sharded elbo
                    # expects), so the H2D transfer itself is sharded
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    idx_sh = NamedSharding(mesh, P(None, "data"))
                    y_sh = NamedSharding(mesh, P(None, "data", None))
                    put = lambda i, y: (jax.device_put(i, idx_sh),
                                        jax.device_put(y, y_sh))
                else:
                    put = lambda i, y: (jnp.asarray(i), jnp.asarray(y))
                state = init_state(params, optimizer)
                ck_svi = None
                if args.ckpt_every or args.resume:
                    ck_svi = ckpt_lib.Checkpointer(
                        os.path.join(out_dir, "ckpt")
                    )
                if args.resume and ck_svi.latest_step() is not None:
                    state = ck_svi.restore(state)
                    print(f"[{cfg.name}] resumed at step "
                          f"{int(state.step)}", flush=True)
                t0 = time.perf_counter()
                t_post = None
                done = int(state.step)
                start = done
                loop_steps = min(steps, args.stop_after or steps)
                if done % chunk != 0:
                    raise SystemExit(
                        f"--resume at step {done}: the streaming Philox "
                        f"fast-forward needs a chunk-multiple "
                        f"checkpoint (chunk={chunk})"
                    )
                with _stream.ChunkStream(
                    _stream.open_loader(y_path, n_total, Y_flat.shape[1]),
                    batch=mcfg.batch, chunk=chunk, seed=cfg.seed + 7,
                    skip_chunks=done // chunk,
                ) as cs:
                    guard = NonFiniteGuard()
                    while done < loop_steps:
                        idx_c, y_c = cs.next_chunk()
                        # per-step keys by global step index, like the
                        # resident drive (the streaming steps ignore
                        # them — the host stream owns sampling — but
                        # the derivation stays restart-invariant)
                        keys = jax.vmap(
                            lambda i: jax.random.fold_in(rng_run, i)
                        )(done + jnp.arange(chunk))
                        state, losses = scan_chunk(
                            state, keys, *put(idx_c, y_c),
                        )
                        jax.block_until_ready(losses)
                        if t_post is None:
                            t_post = time.perf_counter()
                        losses = _maybe_injected(losses, done)
                        if guard.update(losses, done):
                            _abort_nonfinite(guard, done + chunk)
                        done += chunk
                        elbo_now = -float(losses[-1])
                        logger.log(done - 1, elbo_estimate=elbo_now)
                        print(f"  [stream] step {done - 1}: "
                              f"elbo_estimate={elbo_now:.4g}", flush=True)
                        if ck_svi is not None and args.ckpt_every and \
                                done % args.ckpt_every == 0:
                            ck_svi.save(state)
                if ck_svi is not None:
                    ck_svi.close()
                timed = done - start - chunk
                per_step = ((time.perf_counter() - t_post) / timed
                            if timed > 0 else float("nan"))
                total = time.perf_counter() - t0
                result_extra["streamed"] = True
                result_extra["native_loader"] = _stream.native_available()
            else:
                state0 = init_state(params, optimizer)
                ck_svi = None
                if args.ckpt_every or args.resume:
                    ck_svi = ckpt_lib.Checkpointer(
                        os.path.join(out_dir, "ckpt")
                    )
                if args.resume and ck_svi.latest_step() is not None:
                    state0 = ck_svi.restore(state0)
                    print(f"[{cfg.name}] resumed at step "
                          f"{int(state0.step)}", flush=True)
                loop_steps = min(steps, args.stop_after or steps)
                if loop_steps % chunk != 0:
                    print(f"[{cfg.name}] note: loop runs in scan-chunks "
                          f"of {chunk}; stopping at the next multiple "
                          f"of {chunk} past {loop_steps}", flush=True)
                if args.ckpt_every and args.ckpt_every % chunk != 0:
                    print(f"[{cfg.name}] note: --ckpt-every "
                          f"{args.ckpt_every} is not a multiple of the "
                          f"scan-chunk {chunk}; checkpoints fire only "
                          f"at chunk boundaries divisible by it",
                          flush=True)
                state, per_step, total = drive(
                    nat_step, state0, loop_steps, r1, Y_res,
                    ck=ck_svi, ckpt_every=args.ckpt_every,
                )
                if ck_svi is not None:
                    ck_svi.close()
        rows_per_sec = (round(mcfg.batch / max(per_step, 1e-9))
                        if per_step == per_step else None)
        print(f"[{cfg.name}] done in {total:.1f}s; "
              f"{per_step*1e3:.2f} ms/step (post-compile), "
              f"{rows_per_sec} rows/s", flush=True)
        result_extra["rows_per_sec"] = rows_per_sec
    else:
        result_extra = {}

    step_fn = make_step_fn(loss_fn, optimizer, donate=False) \
        if loss_fn is not None else None

    ck = ckpt_lib.Checkpointer(os.path.join(out_dir, "ckpt")) \
        if (args.ckpt_every and loss_fn is not None) else None
    # scan-based chunks: one host<->device round trip per log interval
    # (interactive dispatch to the tunneled TPU costs ~1s per call; the
    # reference-style step-per-session.run loop would be latency-bound)
    chunk = max(1, min(args.log_every, steps))
    multi_step = make_multi_step_fn(loss_fn, optimizer, num_inner=chunk) \
        if loss_fn is not None else None

    def train_from(p0, label=""):
        state = init_state(p0, optimizer)
        done = 0
        while done < steps:
            state, losses = multi_step(state, *data)
            done += chunk
            elbo_now = -float(losses[-1])
            logger.log(done - 1, elbo=elbo_now)
            print(f"  step {done - 1}{label}: elbo={elbo_now:.3f}",
                  flush=True)
            if ck and args.ckpt_every and done % args.ckpt_every == 0:
                ck.save(state)
        return state, elbo_now

    # Non-convex models (MRD especially: the "independent encodings"
    # optimum kills cross-view transfer) train from cfg.restarts init
    # seeds; keep the best final ELBO. The compiled multi_step is reused
    # across restarts — only the first pays the compile.
    if loss_fn is not None:
        t0 = time.perf_counter()
        state, best_elbo = train_from(
            params, " [r0]" if cfg.restarts > 1 else ""
        )
        restart_elbos = [best_elbo]
        for r in range(1, cfg.restarts):
            p_r = init_fn(jax.random.PRNGKey(cfg.seed + r))
            if mesh is not None:
                _, p_r, _ = recipe.sharded_setup(
                    cfg.model, p_r, data, mcfg, mesh
                )
            state_r, elbo_r = train_from(p_r, f" [r{r}]")
            restart_elbos.append(elbo_r)
            if elbo_r > best_elbo:
                state, best_elbo = state_r, elbo_r
        total = time.perf_counter() - t0
        if cfg.restarts > 1:
            print(f"[{cfg.name}] restart elbos: "
                  f"{[round(e, 2) for e in restart_elbos]} -> best "
                  f"{best_elbo:.2f}", flush=True)
        per_step, state = time_steps(step_fn, state, data, num_steps=10)
        print(f"[{cfg.name}] done in {total:.1f}s; "
              f"{per_step*1e3:.2f} ms/step (post-compile)", flush=True)

    # ---- final metrics & export ------------------------------------------
    if mesh is not None:
        # Pull the trained params off the mesh: every consumer below
        # (metrics, imputation, plots, npz export) is a pure read of
        # the tiny param pytree, and single-device metric programs
        # avoid a second round of multi-device GSPMD compiles (each
        # sharded-metric compile costs ~10 min on the fake-device CPU
        # mesh; the math is identical either way).
        state = state._replace(
            params=jax.tree.map(
                lambda a: jnp.asarray(jax.device_get(a)), state.params
            )
        )
        data = tuple(jnp.asarray(jax.device_get(y)) for y in data)
    terms = {k: float(v) for k, v in terms_fn(state.params).items()
             if jnp.ndim(v) == 0}
    result = {"config": cfg.name, "data": tag, "steps": steps,
              "seconds": round(total, 2),
              # None (valid JSON), not NaN, when no post-compile chunk
              # was timed (e.g. --resume of an already-complete run)
              "ms_per_step": (round(per_step * 1e3, 3)
                              if per_step == per_step else None),
              **terms, **result_extra}
    if cfg.restarts > 1:
        result["restart_elbos"] = [round(e, 3) for e in restart_elbos]

    if cfg.model == "bgplvm" and cfg.dataset == "toy_gplvm":
        # ARD-pruning gate (SURVEY.md section 7 minimum slice): the toy
        # generator drives Y with the FIRST 2 latent dims only; the
        # learned ARD weights must pick exactly those out of cfg.q.
        ard = jnp.asarray(bgplvm.constrain(state.params)["ard"])
        order = jnp.argsort(-ard)
        top2 = set(int(i) for i in order[:2])
        active = ard[jnp.array([0, 1])]
        inactive = ard[jnp.arange(2, ard.shape[0])]
        result["ard_weights"] = [round(float(a), 6) for a in ard]
        result["ard_recall_top2"] = len(top2 & {0, 1}) / 2.0
        result["ard_separation_ratio"] = float(
            jnp.min(active) / jnp.maximum(jnp.max(inactive), 1e-12)
        )
        print(f"[{cfg.name}] ard={result['ard_weights']} "
              f"recall={result['ard_recall_top2']} "
              f"sep={result['ard_separation_ratio']:.1f}", flush=True)

    if cfg.model == "mrd":
        # cross-view prediction on the held-out rows: observe view 0,
        # predict view 1; mean-baseline = predicting the train mean (the
        # views are standardized on the full series, so this is ~unit MSE).
        t_pred = time.perf_counter()
        mean, var, *_ = prediction.predict_view_from_views(
            state.params, list(data), mcfg,
            observed={0: Y1_test}, target_view=1, num_steps=400,
        )
        pred_s = time.perf_counter() - t_pred
        ones = jnp.ones_like(Y2_test)
        mse = float(jnp.mean((mean - Y2_test) ** 2))
        base = float(jnp.mean((data[1].mean(axis=0) - Y2_test) ** 2))
        pll = float(prediction.gaussian_predictive_loglik(
            Y2_test, mean, var, ones) / ones.size)
        rel = mrd.ard_relevance(state.params)
        result["cross_view_mse"] = mse
        result["cross_view_mse_baseline"] = base
        result["cross_view_mse_ratio"] = mse / base
        result["cross_view_pll_per_dim"] = pll
        result["cross_view_seconds"] = round(pred_s, 3)
        result["calibration_ratio"] = mse / float(jnp.mean(var))
        # shared/private signature: per-view ARD weights (V, Q)
        result["ard_relevance"] = [
            [round(float(a), 6) for a in row] for row in rel
        ]
        result["ard_cross_private_ratio"] = ard_cross_private_ratio(rel)
        print(f"[{cfg.name}] cross-view mse={mse:.4f} "
              f"(baseline {base:.4f}, ratio {mse/base:.3f}) pll={pll:.4f} "
              f"sig={result['ard_cross_private_ratio']:.4f}",
              flush=True)

    if cfg.model == "mrd_svi":
        # cross-view prediction on the held-out rows, served from the
        # explicit q(u^v) alone (no training data at serving time —
        # unlike the collapsed-mrd branch above, which rebuilds
        # posterior caches from full-batch statistics)
        from dp_gp_lvm_tpu.models import mrd_svi

        t_pred = time.perf_counter()
        mean, var, *_ = mrd_svi.cross_view_predict(
            state.params, {0: Y1_test}, 1, mcfg, num_steps=300,
        )
        jax.block_until_ready(mean)
        pred_s = time.perf_counter() - t_pred
        ones = jnp.ones_like(Y2_test)
        mse = float(jnp.mean((mean - Y2_test) ** 2))
        base = float(jnp.mean((data[1].mean(axis=0) - Y2_test) ** 2))
        pll = float(prediction.gaussian_predictive_loglik(
            Y2_test, mean, var, ones) / ones.size)
        rel = mrd_svi.ard_relevance(state.params)
        result["cross_view_mse"] = mse
        result["cross_view_mse_baseline"] = base
        result["cross_view_mse_ratio"] = mse / base
        result["cross_view_pll_per_dim"] = pll
        result["cross_view_seconds"] = round(pred_s, 3)
        # calibration (VERDICT r4 item 7): mean squared error over mean
        # predictive variance — ~1 when honest; c9's round-4
        # overconfidence showed here as 17.8 long before PLL caught it
        result["calibration_ratio"] = mse / float(jnp.mean(var))
        result["ard_relevance"] = [
            [round(float(a), 6) for a in row] for row in rel
        ]
        result["ard_cross_private_ratio"] = ard_cross_private_ratio(rel)
        print(f"[{cfg.name}] cross-view mse={mse:.4f} "
              f"(baseline {base:.4f}, ratio {mse/base:.3f}) pll={pll:.4f} "
              f"calib={result['calibration_ratio']:.2f} "
              f"sig={result['ard_cross_private_ratio']:.4f} "
              f"({pred_s:.1f}s, served from q(u) alone)", flush=True)

    if cfg.model == "dp_gp_lvm" and cfg.missing_fraction > 0:
        d = Y_test.shape[1]
        n_miss = int(d * cfg.missing_fraction)
        mask = jnp.ones((Y_test.shape[0], d), dtype).at[:, -n_miss:].set(0.0)
        t_imp = time.perf_counter()
        mean, var, *_ = prediction.impute_dp(
            state.params, Y_train, mcfg, Y_test, mask, num_steps=200
        )
        jax.block_until_ready(mean)
        imp_s = time.perf_counter() - t_imp
        miss = 1.0 - mask
        mse = float(jnp.sum(((mean - Y_test) ** 2) * miss) / jnp.sum(miss))
        pll = float(prediction.gaussian_predictive_loglik(
            Y_test, mean, var, miss) / jnp.sum(miss))
        result["imputation_mse"] = mse
        result["predictive_loglik_per_dim"] = pll
        # masked err^2 over masked predictive variance (~1 = honest)
        result["calibration_ratio"] = mse / float(
            jnp.sum(var * miss) / jnp.sum(miss)
        )
        result["imputation_seconds"] = round(imp_s, 3)
        result["imputation_rows"] = int(Y_test.shape[0])
        print(f"[{cfg.name}] imputation mse={mse:.4f} pll={pll:.4f} "
              f"({imp_s:.2f}s for {Y_test.shape[0]} rows)", flush=True)

    if cfg.model == "svi_gplvm" and cfg.missing_fraction > 0:
        from dp_gp_lvm_tpu.models import svi_gplvm

        d = Y_test.shape[1]
        n_miss = int(d * cfg.missing_fraction)
        mask = jnp.ones((Y_test.shape[0], d), dtype).at[:, -n_miss:].set(0.0)
        t_imp = time.perf_counter()
        mean, var, *_ = svi_gplvm.impute(
            state.params, Y_test, mask, mcfg, num_steps=200
        )
        jax.block_until_ready(mean)
        imp_s = time.perf_counter() - t_imp
        miss = 1.0 - mask
        mse = float(jnp.sum(((mean - Y_test) ** 2) * miss) / jnp.sum(miss))
        pll = float(prediction.gaussian_predictive_loglik(
            Y_test, mean, var, miss) / jnp.sum(miss))
        result["imputation_mse"] = mse
        result["predictive_loglik_per_dim"] = pll
        # masked err^2 over masked predictive variance (~1 = honest)
        result["calibration_ratio"] = mse / float(
            jnp.sum(var * miss) / jnp.sum(miss)
        )
        result["imputation_seconds"] = round(imp_s, 3)
        result["imputation_rows"] = int(Y_test.shape[0])
        print(f"[{cfg.name}] imputation mse={mse:.4f} pll={pll:.4f} "
              f"({imp_s:.2f}s for {Y_test.shape[0]} rows, served from "
              f"q(u) alone)", flush=True)

    if cfg.model == "dp_svi" and cfg.dataset == "grouped_big":
        # mixture imputation on the held-out rows: observe the even
        # dims (every group keeps observed dims, so its latent stays
        # identifiable), impute the odd dims from the phi-weighted
        # per-atom q(u|t) mixture (dp_svi.impute)
        from dp_gp_lvm_tpu.models import dp_svi as _dps

        mask = jnp.zeros_like(Y_test).at[:, ::2].set(1.0)
        t_imp = time.perf_counter()
        mean, var, *_ = _dps.impute(
            state.params, Y_test, mask, mcfg, num_steps=200
        )
        jax.block_until_ready(mean)
        imp_s = time.perf_counter() - t_imp
        miss = 1.0 - mask
        mse = float(jnp.sum(((mean - Y_test) ** 2) * miss)
                    / jnp.sum(miss))
        base = float(jnp.sum((Y_test ** 2) * miss) / jnp.sum(miss))
        pll = float(prediction.gaussian_predictive_loglik(
            Y_test, mean, var, miss) / jnp.sum(miss))
        result["imputation_mse"] = mse
        result["imputation_mse_baseline"] = base
        result["predictive_loglik_per_dim"] = pll
        result["calibration_ratio"] = mse / float(
            jnp.sum(var * miss) / jnp.sum(miss)
        )
        result["imputation_seconds"] = round(imp_s, 3)
        result["imputation_rows"] = int(Y_test.shape[0])
        print(f"[{cfg.name}] imputation mse={mse:.4f} "
              f"(baseline {base:.4f}) pll={pll:.4f} "
              f"({imp_s:.2f}s, {Y_test.shape[0]} rows, phi-mixture "
              f"from q(u|t) alone)", flush=True)

        # planted-group recovery at scale: every planted group of output
        # dims should concentrate on one atom (purity per group), and
        # distinct groups on distinct atoms (the count of atoms covering
        # all groups' argmaxes)
        import numpy as _np

        from dp_gp_lvm_tpu.models import dp_svi

        phi = _np.asarray(dp_svi.expected_assignments(state.params))
        hard = phi.argmax(axis=1)
        lab = _np.asarray(group_labels)
        purities, tops = [], []
        for g in _np.unique(lab):
            counts = _np.bincount(hard[lab == g], minlength=phi.shape[1])
            purities.append(counts.max() / counts.sum())
            tops.append(int(counts.argmax()))
        result["group_purity_min"] = float(min(purities))
        result["group_purities"] = [round(float(p), 4) for p in purities]
        result["distinct_atoms_for_groups"] = len(set(tops))
        result["num_groups"] = int(len(_np.unique(lab)))
        print(f"[{cfg.name}] group purities={result['group_purities']} "
              f"distinct atoms={result['distinct_atoms_for_groups']}/"
              f"{result['num_groups']}", flush=True)

    from dp_gp_lvm_tpu.train.checkpoint import export_npz

    if cfg.model == "bgplvm":
        export_npz(os.path.join(out_dir, "params.npz"),
                   bgplvm.constrain(state.params))
    elif cfg.model == "dp_gp_lvm":
        export_npz(os.path.join(out_dir, "params.npz"),
                   dp_gp_lvm.constrain(state.params))
    elif cfg.model == "dp_svi":
        export_npz(os.path.join(out_dir, "params.npz"),
                   dict(state.params))
    elif cfg.model == "mrd":
        # RAW params: the cross-view serving entry
        # (prediction.predict_view_from_views) takes raw leaves — the
        # export feeds experiments/c3_serving_sweep.py directly.
        export_npz(os.path.join(out_dir, "params.npz"),
                   dict(state.params))
    elif cfg.model in ("svi_gplvm", "mrd_svi"):
        # RAW params (like dp_svi): the SVI serving entry points
        # (impute / cross_view_predict / the serving factories) take
        # raw leaves and constrain internally, so the export must be
        # loadable straight into them (experiments/c9_eval_sweep.py).
        export_npz(os.path.join(out_dir, "params.npz"),
                   dict(state.params))

    if args.plots:
        from dp_gp_lvm_tpu import viz

        if "qx_mean" in state.params:
            qx = state.params["qx_mean"]
        else:                      # amortized: encode (capped) train rows
            from dp_gp_lvm_tpu.models import amortized

            y_enc = (jnp.concatenate([y[:4096] for y in data], axis=1)
                     if len(data) > 1 else jnp.asarray(data[0][:4096]))
            qx, _ = amortized.encode(state.params, y_enc)
        viz.plot_latent_scatter(
            qx, path=os.path.join(out_dir, "latent.png")
        )
        if cfg.model == "bgplvm":
            viz.plot_ard_weights(
                bgplvm.constrain(state.params)["ard"],
                path=os.path.join(out_dir, "ard.png"),
            )
        elif cfg.model == "mrd":
            viz.plot_ard_weights(
                mrd.ard_relevance(state.params),
                path=os.path.join(out_dir, "ard.png"),
            )
        elif cfg.model == "mrd_svi":
            from dp_gp_lvm_tpu.models import mrd_svi

            viz.plot_ard_weights(
                mrd_svi.ard_relevance(state.params),
                path=os.path.join(out_dir, "ard.png"),
            )
        elif cfg.model == "dp_gp_lvm":
            hyp = dp_gp_lvm.constrain(state.params)
            viz.plot_ard_weights(
                hyp["ard"], path=os.path.join(out_dir, "ard.png")
            )
            viz.plot_assignment_matrix(
                hyp["phi"], path=os.path.join(out_dir, "assignments.png")
            )
            if hyp["gamma1"].size:
                viz.plot_stick_weights(
                    hyp["gamma1"], hyp["gamma2"],
                    path=os.path.join(out_dir, "sticks.png"),
                )
        print(f"plots saved to {out_dir}", flush=True)

    with open(os.path.join(out_dir, "result.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))
    if ck:
        ck.close()

    if args.check:
        failures = config_lib.evaluate_checks(cfg.name, result)
        gates = config_lib.CHECKS.get(cfg.name, {})
        if failures:
            print(f"[{cfg.name}] REGRESSION GATES FAILED:", flush=True)
            for f in failures:
                print(f"  FAIL {f}", flush=True)
            sys.exit(1)
        print(f"[{cfg.name}] all {len(gates)} regression gates pass",
              flush=True)


if __name__ == "__main__":
    main()
