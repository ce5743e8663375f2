"""Round-4 (verdict weak-2): why does c9 learn NO shared/private ARD
signature, and what fixes it?

Hypothesis: the RESIDENT q(X) table is under-trained at big N — c9's
4000 steps x batch 1024 / N 131072 give each row ~31 Adam updates, so
the latents never leave PCA init (which mixes shared and private
directions of the concatenated views), and per-view ARD sees every
latent dim carrying signal -> flat relevance (the committed round-3
artifact: all weights ~0.63). The AMORTIZED encoder shares its
parameters across rows — every step improves the latent map for ALL N
rows — so structure can form in few epochs.

This script trains mrd_svi on two_view_big data at reduced scale under
a ladder of variants and reports each one's learned relevance signature:

    sig_v = ard_v[other view's private dim] / mean(ard_v[shared dims])

(the generator's truth: 0 exactly; flat relevance: 1). Variants:
  resident        — the round-3 c9 recipe as committed
  resident_longer — same, 4x steps (tests the under-training hypothesis
                    directly: more updates/row, same recipe)
  amortized       — encoder q(X) + the round-4 stability kit
                    (qx_var_floor, noise_floor, slow-Z, qu_trust)

Writes results/c9_structure.json; the winner becomes the c9 config and
the relevance-signature gate (CHECKS) derives from its headroom.

Usage: python experiments/c9_structure.py [--n 8192] [--steps 2000]
(CPU-runnable at the default scale; the conclusions transfer because
the updates-per-row ratio, not N itself, is the controlled variable.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import mrd_svi
from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state


def signature(ard):
    """(V, Q) relevance -> per-view cross-private ratio (lower=better).
    Latent dims are ranked per view: the two strongest are 'shared', the
    weakest is the candidate pruned (cross-private) dim."""
    out = []
    for v in range(ard.shape[0]):
        w = np.sort(np.asarray(ard[v]))[::-1]
        out.append(float(w[-1] / w[:2].mean()))
    return out


def run_variant(name, Ys, n_total, steps, batch, q, m, lr, amortized,
                chunk=100, opt_kwargs=None):
    cfg = mrd_svi.Config(
        num_latent=q, num_inducing=m, num_views=len(Ys), batch=batch,
        psi2_block=8192, amortized=amortized,
        noise_floor=1e-3 if amortized else 0.0,
        qx_var_floor=1e-2 if amortized else 0.0,
    )
    params = mrd_svi.init_params(jax.random.PRNGKey(2), list(Ys), cfg)
    slow = frozenset({"z"}) if amortized else frozenset()
    opt = gp_optimizer(params, lr=lr, decay_steps=steps, slow=slow,
                       **(opt_kwargs or {}))
    step = mrd_svi.make_svi_natgrad_step(
        cfg, n_total, opt, rho=0.2,
        qu_trust=100.0 if amortized else None,
    )
    state = init_state(params, opt)
    rng_run = jax.random.PRNGKey(100)

    def one(st, step_rng):
        st, metrics = step(st, step_rng, Ys)
        return st, metrics["loss"]

    @jax.jit
    def multi(st, start):
        keys = jax.vmap(lambda i: jax.random.fold_in(rng_run, i))(
            start + jnp.arange(chunk)
        )
        return jax.lax.scan(one, st, keys)

    t0 = time.perf_counter()
    done = 0
    last = None
    nonfinite_chunks = 0
    while done < steps:
        state, losses = multi(state, jnp.int32(done))
        done += chunk
        if not bool(np.all(np.isfinite(np.asarray(losses)))):
            nonfinite_chunks += 1
        last = float(losses[-1])
    jax.block_until_ready(state.params["views"][0]["u_mean"])
    ard = np.asarray(mrd_svi.ard_relevance(state.params))
    sig = signature(ard)
    row = {
        "steps": steps, "updates_per_row": steps * batch / n_total,
        "amortized": amortized, "final_loss": last,
        "nonfinite_chunks": nonfinite_chunks,
        "ard_relevance": np.round(ard, 4).tolist(),
        "cross_private_ratio": [round(s, 4) for s in sig],
        "seconds": round(time.perf_counter() - t0, 1),
    }
    print(f"{name:16s} ratio={sig} ard={np.round(ard, 3).tolist()}",
          flush=True)
    return row


def serve_eval(params, cfg, Y1_test, Y2_test, Y2_train_mean):
    """Cross-view serving metrics at proxy scale (observe view 0,
    predict view 1) — the calibration read the staged recipe exists
    for."""
    from dp_gp_lvm_tpu.models import prediction

    mean, var, *_ = mrd_svi.cross_view_predict(
        params, {0: Y1_test}, 1, cfg, num_steps=300,
    )
    ones = jnp.ones_like(Y2_test)
    mse = float(jnp.mean((mean - Y2_test) ** 2))
    base = float(jnp.mean((Y2_train_mean - Y2_test) ** 2))
    pll = float(prediction.gaussian_predictive_loglik(
        Y2_test, mean, var, ones) / ones.size)
    return {
        "mse_ratio": round(mse / base, 4),
        "pll_per_dim": round(pll, 4),
        "calibration_ratio": round(mse / float(jnp.mean(var)), 3),
        "pred_var_mean": round(float(jnp.mean(var)), 4),
    }


def run_staged(name, Ys, n_total, steps, batch, q, m, lr, holdout,
               chunk=100):
    """Drive the PRODUCTION two-phase recipe (train/mrd_recipe.py) at
    proxy scale and read both the structure signature and the serving
    calibration it exists to reconcile."""
    from dp_gp_lvm_tpu.train import mrd_recipe

    cfg = mrd_svi.Config(
        num_latent=q, num_inducing=m, num_views=len(Ys), batch=batch,
        psi2_block=8192,
    )
    nonfinite = {"chunks": 0}

    def drive(step_fn, state, n_steps, rng_d, Y_cur, label="",
              ck=None, ckpt_every=0):
        def one(st, r):
            st, mm = step_fn(st, r, Y_cur)
            return st, mm["loss"]

        @jax.jit
        def multi(st, start):
            keys = jax.vmap(lambda i: jax.random.fold_in(rng_d, i))(
                start + jnp.arange(chunk)
            )
            return jax.lax.scan(one, st, keys)

        t0 = time.perf_counter()
        done = int(state.step)
        while done < n_steps:
            state, losses = multi(state, jnp.int32(done))
            done += chunk
            if not bool(np.all(np.isfinite(np.asarray(losses)))):
                nonfinite["chunks"] += 1
        jax.block_until_ready(losses)
        return state, float("nan"), time.perf_counter() - t0

    t0 = time.perf_counter()
    state, _, info = mrd_recipe.staged_mrd_svi(
        jax.random.PRNGKey(2), jax.random.PRNGKey(100), Ys, cfg,
        n_total, steps=steps, chunk=chunk, lr=lr, drive=drive,
    )
    ard = np.asarray(mrd_svi.ard_relevance(state.params))
    sig = signature(ard)
    Y1_test, Y2_test = holdout
    row = {
        "steps": steps, "recipe": info["recipe"],
        "phase_a_steps": info["phase_a_steps"],
        "phase_b_steps": info["phase_b_steps"],
        "nonfinite_chunks": nonfinite["chunks"],
        "ard_relevance": np.round(ard, 4).tolist(),
        "cross_private_ratio": [round(s, 4) for s in sig],
        "serving": serve_eval(state.params, cfg, Y1_test, Y2_test,
                              Ys[1].mean(axis=0)),
        "seconds": round(time.perf_counter() - t0, 1),
    }
    print(f"{name:16s} ratio={sig} serving={row['serving']}", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="results/c9_structure.json")
    ap.add_argument("--variants", default="resident,resident_longer,amortized")
    args = ap.parse_args()

    # same generator family/regime as c9 (q_shared=2, q_private=1, w=0.5);
    # +512 held-out rows for the staged variant's serving read
    n_hold = 512
    Y1, Y2, _ = synthetic.two_view_big(
        jax.random.PRNGKey(42), n=args.n + n_hold, d1=32, d2=32,
        dtype=jnp.float32,
    )
    holdout = (Y1[args.n:], Y2[args.n:])
    Y1, Y2 = Y1[: args.n], Y2[: args.n]
    Ys = (Y1, Y2)
    q = 4

    # merge into an existing artifact so variant batches accumulate
    rows = {}
    if os.path.exists(args.out):
        rows = json.load(open(args.out)).get("rows", {})
    for v in args.variants.split(","):
        if v == "resident":
            rows[v] = run_variant(v, Ys, args.n, args.steps, args.batch,
                                  q, args.m, args.lr, amortized=False)
        elif v == "resident_longer":
            rows[v] = run_variant(v, Ys, args.n, 4 * args.steps,
                                  args.batch, q, args.m, args.lr,
                                  amortized=False)
        elif v == "amortized":
            rows[v] = run_variant(v, Ys, args.n, args.steps, args.batch,
                                  q, args.m, args.lr, amortized=True)
        elif v == "resident_hot":
            # c3's collapsed recipe recovers structure at lr=2e-2 while
            # every 3e-3 variant above stays flat: test lr as the dial
            # (hypers ride at lr/10, so this is also ~7x faster ARD)
            rows[v] = run_variant(v, Ys, args.n, args.steps, args.batch,
                                  q, args.m, 2e-2, amortized=False)
        elif v == "amortized_hot":
            rows[v] = run_variant(v, Ys, args.n, args.steps, args.batch,
                                  q, args.m, 2e-2, amortized=True)
        elif v == "warmup_ard":
            # VERDICT r4 item 4: the hot-ARD path under the (now
            # default) warmup schedule must train NaN-free to
            # separation — the cold-start mode NaN'd within 250 steps
            # at c9 scale (deleted results/c9_ardlr)
            rows[v] = run_variant(
                v, Ys, args.n, args.steps, args.batch, q, args.m,
                args.lr, amortized=False,
                opt_kwargs={"ard_lr": 3e-2, "ngd_lr": 1.0},
            )
        elif v == "warmup_ard_gentle":
            # the 3e-2 peak above ends separated but logs 6/20 transient
            # non-finite chunks (skipped by apply_if_finite); this
            # half-peak, 3x-longer-ramp variant probes whether the dial
            # can run CLEAN at proxy scale
            rows[v] = run_variant(
                v, Ys, args.n, args.steps, args.batch, q, args.m,
                args.lr, amortized=False,
                opt_kwargs={"ard_lr": 1.5e-2, "ngd_lr": 1.0,
                            "ard_warmup": 600},
            )
        elif v == "staged":
            rows[v] = run_staged(v, Ys, args.n, args.steps, args.batch,
                                 q, args.m, args.lr, holdout)
        else:
            raise SystemExit(f"unknown variant {v}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"n": args.n, "batch": args.batch,
                   "generator": "two_view_big(q_shared=2, q_private=1, w=0.5)",
                   "true_cross_private_ratio": 0.0,
                   "device": jax.devices()[0].platform,
                   "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
