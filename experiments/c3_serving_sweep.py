"""Attack c3's cross-view gap from the INFERENCE side (VERDICT r4 item 6).

The committed c3 artifact predicts the held-out view at mse_ratio 0.62
against a true-latent oracle of 0.485 (results/mrd_ceiling.json); every
dial swept so far (results/c3_ngd_sweep.json) was a TRAINING dial and
landed in 0.62-0.65, so "latent-inference error" was declared on thin
evidence. This script sweeps the TEST-TIME inference dials on the SAME
trained params (results/c3/params.npz, raw mrd leaves from run.py's
export) and the same strided holdout protocol:

  base            — the shipped serving config (nearest-init, 400 Adam
                    steps, constant lr 0.05)
  long            — 4x steps, constant lr (is it under-optimized?)
  long_anneal     — 4x steps, cosine-annealed lr (is it oscillating?)
  restarts        — 5 inits (4-NN latents + prior mean), best PER POINT
                    by the test-time ELBO (is it stuck in local optima?)
  restarts_long_anneal — everything at once (the budget ceiling)

If any variant beats 0.60, the c3 gate tightens; if all land in
0.60-0.65, "irreducible latent-inference error" is EARNED and the
negative result joins results/mrd_ceiling.json.

Writes results/c3_serving_sweep.json.
Usage: python experiments/c3_serving_sweep.py [--npz results/c3/params.npz]
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


def load_params(path):
    raw = dict(np.load(path, allow_pickle=False))
    views = {}
    shared = {}
    for k, v in raw.items():
        if k.startswith("views/"):
            _, idx, leaf = k.split("/", 2)
            views.setdefault(int(idx), {})[leaf] = jnp.asarray(v)
        else:
            shared[k] = jnp.asarray(v)
    out = dict(shared)
    out["views"] = [views[i] for i in sorted(views)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="results/c3/params.npz")
    ap.add_argument("--out", default="results/c3_serving_sweep.json")
    args = ap.parse_args()

    from dp_gp_lvm_tpu.core import config as config_lib
    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import mrd, prediction

    cfg = config_lib.get("c3_mrd_twoview")
    rng = jax.random.PRNGKey(cfg.seed)
    # EXACT run.py two_view protocol: generator regime + every-8th-row
    # strided holdout (experiments/run.py, dataset == "two_view")
    Y1, Y2, _ = synthetic.two_view(
        rng, n=cfg.n, d1=cfg.views[0], d2=cfg.views[1], q_shared=2,
        private_weight=0.5, dtype=jnp.float32,
    )
    keep = np.ones(Y1.shape[0], bool)
    keep[7::8] = False
    Y1_test, Y2_test = Y1[~keep], Y2[~keep]
    Y1, Y2 = Y1[keep], Y2[keep]
    data = [Y1, Y2]

    params = load_params(args.npz)
    mcfg = mrd.Config(num_latent=cfg.q, num_inducing=cfg.m,
                      num_views=len(cfg.views), psi2_block=cfg.psi2_block)

    ones = jnp.ones_like(Y2_test)
    base_mse = float(jnp.mean((Y2.mean(axis=0) - Y2_test) ** 2))

    variants = {
        "base": dict(num_steps=400),
        "long": dict(num_steps=1600),
        "long_anneal": dict(num_steps=1600, anneal=True),
        "restarts": dict(num_steps=400, restarts=4),
        "restarts_long_anneal": dict(num_steps=1600, restarts=4,
                                     anneal=True),
    }
    out = {
        "protocol": "c3_mrd_twoview strided holdout (every 8th row)",
        "npz": args.npz,
        "mse_ratio_oracle_true_latents": 0.4847,
        "mean_baseline_mse": round(base_mse, 4),
        "variants": {},
    }
    for name, kw in variants.items():
        t0 = time.perf_counter()
        mean, var, *_ = prediction.predict_view_from_views(
            params, data, mcfg, observed={0: Y1_test}, target_view=1,
            **kw,
        )
        mse = float(jnp.mean((mean - Y2_test) ** 2))
        pll = float(prediction.gaussian_predictive_loglik(
            Y2_test, mean, var, ones) / ones.size)
        row = {
            **{k: v for k, v in kw.items()},
            "mse_ratio": round(mse / base_mse, 4),
            "pll_per_dim": round(pll, 4),
            "calibration_ratio": round(mse / float(jnp.mean(var)), 3),
            "seconds": round(time.perf_counter() - t0, 1),
        }
        out["variants"][name] = row
        print(f"{name:22s} ratio={row['mse_ratio']:.4f} "
              f"pll={row['pll_per_dim']:.3f} "
              f"calib={row['calibration_ratio']:.2f} "
              f"({row['seconds']}s)", flush=True)

    best = min(out["variants"].items(),
               key=lambda kv: kv[1]["mse_ratio"])
    out["best"] = {"variant": best[0], **best[1]}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}; best={best[0]} "
          f"ratio={best[1]['mse_ratio']}", flush=True)


if __name__ == "__main__":
    main()
