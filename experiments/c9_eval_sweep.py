"""Diagnose c9's cross-view PLL on a TRAINED checkpoint (no retraining).

Round-4 verdict weak-2 follow-up: the hot-lr c9 run recovers the
shared/private ARD signature (sig 0.375) and 372k rows/s, but its
cross-view predictive log-likelihood collapses to -8.3/dim while the
MSE ratio stays 0.665 — overconfident predictive variances. This tool
loads the exported params.npz and sweeps the SERVING-side dials of
mrd_svi.cross_view_predict (latent-fit steps, fit lr, q(x*) variance
init) to locate where the calibration is lost, without touching the
trained model.

Usage:
  python experiments/c9_eval_sweep.py --npz results/c9_hot/params.npz \
      --out results/c9_eval_sweep.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def load_params(path):
    raw = dict(np.load(path, allow_pickle=False))
    # export_npz flattens the pytree with / separators; rebuild the
    # mrd_svi structure: {"views": [ {leaf: arr}, ... ], **shared}
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
    ap.add_argument("--npz", required=True)
    ap.add_argument("--out", default="results/c9_eval_sweep.json")
    ap.add_argument("--rows", type=int, default=512)
    args = ap.parse_args()

    from dp_gp_lvm_tpu.core import config as config_lib
    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import mrd_svi, prediction

    cfg = config_lib.get("c9_mrd_svi_bigN")
    rng = jax.random.PRNGKey(cfg.seed)
    n_hold = 512
    Y1, Y2, _ = synthetic.two_view_big(
        rng, n=cfg.n + n_hold, d1=cfg.views[0], d2=cfg.views[1],
        q_shared=2, q_private=1, private_weight=0.5, dtype=jnp.float32,
    )
    Y1_test, Y2_test = Y1[cfg.n:][: args.rows], Y2[cfg.n:][: args.rows]
    Y2_train_mean = Y2[: cfg.n].mean(axis=0)

    params = load_params(args.npz)
    mcfg = mrd_svi.config_from_experiment(cfg)

    ones = jnp.ones_like(Y2_test)
    base = float(jnp.mean((Y2_train_mean - Y2_test) ** 2))

    def eval_once(num_steps, lr):
        t0 = time.perf_counter()
        mean, var, m_s, s_s, trace = mrd_svi.cross_view_predict(
            params, {0: Y1_test}, 1, mcfg, num_steps=num_steps, lr=lr,
        )
        jax.block_until_ready(mean)
        mse = float(jnp.mean((mean - Y2_test) ** 2))
        pll = float(prediction.gaussian_predictive_loglik(
            Y2_test, mean, var, ones) / ones.size)
        return {
            "num_steps": num_steps, "lr": lr,
            "mse_ratio": mse / base,
            "pll_per_dim": pll,
            "pred_var_mean": float(jnp.mean(var)),
            "pred_var_min": float(jnp.min(var)),
            "sq_err_mean": mse,
            "qx_var_mean_per_dim": [float(v)
                                    for v in jnp.mean(s_s, axis=0)],
            "qx_var_min": float(jnp.min(s_s)),
            "final_objective": float(trace[-1]),
            "seconds": round(time.perf_counter() - t0, 1),
        }

    rows = {}
    for tag, ns, lr in [
        ("asrun_300", 300, 0.05),
        ("long_1000", 1000, 0.05),
        ("long_3000_slow", 3000, 0.02),
    ]:
        rows[tag] = eval_once(ns, lr)
        print(tag, json.dumps(rows[tag]), flush=True)

    # calibration probe: per-dim z-scores under the as-run eval tell
    # whether the variance is globally too small (uniform |z|>>1) or
    # wrong only on specific output dims (private-driven dims)
    mean, var, *_ = mrd_svi.cross_view_predict(
        params, {0: Y1_test}, 1, mcfg, num_steps=300, lr=0.05,
    )
    z2 = (Y2_test - mean) ** 2 / var
    rows["z2_per_dim_asrun"] = [round(float(v), 2)
                                for v in jnp.mean(z2, axis=0)]
    rows["noise_per_view"] = [
        float(jnp.min(c["noise"]))
        for c in mrd_svi.constrain_views(params, mcfg)
    ]

    with open(args.out, "w") as f:
        json.dump({"npz": args.npz, "base_mse": base, "rows": rows},
                  f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
