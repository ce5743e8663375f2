"""Atom-packing analysis for the M=64 utilization question (VERDICT r2
weak item 1 / next-round item 4).

The headline bench row (N=1024, D=60, Q=10, M=64, T=20) runs at ~30-40%
of the geometric K=Q MXU floor; SCALING.md names lane padding as the
cause: at M=64 every (., M) matmul tile fills half of the 128-lane MXU
dimension. The proposed remedy is PACKING — two M=64 atoms sharing the
128 lanes of one tile, with per-lane kernel hyperparameters and the
cross-atom off-diagonal Psi2 blocks computed-and-discarded.

This script measures the question directly, without building the packed
kernel first, via a cost-exact proxy: a DP-GP-LVM step with T/2 atoms at
M=128 performs EXACTLY the arithmetic a packed kernel would (each packed
tile is a full 128x128 Psi2 block of which only the two 64x64 diagonal
blocks are useful; the bound algebra then runs on T/2 chol(128) factors
instead of T chol(64), again matching the packed shapes). If that
configuration is not FASTER than the unpacked T/M row, packing cannot
win: the 2x arithmetic inflation (4x per-tile work, half the atoms) eats
the <=2x lane-utilization gain, and the packed kernel's extra
slicing/masking only adds to it.

Timing rules: axon-relay content cache defeated by chaining params
through the optimizer step (bench.py pattern).

    python experiments/packing_analysis.py --out results/packing_analysis.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, Q = 1024, 60, 10
STEPS = 20


def time_row(t: int, m: int, use_pallas, steps: int = STEPS) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import dp_gp_lvm
    from dp_gp_lvm_tpu.train.loop import gp_optimizer

    config = dp_gp_lvm.Config(
        num_latent=Q, num_inducing=m, truncation=t, psi2_block=None,
        use_pallas=use_pallas,
    )
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.mocap_like(rng, n=N, d=D, dtype=jnp.float32)
    params = dp_gp_lvm.init_params(rng, Y, config)
    optimizer = gp_optimizer(params, lr=1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, Y):
        loss, grads = jax.value_and_grad(dp_gp_lvm.loss)(params, Y, config)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, opt_state, loss = step(params, opt_state, Y)   # compile
    loss.block_until_ready()
    assert bool(jnp.isfinite(loss)), f"non-finite loss at T={t} M={m}"
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, Y)
    loss.block_until_ready()
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/packing_analysis.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rows = []
    for label, t, m, up in (
        ("unpacked T=20 M=64 (auto->XLA; the bench row)", 20, 64, "auto"),
        ("packed-cost proxy T=10 M=128 (auto)", 10, 128, "auto"),
        ("unpacked T=20 M=64 fused-Pallas", 20, 64, True),
        ("packed-cost proxy T=10 M=128 fused-Pallas", 10, 128, True),
    ):
        ms = time_row(t, m, up) * 1e3
        rows.append({"label": label, "t": t, "m": m,
                     "use_pallas": str(up), "ms_per_step": round(ms, 3)})
        print(rows[-1], flush=True)

    base = rows[0]["ms_per_step"]
    packed_best = min(r["ms_per_step"] for r in rows[1:])
    verdict = (
        "packing WINS: build the per-lane packed kernel"
        if packed_best < 0.9 * base
        else "packing cannot win at this row: the packed-cost proxy is "
             "not faster than the unpacked path — the 2x arithmetic "
             "inflation (computed-and-discarded cross-atom blocks) eats "
             "the lane-utilization gain; a real packed kernel adds "
             "slicing on top"
    )
    artifact = {
        "scale": {"n": N, "d": D, "q": Q},
        "device": jax.devices()[0].device_kind,
        "method": "cost-exact proxy: T/2 atoms at M=128 performs the "
                  "packed kernel's arithmetic (full 128-lane tiles, "
                  "2 useful 64x64 diagonal blocks per Psi2 tile)",
        "rows": rows,
        "unpacked_ms": base,
        "best_packed_proxy_ms": packed_best,
        "verdict": verdict,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
