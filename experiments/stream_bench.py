"""Streamed vs resident DP-SVI training throughput (input pipeline).

Measures the cost of the host streaming input pipeline
(native/stream_loader.cpp mmap + GIL-free async gather, chunk-stacked
batches, double buffering — data/stream.py) against the device-resident
baseline (Y in HBM, rows gathered by index inside the jitted step) at a
configurable scale. The question it answers: what fraction of step
throughput does beyond-HBM streaming cost when the gather of chunk k+1
overlaps the device executing chunk k?

Timing discipline (CLAUDE.md): losses chain through the evolving params
across every dispatch, each chunk carries distinct rng folds and (for
the streamed run) distinct host-gathered rows, so no two timed
dispatches are identical and nothing converges to a fixed point over
the short timed window.

    python experiments/stream_bench.py --n 1048576 --d 32 --steps 1500

Writes results/stream_bench.json and prints it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--q", type=int, default=4)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=250,
                    help="steps per dispatched scan (amortizes the "
                         "~1.5 s tunnel round-trip)")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp
    import numpy as np

    from dp_gp_lvm_tpu.data import stream, synthetic
    from dp_gp_lvm_tpu.models import dp_svi
    from dp_gp_lvm_tpu.train.loop import (
        gp_optimizer,
        init_state,
        make_streaming_scan_fn,
    )

    cfg = dp_svi.Config(num_latent=args.q, num_inducing=args.m,
                        truncation=args.t, batch=args.batch)
    rng = jax.random.PRNGKey(0)
    Y, _, _ = synthetic.grouped_dims(
        rng, n=args.n, dims_per_group=(args.d // 2, args.d - args.d // 2),
        q=args.q, noise=(0.01, 0.1),
    )
    Y_host = np.asarray(Y, np.float32)
    params0 = dp_svi.init_params(jax.random.PRNGKey(1), Y, cfg)
    n_chunks = max(2, args.steps // args.chunk)
    gb = Y_host.nbytes / 1e9

    def timed(run_chunk, label):
        """First chunk = compile + warmup (untimed); the rest timed.
        run_chunk(k, state) -> (state, losses)."""
        opt = gp_optimizer(params0, lr=1e-3)
        state = init_state(params0, opt)
        state, losses = run_chunk(0, state)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        for k in range(1, n_chunks):
            state, losses = run_chunk(k, state)
        jax.block_until_ready(losses)
        dt = time.perf_counter() - t0
        losses = np.asarray(losses)
        assert np.all(np.isfinite(losses)), f"{label}: {losses}"
        steps_timed = (n_chunks - 1) * args.chunk
        per_step = dt / steps_timed
        print(f"  {label}: {per_step * 1e3:.3f} ms/step "
              f"({args.batch / per_step:,.0f} rows/s)", flush=True)
        return per_step

    # ---- resident baseline: Y in device memory, gather inside jit ----
    opt = gp_optimizer(params0, lr=1e-3)
    res_step = dp_svi.make_dp_svi_step(cfg, args.n, opt, rho=0.3)
    Y_dev = jax.device_put(Y)

    @jax.jit
    def res_chunk(state, rngs):
        def one(st, r):
            st, m = res_step(st, r, Y_dev)
            return st, m["loss"]
        return jax.lax.scan(one, state, rngs)

    def run_resident(k, state):
        rngs = jax.random.split(jax.random.fold_in(rng, k), args.chunk)
        return res_chunk(state, rngs)

    resident = timed(run_resident, "resident")

    # ---- streamed: host mmap + async gather, double-buffered ---------
    with tempfile.TemporaryDirectory() as td:
        path = stream.write_rows(os.path.join(td, "y.f32"), Y_host)
        str_step = dp_svi.make_dp_svi_step(cfg, args.n, opt, rho=0.3,
                                           streaming=True)
        scan_chunk = make_streaming_scan_fn(str_step)
        with stream.ChunkStream(
            stream.open_loader(path, args.n, args.d),
            batch=args.batch, chunk=args.chunk, seed=2,
        ) as cs:
            def run_streamed(k, state):
                idx, y = cs.next_chunk()
                rngs = jax.random.split(
                    jax.random.fold_in(rng, 10_000 + k), idx.shape[0]
                )
                return scan_chunk(state, rngs,
                                  jnp.asarray(idx), jnp.asarray(y))

            streamed = timed(run_streamed, "streamed")

    result = {
        "n": args.n, "d": args.d, "batch": args.batch,
        "chunk": args.chunk, "steps_timed": (n_chunks - 1) * args.chunk,
        "dataset_gb": round(gb, 3),
        "device": jax.devices()[0].device_kind,
        "native_loader": stream.native_available(),
        "resident_ms_per_step": round(resident * 1e3, 4),
        "streamed_ms_per_step": round(streamed * 1e3, 4),
        "resident_rows_per_sec": round(args.batch / resident),
        "streamed_rows_per_sec": round(args.batch / streamed),
        "stream_overhead_pct": round((streamed / resident - 1) * 100, 1),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "results", "stream_bench.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    json.dump(result, open(out, "w"), indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
