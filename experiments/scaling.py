"""Scaling sweep: honest (parameter-chained) DP-GP-LVM step times across
model sizes, from the BASELINE headline config up to sizes the reference
(single-process f64 TF1 on CPU) could not run at all. Produces the
SCALING.md table.

    python experiments/scaling.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import dp_gp_lvm

# (N, D, Q, M, T, psi2_block)
# psi2_block=None: small rows single-shot XLA; large rows auto-select the
# fused Pallas fwd+bwd kernels (Config.use_pallas="auto") with their own
# VMEM-safe blocks
SIZES = [
    (1024, 60, 10, 64, 20, None),      # BASELINE headline (CMU mocap scale)
    (1024, 60, 10, 64, 20, 256),       # headline @ psi2_block=256 (bench.py
    #                                    config: 4x84MB blocks beat the
    #                                    335MB single shot in scan context)
    (4096, 60, 10, 64, 20, None),      # 4x data
    (8192, 120, 10, 128, 20, None),    # 8x data, 2x dims, 2x inducing
    (16384, 120, 16, 128, 20, None),   # 16x data, wider latent
    (32768, 60, 10, 64, 20, None),     # 32x data at reference dims
    (32768, 120, 16, 128, 20, None),   # r1's largest row (2x dims/M, Q=16)
]


def measure(n, d, q, m, t, blk, chunk=50, min_timed_s=2.0, max_chunks=5):
    """Chunked-scan fetch-to-fetch protocol (round 5; see CLAUDE.md
    'Benchmarking on the axon tunnel'): the r1-r4 python-loop numbers
    carried ~1 ms/step of tunnel dispatch overhead on the small rows,
    and block_until_ready alone does not reliably wait for compute —
    each chunk ends in an actual value fetch. Timed chunks accumulate
    until >= min_timed_s of wall (bias from the per-chunk fetch round
    trip stays under ~4% at the smallest row, <1% elsewhere)."""
    cfg = dp_gp_lvm.Config(
        num_latent=q, num_inducing=m, truncation=t, psi2_block=blk,
        fast_chol=True,
    )
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.mocap_like(rng, n=n, d=d, dtype=jnp.float32)
    params = dp_gp_lvm.init_params(rng, Y, cfg)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def loop(c):
        def body(c, _):
            p, s = c
            loss, g = jax.value_and_grad(
                lambda x: dp_gp_lvm.loss(x, Y, cfg)
            )(p)
            up, s = opt.update(g, s)
            return (optax.apply_updates(p, up), s), loss
        return jax.lax.scan(body, c, None, length=chunk)

    c, losses = loop((params, opt_state))     # compile + warmup chunk
    loss = float(losses[-1])                  # sync: value fetch
    assert loss == loss, (n, d, q, m, t)
    t0 = time.perf_counter()
    steps = 0
    while steps < chunk * max_chunks and (
        steps == 0 or time.perf_counter() - t0 < min_timed_s
    ):
        c, losses = loop(c)
        loss = float(losses[-1])
        steps += chunk
    ms = (time.perf_counter() - t0) / steps * 1e3
    assert loss == loss, (n, d, q, m, t)
    return ms, loss


def main():
    device = jax.devices()[0].device_kind
    rows = []
    from dp_gp_lvm_tpu.perf import dp_step_costs, mfu

    for n, d, q, m, t, blk in SIZES:
        try:
            ms, loss = measure(n, d, q, m, t, blk)
            util = mfu(ms / 1e3, dp_step_costs(n, d, q, m, t))
            print(f"N={n:6d} D={d:4d} Q={q:3d} M={m:4d} T={t:3d} "
                  f"blk={str(blk):>5s}: {ms:9.3f} ms/step  "
                  f"{util['tflops_achieved']:6.2f} TF/s "
                  f"(mfu {util['mfu_pct']:.1f}%, "
                  f"{util['roofline_pct']:.0f}% of {util['binding_floor']} "
                  f"floor)", flush=True)
            rows.append(dict(
                n=n, d=d, q=q, m=m, t=t, block=blk,
                ms_per_step=round(ms, 3),
                tflops_achieved=round(util["tflops_achieved"], 3),
                mfu_pct=round(util["mfu_pct"], 2),
                roofline_pct=round(util["roofline_pct"], 1),
                padded_roofline_pct=round(util["padded_roofline_pct"], 1),
                binding_floor=util["binding_floor"],
            ))
        except Exception as e:
            print(f"N={n} FAILED: {type(e).__name__}: {e}"[:200], flush=True)
            rows.append(dict(n=n, d=d, q=q, m=m, t=t, block=blk,
                             error=str(e)[:120]))
    out = {"device": device, "rows": rows}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "scaling_results.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
