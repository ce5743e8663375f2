"""Microbenchmark: fused Pallas psi kernels vs the XLA pure-JAX path.

Timing methodology: every repetition is CHAINED through a scalar data
dependency (out -> next input perturbation with zero effect) — on the
axon-tunneled TPU, timing independent queued calls and blocking on the
last one under-reports wildly (the runtime does not serialize them the
way block_until_ready suggests). Training-step timings elsewhere are
naturally chained through the parameter pytree.

    python experiments/bench_kernels.py [N M Q]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
import jax.numpy as jnp

from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.ops.pallas import psi as psi_pallas


def timeit_chained(make_call, steps=30):
    """make_call(acc_scalar) -> new array; reps chained via the scalar."""
    acc = jnp.float32(0.0)
    out = make_call(acc)
    acc = jnp.sum(out) * 0.0
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = make_call(acc)
        acc = jnp.sum(out) * 0.0
    jax.block_until_ready(acc)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    n, m, q = 1024, 64, 10
    if len(sys.argv) > 3:
        n, m, q = map(int, sys.argv[1:4])
    dtype = jnp.float32
    r = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(r, 3)
    mu = jax.random.normal(r1, (n, q), dtype)
    s = jax.random.uniform(r2, (n, q), dtype, 0.05, 0.8)
    Z = jax.random.normal(r3, (m, q), dtype)
    variance = jnp.float32(1.5)
    ard = jnp.abs(jax.random.normal(r, (q,), dtype)) + 0.5

    interp = jax.default_backend() in ("cpu",)
    print(f"device={jax.devices()[0].device_kind} N={n} M={m} Q={q} "
          f"interpret={interp} (chained timing)")

    def run(tag, fn):
        f = jax.jit(fn)
        try:
            ms = timeit_chained(lambda acc: f(variance, ard, mu + acc, s, Z))
            print(f"{tag:32s} {ms:8.3f} ms")
        except Exception as e:
            print(f"{tag:32s} FAILED {type(e).__name__}: {e}"[:200])

    run("psi2 XLA single-shot",
        lambda v, a, m_, s_, z_: ard_rbf.psi2(v, a, m_, s_, z_))
    for blk in (256, 1024):
        if blk < n:
            run(f"psi2 XLA scan block={blk}",
                lambda v, a, m_, s_, z_, b=blk: ard_rbf.psi2(
                    v, a, m_, s_, z_, block_n=b))
    for blk in (16, 32, 64):
        run(f"psi2 Pallas block={blk}",
            lambda v, a, m_, s_, z_, b=blk: psi_pallas.psi2_pallas(
                v, a, m_, s_, z_, block_n=b, interpret=interp))
    run("psi1 XLA",
        lambda v, a, m_, s_, z_: ard_rbf.psi1(v, a, m_, s_, z_))
    run("psi1 Pallas block=128",
        lambda v, a, m_, s_, z_: psi_pallas.psi1_pallas(
            v, a, m_, s_, z_, block_n=128, interpret=interp))


if __name__ == "__main__":
    main()
