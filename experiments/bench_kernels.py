"""Microbenchmark: fused Pallas psi kernels vs the XLA pure-JAX path on
the current default device. Informs the dispatch default (ops/dispatch.py)
and the bench.py configuration.

    python experiments/bench_kernels.py [N M Q T]
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


def timeit(f, *args, steps=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(*args)
    jax.block_until_ready(out)
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
          f"interpret={interp}")

    xla_full = jax.jit(lambda *a: ard_rbf.psi2(*a))
    xla_blk = jax.jit(
        lambda *a: ard_rbf.psi2(*a, block_n=256)
    )
    print(f"psi2 XLA (single shot): {timeit(xla_full, variance, ard, mu, s, Z):8.3f} ms")
    print(f"psi2 XLA (block 256):   {timeit(xla_blk, variance, ard, mu, s, Z):8.3f} ms")
    for blk in (16, 32, 64, 128):
        f = jax.jit(
            lambda *a, b=blk: psi_pallas.psi2_pallas(
                *a, block_n=b, interpret=interp
            )
        )
        try:
            ms = timeit(f, variance, ard, mu, s, Z)
            print(f"psi2 Pallas (block {blk:3d}): {ms:8.3f} ms")
        except Exception as e:
            print(f"psi2 Pallas (block {blk:3d}): FAILED {type(e).__name__}: {e}"[:300])

    xla_p1 = jax.jit(lambda *a: ard_rbf.psi1(*a))
    print(f"psi1 XLA:               {timeit(xla_p1, variance, ard, mu, s, Z):8.3f} ms")
    f1 = jax.jit(
        lambda *a: psi_pallas.psi1_pallas(*a, block_n=128, interpret=interp)
    )
    try:
        print(f"psi1 Pallas (block 128): {timeit(f1, variance, ard, mu, s, Z):8.3f} ms")
    except Exception as e:
        print(f"psi1 Pallas: FAILED {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
