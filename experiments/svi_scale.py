"""SVI-GPLVM at N = 1M rows on one chip (models/svi_gplvm.py).

The point: every collapsed model (and the reference) pays a full-batch
psi-statistic sweep per step — O(N M^2), ~5 s/step at N=1M on this chip
(linear extrapolation of SCALING.md's measured XLA rows). The
uncollapsed bound trains from minibatches at O(B M^2): constant ms/step
at any N. This run fits N=2^20 synthetic mocap-like rows and reports
rows/sec plus a full-data ELBO estimate trajectory.

    python experiments/svi_scale.py --out results/svi_scale.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, Q, M, B = 1 << 20, 32, 8, 64, 1024
STEPS = 4000
CHUNK = 250


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/svi_scale.json")
    ap.add_argument("--steps", type=int, default=STEPS)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import svi_gplvm
    from dp_gp_lvm_tpu.train.loop import TrainState, gp_optimizer, init_state

    dtype = jnp.float32
    rng = jax.random.PRNGKey(0)
    # mocap-like generator at 1M rows (few smooth latent signals)
    Y, _ = synthetic.mocap_like(rng, n=N, d=D, q_true=4, dtype=dtype)
    cfg = svi_gplvm.Config(num_latent=Q, num_inducing=M, batch=B)
    params = svi_gplvm.init_params(rng, Y, cfg)
    opt = gp_optimizer(params, lr=3e-3, ngd_lr=1.0, decay_steps=args.steps)

    def one(state: TrainState, step_rng):
        idx = jax.random.randint(step_rng, (B,), 0, N)
        y_b = Y[idx]
        loss_v, grads = jax.value_and_grad(
            lambda p: svi_gplvm.loss_minibatch(p, y_b, idx, N, cfg)
        )(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_v

    @jax.jit
    def multi(state, chunk_rng):
        rngs = jax.random.split(chunk_rng, CHUNK)
        return jax.lax.scan(one, state, rngs)

    state = init_state(params, opt)
    rng_run = jax.random.PRNGKey(1)
    # compile
    rng_run, sub = jax.random.split(rng_run)
    state, losses = multi(state, sub)
    jax.block_until_ready(losses)
    trail = [-float(losses[-1])]
    t0 = time.perf_counter()
    done = CHUNK
    while done < args.steps:
        rng_run, sub = jax.random.split(rng_run)
        state, losses = multi(state, sub)
        done += CHUNK
        trail.append(-float(losses[-1]))
        print(f"  step {done}: elbo_estimate={trail[-1]:.4g}", flush=True)
    wall = time.perf_counter() - t0
    steps_timed = done - CHUNK
    ms_per_step = wall / steps_timed * 1e3

    out = {
        "n": N, "d": D, "q": Q, "m": M, "batch": B,
        "device": jax.devices()[0].device_kind,
        "steps": done,
        "ms_per_step": round(ms_per_step, 3),
        "rows_per_sec": round(B / (ms_per_step / 1e3)),
        "elbo_estimate_per_chunk": [round(v, 1) for v in trail],
        "note": "full-batch collapsed step at N=1M would be ~5 s "
                "(linear in N from SCALING.md's 8k row); minibatch is "
                "constant in N",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
