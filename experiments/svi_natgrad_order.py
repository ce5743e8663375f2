"""Natural-gradient ordering/schedule comparison for SVI-GPLVM
(VERDICT r2 weak item 4 / next-round item 7).

Measures, at the c6 scale (mocap-like N=131072, batch 1024, M=64):

  blend_at="updated"  — Hoffman ordering: the q(u) blend recomputes the
                        batch statistics at the post-gradient params
                        (a second psi pass per step);
  blend_at="grad"     — reuse the gradient pass's whitened statistics
                        (half the psi work; the blend lags the hyper
                        update by one step);
  rho schedules       — fixed rho vs Robbins-Monro
                        rho_t = rho (1 + t/t0)^-kappa (kappa in
                        (0.5, 1] satisfies the classic conditions for
                        asymptotic SVI convergence).

Each variant trains the same step budget from the same init; reports
measured ms/step (axon-relay safe: params chain through the scan) and
the final FULL-data ELBO. Writes results/svi_natgrad_order.json — the
artifact behind models/svi_gplvm.make_svi_natgrad_step's defaults.

    python experiments/svi_natgrad_order.py --out results/svi_natgrad_order.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, Q, M = 131072, 32, 8, 64
BATCH = 1024
STEPS = 3000
CHUNK = 250


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/svi_natgrad_order.json")
    ap.add_argument("--steps", type=int, default=STEPS)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import svi_gplvm
    from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state

    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.mocap_like(rng, n=N, d=D, dtype=jnp.float32)
    cfg = svi_gplvm.Config(num_latent=Q, num_inducing=M, batch=BATCH,
                           psi2_block=8192)
    params0 = svi_gplvm.init_params(jax.random.PRNGKey(1), Y, cfg)

    def variant(name, **kw):
        opt = gp_optimizer(params0, lr=3e-3, ngd_lr=1.0,
                           decay_steps=args.steps)
        step = svi_gplvm.make_svi_natgrad_step(cfg, N, opt, **kw)

        def one(st, rr):
            st, m = step(st, rr, Y)
            return st, m["loss"]

        @jax.jit
        def multi(st, rr):
            return jax.lax.scan(one, st, jax.random.split(rr, CHUNK))

        state = init_state(params0, opt)
        rr = jax.random.PRNGKey(99)
        t_post = None
        t0 = time.perf_counter()
        for k in range(args.steps // CHUNK):
            rr, sub = jax.random.split(rr)
            state, losses = multi(state, sub)
            jax.block_until_ready(losses)
            if t_post is None:
                t_post = time.perf_counter()       # exclude the compile chunk
        timed = args.steps - CHUNK
        ms = (time.perf_counter() - t_post) / max(timed, 1) * 1e3
        elbo = float(svi_gplvm.elbo(state.params, Y, cfg))
        row = {"variant": name, "ms_per_step": round(ms, 4),
               "rows_per_sec": round(BATCH / (ms / 1e3)),
               "final_full_elbo": round(elbo, 1),
               "total_seconds": round(time.perf_counter() - t0, 1)}
        print(row, flush=True)
        return row

    rows = [
        variant("updated rho=0.2 (Hoffman, 2x psi)",
                rho=0.2, blend_at="updated"),
        variant("grad rho=0.2 (reuse stats, 1x psi)",
                rho=0.2, blend_at="grad"),
        variant("grad rho=0.2 RM(t0=500,k=0.6)",
                rho=0.2, blend_at="grad", rho_t0=500.0, rho_kappa=0.6),
        variant("updated rho=0.2 RM(t0=500,k=0.6)",
                rho=0.2, blend_at="updated", rho_t0=500.0, rho_kappa=0.6),
    ]

    upd = next(r for r in rows if r["variant"].startswith("updated rho=0.2 ("))
    grd = next(r for r in rows if r["variant"].startswith("grad rho=0.2 ("))
    artifact = {
        "scale": {"n": N, "d": D, "q": Q, "m": M, "batch": BATCH,
                  "steps": args.steps},
        "device": jax.devices()[0].device_kind,
        "rows": rows,
        "updated_over_grad_step_cost": round(
            upd["ms_per_step"] / grd["ms_per_step"], 3),
        "note": "ms/step excludes the compile chunk; final_full_elbo is "
                "the full-N uncollapsed bound at the trained params. "
                "'updated' pays a second psi pass per step (Hoffman "
                "ordering); 'grad' reuses the gradient pass's whitened "
                "statistics.",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
