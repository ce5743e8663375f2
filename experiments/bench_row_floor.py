"""Claim (or attribute) the padded-floor gap at the headline bench row
(VERDICT r4 item 5): N=1024, D=60, Q=10, M=64, T=20 runs at 61% of the
lane-padded analytic floor (BENCH_r04: 5.91 ms vs 3.60 ms padded floor).

Measures, with dependency-chained distinct-input timing (the axon relay
content-caches identical dispatches — CLAUDE.md):

1. full ELBO+grad step on the auto path (XLA single shot; the shipped
   configuration) — reproduces the BENCH number;
2. full step with the fused Pallas suffstats forced on, sweeping the
   row-block size at THIS shape (the committed _fwd/_bwd_block sweep was
   done at N=8192; nothing pinned the small-N choice);
3. the psi-suffstats fwd+bwd alone on both paths (isolates the 84% of
   the step the ablation attributes to psi);
4. forward-only ELBO on both paths (the ablation's 4.3 ms forward is
   2.4x its flop share — if the auto forward is the sink, the fix is
   path selection, not kernel work).

Writes results/bench_row_floor.json.
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

N, D, Q, M, T = 1024, 60, 10, 64, 20


def timed(fn, args, chunk=100, chunks=6):
    """Seconds/step via chunked chained lax.scan with a per-chunk VALUE
    fetch — the exact protocol of run.py's drive() loop, whose chunk
    wall times are corroborated by total run wall clocks (c9: 0.74 s
    per 250-step chunk = 2.97 ms/step, 24k steps in 232 s).

    Nothing weaker survives this relay (all measured 2026-08-20):
    a short chained python loop measures enqueue (0.16 "ms/step" vs a
    1.8 ms analytic floor); `block_until_ready` does NOT reliably wait
    for compute on carry-only or even stacked-output scan programs
    (0.001 "ms/step"); a single end-of-window fetch folds one warmup's
    leftover work into the window. Fetch-to-fetch chunking is the one
    protocol that agrees with completed-run wall clocks.
    """
    @jax.jit
    def loop(c):
        def body(c, _):
            out, c2 = fn(*c)
            return c2, jnp.sum(out)
        return jax.lax.scan(body, c, None, length=chunk)

    c, outs = loop(args)                 # compile + warmup chunk
    float(outs[-1])                      # sync: actual value fetch
    t0 = time.perf_counter()
    n = 0
    for _ in range(chunks - 1):
        c, outs = loop(c)
        float(outs[-1])
        n += chunk
    return (time.perf_counter() - t0) / n


def build_step(use_pallas):
    import optax

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import dp_gp_lvm

    config = dp_gp_lvm.Config(num_latent=Q, num_inducing=M, truncation=T,
                              use_pallas=use_pallas)
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.mocap_like(rng, n=N, d=D, dtype=jnp.float32)
    params = dp_gp_lvm.init_params(rng, Y, config)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, Y):
        loss, grads = jax.value_and_grad(dp_gp_lvm.loss)(params, Y, config)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return loss, (params, opt_state, Y)

    return step, (params, opt_state, Y), config, Y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/bench_row_floor.json")
    ap.add_argument("--blocks", default="64,128,256")
    args = ap.parse_args()

    from dp_gp_lvm_tpu.models import dp_gp_lvm
    from dp_gp_lvm_tpu.perf import dp_step_costs, mfu

    rows = {}
    costs = dp_step_costs(N, D, Q, M, T)
    floor = mfu(1.0, costs)  # per-second rates; floor_ms fields valid
    rows["floors_ms"] = {"geometric": floor["floor_ms"],
                         "padded": floor["padded_floor_ms"]}

    # --- 1/2: full step, auto vs forced-pallas ---
    for tag, up in [("auto", "auto"), ("pallas", True)]:
        step, sargs, config, Y = build_step(up)
        ms = timed(step, sargs) * 1e3
        rows[f"full_step_{tag}_ms"] = round(ms, 3)
        rows[f"full_step_{tag}_padded_pct"] = round(
            100.0 * floor["padded_floor_ms"] / ms, 1)
        print(f"full step {tag}: {ms:.3f} ms "
              f"({rows[f'full_step_{tag}_padded_pct']}% of padded floor)",
              flush=True)

    # --- 3: psi suffstats fwd+bwd alone, both paths ---
    from dp_gp_lvm_tpu.models import dp_gp_lvm as mod
    from dp_gp_lvm_tpu.ops import dispatch

    _, _, config, Y = build_step("auto")
    params = mod.init_params(jax.random.PRNGKey(0), Y, config)
    c = mod.constrain(params)
    hyp = (c["variance"], c["ard"], c["qx_mean"], c["qx_var"], c["z"])

    def make_suff(up):
        @jax.jit
        def f(variance, ard, mu, s, z, Y):
            def val(variance, ard, mu, s, z):
                _, p1y, p2, _, _ = dispatch.dp_batched_suffstats(
                    variance, ard, mu, s, z, Y, use_pallas=up)
                return jnp.sum(p2) + jnp.sum(p1y)

            v, grads = jax.value_and_grad(val, argnums=(0, 1, 2, 3, 4))(
                variance, ard, mu, s, z)
            # chain: perturb mu by a v-dependent drift so inputs differ
            mu2 = mu + 1e-6 * v
            return v, (variance, ard, mu2, s, z, Y)

        return f

    for tag, up in [("auto", "auto"), ("pallas", True)]:
        f = make_suff(up)
        ms = timed(f, (*hyp, Y)) * 1e3
        rows[f"suffstats_fwdbwd_{tag}_ms"] = round(ms, 3)
        print(f"suffstats fwd+bwd {tag}: {ms:.3f} ms", flush=True)

    # --- 4: forward-only ELBO both paths ---
    for tag, up in [("auto", "auto"), ("pallas", True)]:
        cfg_k = mod.Config(num_latent=Q, num_inducing=M, truncation=T,
                           use_pallas=up)

        @jax.jit
        def fwd(params, Y):
            v = mod.elbo(params, Y, cfg_k)
            p2 = {**params, "qx_mean": params["qx_mean"] + 1e-7 * v}
            return v, (p2, Y)

        ms = timed(fwd, (params, Y)) * 1e3
        rows[f"elbo_fwd_{tag}_ms"] = round(ms, 3)
        print(f"elbo forward {tag}: {ms:.3f} ms", flush=True)

    # --- block sweep on the fused kernels at THIS shape ---
    from dp_gp_lvm_tpu.ops.pallas import psi as psi_pallas

    # dp_gp_lvm constrained params: variance (T,), ard (T, Q), z (T, M, Q)
    zst, var_t, ard_t = c["z"], c["variance"], c["ard"]
    for blk in [int(b) for b in args.blocks.split(",")]:
        @jax.jit
        def f(variances, ards, mu, s, zs, Y):
            def val(variances, ards, mu, s, zs):
                p2, p1y = psi_pallas.suffstats_batched_fused(
                    variances, ards, mu, s, zs, Y, block_n=blk)
                return jnp.sum(p2) + jnp.sum(p1y)

            v, _ = jax.value_and_grad(val, argnums=(0, 1, 2, 3, 4))(
                variances, ards, mu, s, zs)
            mu2 = mu + 1e-6 * v
            return v, (variances, ards, mu2, s, zs, Y)

        try:
            ms = timed(f, (var_t, ard_t, c["qx_mean"], c["qx_var"], zst,
                           Y)) * 1e3
            rows[f"fused_fwdbwd_B{blk}_ms"] = round(ms, 3)
            print(f"fused suffstats fwd+bwd B={blk}: {ms:.3f} ms",
                  flush=True)
        except Exception as e:  # Mosaic compile failures at bad blocks
            rows[f"fused_fwdbwd_B{blk}_ms"] = f"error: {type(e).__name__}"
            print(f"fused B={blk}: {type(e).__name__}", flush=True)

    rows["device"] = jax.devices()[0].device_kind
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
