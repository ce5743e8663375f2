"""Capture a jax.profiler trace of the DP-GP-LVM training step
(SURVEY.md section 5 'Tracing / profiling').

    python experiments/profile.py [outdir] [steps]

Writes a TensorBoard-compatible trace (view with
`tensorboard --logdir <outdir>`; the profile plugin is installed). The
model code carries jax.named_scope regions (psi_stats / kuu_gram /
collapsed_bound) for XLA-level attribution.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dpgp_trace"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp
    import optax

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import dp_gp_lvm

    cfg = dp_gp_lvm.Config(
        num_latent=10, num_inducing=64, truncation=20, psi2_block=None,
        fast_chol=True,
    )
    rng = jax.random.PRNGKey(0)
    Y, _ = synthetic.mocap_like(rng, n=1024, d=60, dtype=jnp.float32)
    params = dp_gp_lvm.init_params(rng, Y, cfg)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, g = jax.value_and_grad(dp_gp_lvm.loss)(params, Y, cfg)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # compile outside the trace
    params, opt_state, loss = step(params, opt_state)
    loss.block_until_ready()

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state)
        loss.block_until_ready()
    print(f"trace written to {outdir} (loss={float(loss):.2f})")


if __name__ == "__main__":
    main()
