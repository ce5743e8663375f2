"""Round-4 diagnostic: reproduce the c8 amortized divergence at reduced
scale and attribute it to a parameter group.

The committed c8 artifact (results/c8) diverged: batch-ELBO estimates
swing from -3e6 to +9.6e8 over 6000 steps at N=131072. This script runs
the same recipe (amortized svi_gplvm, natgrad q(u) rho=0.2, gp_optimizer
with cosine decay) and logs, every chunk of CHUNK steps:
  - the batch elbo estimate
  - leaf-group norms (encoder, q(u)) + constrained hypers
  - encoder output statistics (|mu| max, s range) on a probe batch
so the first quantity to run away is visible. Steps run in jitted
lax.scan chunks (the tunneled-TPU dispatch pattern of run.py).

Usage: python experiments/debug_c8.py [N] [STEPS] [key=value ...]
  overrides: rho=0.2 lr=3e-3 enc_lr=<float> batch=1024 floor=1e-3
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import amortized, svi_gplvm
from dp_gp_lvm_tpu.train.loop import gp_optimizer, init_state

args = {k: v for k, v in (a.split("=", 1) for a in sys.argv[3:])}
N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
RHO = float(args.get("rho", 0.2))
LR = float(args.get("lr", 3e-3))
ENC_LR = float(args["enc_lr"]) if "enc_lr" in args else None
BATCH = int(args.get("batch", 1024))
FLOOR = float(args.get("floor", 1e-3))
QXFLOOR = float(args.get("qx_floor", 0.0))
TRUST = float(args["trust"]) if "trust" in args else None
CHUNK = 100

rng = jax.random.PRNGKey(0)
Y, _ = synthetic.mocap_like(jax.random.PRNGKey(1), n=N, d=32,
                            dtype=jnp.float32)
Y = (Y - Y.mean(axis=0)) / (Y.std(axis=0) + 1e-8)

cfg = svi_gplvm.Config(num_latent=8, num_inducing=64, batch=BATCH,
                       psi2_block=8192, amortized=True, noise_floor=FLOOR,
                       qx_var_floor=QXFLOOR)
params = svi_gplvm.init_params(rng, Y, cfg)

FREEZE = frozenset({"z"}) if args.get("freeze_z") else frozenset()
SLOW = frozenset({"z"}) if args.get("z_slow") else frozenset()
opt = gp_optimizer(params, lr=LR, decay_steps=STEPS, freeze=FREEZE,
                   slow=SLOW)
nat_step = svi_gplvm.make_svi_natgrad_step(cfg, N, opt, rho=RHO,
                                           qu_trust=TRUST)
state = init_state(params, opt)

probe_idx = jnp.arange(0, N, max(1, N // 512))
probe_y = Y[probe_idx]
rng_run = jax.random.PRNGKey(100)


@jax.jit
def chunk_run(st, start):
    keys = jax.vmap(lambda i: jax.random.fold_in(rng_run, i))(
        start + jnp.arange(CHUNK)
    )

    def one(s, k):
        s, metrics = nat_step(s, k, Y)
        return s, metrics["loss"]

    return jax.lax.scan(one, st, keys)


@jax.jit
def diag(p):
    c = svi_gplvm.constrain(p, cfg)
    enc = jnp.sqrt(sum(jnp.sum(v * v) for k, v in p.items()
                       if k.startswith("enc_")))
    qu = jnp.sqrt(jnp.sum(p["u_mean"] ** 2))
    mu, s = amortized.encode(c, probe_y)
    sdiag = jnp.diagonal(c["u_scale"])
    h, lam = svi_gplvm._natural_from_params(c)
    from dp_gp_lvm_tpu.ops import dispatch
    kuu = dispatch.gram(c["variance"], c["ard"], c["z"], kernel=cfg.kernel)
    eig = jnp.linalg.eigvalsh(kuu)
    z = c["z"]
    d2 = jnp.sum((z[:, None, :] - z[None, :, :]) ** 2, -1)
    d2 = d2 + jnp.eye(z.shape[0]) * 1e9
    return (enc, qu, c["noise"], c["variance"], jnp.max(c["ard"]),
            jnp.max(jnp.abs(mu)), jnp.min(s), jnp.max(s),
            jnp.min(sdiag), jnp.max(sdiag),
            jnp.max(jnp.abs(h)), jnp.max(jnp.abs(lam)),
            jnp.min(eig), jnp.max(eig), jnp.sqrt(jnp.min(d2)))


done = 0
while done < STEPS:
    state, losses = chunk_run(state, jnp.int32(done))
    done += CHUNK
    e = -float(losses[-1])
    (enc, qu, noise, sf2, ardm, mu_max, s_min, s_max,
     sd_min, sd_max, h_max, lam_max, keig_min, keig_max, zdist) = (
        float(x) for x in diag(state.params)
    )
    print(f"step {done:5d} elbo={e:.6g} |enc|={enc:.4g} |u|={qu:.4g} "
          f"noise={noise:.4g} sf2={sf2:.4g} ard_max={ardm:.4g} "
          f"mu_max={mu_max:.4g} s=[{s_min:.3g},{s_max:.3g}] "
          f"sdiag=[{sd_min:.3g},{sd_max:.3g}] h_max={h_max:.3g} "
          f"lam_max={lam_max:.3g} keig=[{keig_min:.3g},{keig_max:.3g}] "
          f"zmin={zdist:.3g}", flush=True)
