"""Parity harness vs the reference implementation (SURVEY.md section 4b).

The reference mount (/root/reference) was EMPTY this round, so live
ELBO-parity cannot run yet. This harness implements our side of the
protocol now, so that the moment the mount is populated the comparison is
one command:

  1. `export_reference_inputs` — writes a fixed (data, params) pair as
     .npz in *constrained* space (mu, S, Z, kernel hypers, noise, [phi,
     gamma]) with a deterministic seed, for loading into the reference's
     TF graph.
  2. `our_elbo_f64` — evaluates our ELBO at exactly those params on the
     CPU f64 path (matching the reference's float64).
  3. `compare` — reads a JSON file of reference ELBO values (produced by
     running the reference under tf.compat.v1 on the same inputs) and
     reports per-config absolute/relative differences against the
     tolerance gate (start: rel 1e-6 f64).

Usage:
    python experiments/parity.py export --out /tmp/parity
    python experiments/parity.py elbo --dir /tmp/parity
    python experiments/parity.py compare --dir /tmp/parity \
        --reference-json /tmp/parity/reference_elbos.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_f64():
    import jax

    jax.config.update("jax_enable_x64", True)


def export_reference_inputs(out_dir: str):
    _setup_f64()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm
    from dp_gp_lvm_tpu.train.checkpoint import export_npz

    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(1234)

    # config-1 shaped case
    Y1, _ = synthetic.toy_gplvm(rng, n=100, d=10, q_true=2, q_total=2,
                                dtype=jnp.float64)
    c1 = bgplvm.Config(num_latent=2, num_inducing=20)
    p1 = bgplvm.init_params(rng, Y1, c1)
    np.savez(os.path.join(out_dir, "c1_data.npz"), Y=np.asarray(Y1))
    export_npz(os.path.join(out_dir, "c1_params.npz"), bgplvm.constrain(p1))

    # config-4 shaped case (reduced size so the reference CPU run is fast)
    Y4, _, _ = synthetic.grouped_dims(rng, n=200, dims_per_group=(6, 6),
                                      q=4, dtype=jnp.float64)
    c4 = dp_gp_lvm.Config(num_latent=4, num_inducing=16, truncation=5)
    p4 = dp_gp_lvm.init_params(rng, Y4, c4)
    np.savez(os.path.join(out_dir, "c4_data.npz"), Y=np.asarray(Y4))
    export_npz(os.path.join(out_dir, "c4_params.npz"),
               dp_gp_lvm.constrain(p4))
    print(f"inputs exported to {out_dir}")


def our_elbo_f64(out_dir: str):
    _setup_f64()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm

    rng = jax.random.PRNGKey(1234)
    out = {}
    Y1, _ = synthetic.toy_gplvm(rng, n=100, d=10, q_true=2, q_total=2,
                                dtype=jnp.float64)
    c1 = bgplvm.Config(num_latent=2, num_inducing=20)
    p1 = bgplvm.init_params(rng, Y1, c1)
    out["c1"] = float(bgplvm.elbo(p1, Y1, c1))

    Y4, _, _ = synthetic.grouped_dims(rng, n=200, dims_per_group=(6, 6),
                                      q=4, dtype=jnp.float64)
    c4 = dp_gp_lvm.Config(num_latent=4, num_inducing=16, truncation=5)
    p4 = dp_gp_lvm.init_params(rng, Y4, c4)
    out["c4"] = float(dp_gp_lvm.elbo(p4, Y4, c4))

    path = os.path.join(out_dir, "our_elbos.json")
    json.dump(out, open(path, "w"), indent=2)
    print(json.dumps(out))
    return out


def compare(out_dir: str, reference_json: str, rtol: float = 1e-6):
    ours = json.load(open(os.path.join(out_dir, "our_elbos.json")))
    ref = json.load(open(reference_json))
    ok = True
    for k in sorted(set(ours) & set(ref)):
        a, b = ours[k], ref[k]
        rel = abs(a - b) / max(abs(b), 1e-12)
        status = "OK" if rel <= rtol else "FAIL"
        ok &= rel <= rtol
        print(f"{k}: ours={a:.10g} ref={b:.10g} rel={rel:.2e} {status}")
    missing = set(ours) ^ set(ref)
    if missing:
        print(f"configs present on one side only: {sorted(missing)}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["export", "elbo", "compare"])
    ap.add_argument("--out", "--dir", dest="dir", default="/tmp/parity")
    ap.add_argument("--reference-json", default=None)
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()
    if args.cmd == "export":
        export_reference_inputs(args.dir)
    elif args.cmd == "elbo":
        our_elbo_f64(args.dir)
    else:
        if not args.reference_json:
            sys.exit("--reference-json required for compare")
        sys.exit(0 if compare(args.dir, args.reference_json, args.rtol)
                 else 1)


if __name__ == "__main__":
    main()
