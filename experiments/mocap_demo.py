"""End-to-end mocap pipeline demo: skeleton -> joint-angle data ->
DP-GP-LVM -> held-out-frame imputation -> rendered skeletons.

Exercises the whole reference workflow on synthetic motion (the real CMU
files are absent in this zero-egress environment): an ASF skeleton with
a few bones, a smooth synthetic walk cycle in AMC form, training on the
joint-angle matrix, imputing the missing half of each held-out frame's
channels, and rendering true-vs-imputed stick figures.

    python experiments/mocap_demo.py [outdir]
"""
from __future__ import annotations

import os
import sys
import textwrap

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASF = textwrap.dedent("""\
    :version 1.10
    :name demo
    :units
      angle deg
    :root
       order TX TY TZ RX RY RZ
       axis XYZ
       position 0 0 0
       orientation 0 0 0
    :bonedata
      begin
         id 1
         name spine
         direction 0 1 0
         length 2
         axis 0 0 0 XYZ
         dof rx ry rz
      end
      begin
         id 2
         name lleg
         direction 0.3 -1 0
         length 2.2
         axis 0 0 0 XYZ
         dof rx rz
      end
      begin
         id 3
         name rleg
         direction -0.3 -1 0
         length 2.2
         axis 0 0 0 XYZ
         dof rx rz
      end
      begin
         id 4
         name larm
         direction 1 0 0
         length 1.6
         axis 0 0 0 XYZ
         dof rx rz
      end
      begin
         id 5
         name rarm
         direction -1 0 0
         length 1.6
         axis 0 0 0 XYZ
         dof rx rz
      end
    :hierarchy
      begin
        root spine lleg rleg
        spine larm rarm
      end
""")


def make_walk_frames(n=256):
    """Smooth walking-ish joint-angle trajectories (AMC frame dicts)."""
    t = np.linspace(0, 8 * np.pi, n)
    frames = []
    for i in range(n):
        ph = t[i]
        frames.append({
            "root": [0.15 * ph, 4.4 + 0.08 * np.sin(2 * ph), 0.0,
                     0.0, 2.0 * np.sin(0.5 * ph), 0.0],
            "spine": [4.0 * np.sin(ph * 0.5), 3.0 * np.sin(ph * 0.25), 0.0],
            "lleg": [35.0 * np.sin(ph), 4.0 * np.sin(ph * 0.5)],
            "rleg": [-35.0 * np.sin(ph), -4.0 * np.sin(ph * 0.5)],
            "larm": [-25.0 * np.sin(ph), 8.0 + 3.0 * np.sin(ph * 0.5)],
            "rarm": [25.0 * np.sin(ph), -8.0 - 3.0 * np.sin(ph * 0.5)],
        })
    return frames


def frames_to_amc(frames):
    lines = [":FULLY-SPECIFIED", ":DEGREES"]
    for i, fr in enumerate(frames, 1):
        lines.append(str(i))
        for bone, vals in fr.items():
            lines.append(bone + " " + " ".join(f"{v:.6f}" for v in vals))
    return "\n".join(lines) + "\n"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mocap_demo"
    os.makedirs(outdir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import jax.numpy as jnp

    from dp_gp_lvm_tpu import viz
    from dp_gp_lvm_tpu.data import asf as asf_lib
    from dp_gp_lvm_tpu.data import mocap
    from dp_gp_lvm_tpu.models import dp_gp_lvm, prediction
    from dp_gp_lvm_tpu.train.loop import (
        gp_optimizer, init_state, make_multi_step_fn,
    )

    # --- build skeleton + motion, write real ASF/AMC files, parse back ---
    asf_path = os.path.join(outdir, "demo.asf")
    amc_path = os.path.join(outdir, "demo.amc")
    open(asf_path, "w").write(ASF)
    frames = make_walk_frames(256)
    open(amc_path, "w").write(frames_to_amc(frames))

    skeleton = asf_lib.parse_asf(asf_path)
    amc_frames = asf_lib.parse_amc_frames(amc_path)
    Y_np, channels = mocap.parse_amc(amc_path)
    Y = jnp.asarray(mocap.preprocess(Y_np), jnp.float32)
    n, d = Y.shape
    print(f"dataset: N={n} D={d} channels={len(channels)}")

    # --- train DP-GP-LVM on the joint-angle matrix --------------------
    n_test = 32
    Y_tr, Y_te = Y[:-n_test], Y[-n_test:]
    cfg = dp_gp_lvm.Config(num_latent=6, num_inducing=32, truncation=8,
                           fast_chol=True)
    rng = jax.random.PRNGKey(0)
    params = dp_gp_lvm.init_params(rng, Y_tr, cfg)
    loss_fn = lambda p, y: dp_gp_lvm.loss(p, y, cfg)
    opt = gp_optimizer(params, lr=5e-3, decay_steps=1500)
    multi = make_multi_step_fn(loss_fn, opt, num_inner=300)
    state = init_state(params, opt)
    for i in range(5):
        state, losses = multi(state, Y_tr)
        print(f"  step {(i+1)*300}: elbo={-float(losses[-1]):.2f}",
              flush=True)

    # --- impute the missing half of each held-out frame's channels ----
    mask = jnp.ones((n_test, d), jnp.float32).at[:, d // 2:].set(0.0)
    mean, var, m_s, s_s, trace = prediction.impute_dp(
        state.params, Y_tr, cfg, Y_te, mask, num_steps=200
    )
    miss = 1.0 - mask
    mse = float(jnp.sum(((mean - Y_te) ** 2) * miss) / jnp.sum(miss))
    base = jnp.broadcast_to(Y_tr.mean(axis=0), Y_te.shape)
    base_mse = float(jnp.sum(((base - Y_te) ** 2) * miss) / jnp.sum(miss))
    print(f"imputation mse={mse:.4f} (column-mean baseline {base_mse:.4f})")

    # --- render: true vs imputed skeleton for one held-out frame ------
    std = Y_np.std(axis=0)
    keep = std > 1e-8
    mu_np = Y_np.mean(axis=0)[keep]
    sd_np = std[keep]

    def to_frame(row):
        vals = np.asarray(row) * sd_np + mu_np
        fr, off = {}, 0
        for bone in amc_frames[0]:
            k = len(amc_frames[0][bone])
            fr[bone] = list(vals[off:off + k])
            off += k
        return fr

    idx = 10
    truth = jnp.where(mask[idx] > 0, Y_te[idx], Y_te[idx])
    imputed_row = jnp.where(mask[idx] > 0, Y_te[idx], mean[idx])
    _, segs_true = asf_lib.fk_frame(skeleton, to_frame(Y_te[idx]))
    _, segs_imp = asf_lib.fk_frame(skeleton, to_frame(imputed_row))
    viz.plot_skeleton(segs_true, path=os.path.join(outdir, "true.png"))
    viz.plot_skeleton(segs_imp, path=os.path.join(outdir, "imputed.png"))
    phi = dp_gp_lvm.expected_assignments(state.params)
    viz.plot_assignment_matrix(
        np.asarray(phi), path=os.path.join(outdir, "assignments.png")
    )
    print(f"renders written to {outdir}")
    assert mse < base_mse, "imputation must beat the column-mean baseline"
    print("DEMO OK")


if __name__ == "__main__":
    main()
