"""Decompose c9's cross-view predictive variance on trained params.

VERDICT r3 weak-2 follow-up: the hot-lr / long runs learn the
shared/private ARD signature (ard_cross_private_ratio <= 0.5) but their
cross-view PLL craters to -5..-8 while the flat-ARD runs sit at -1.2.
PLL -8 with mse 0.66 implies predictive variance ~0.04 -- someone is
swallowing the ~0.5 irreducible cross-view variance (the target view's
private dim, unidentifiable from the observed view). Candidates:
  (a) q(x*) collapses its variance on the unidentified dim,
  (b) the trained view-2 model moved the private signal into neither
      noise nor GP variance (over-tight noise + weak private weight),
  (c) predict_from_latent under-propagates q(x*) variance.
This script loads a results/<dir>/params.npz, regenerates the exact
run.py eval split, and reports per-dim q(x*) stats, per-view noise /
kernel variance / ARD, and the predictive variance decomposition
(noise vs GP var) next to the realized squared error.

Usage: python experiments/c9_diag.py results/c9_long [results/c9_ngd ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dp_gp_lvm_tpu.core import config as cfglib
from dp_gp_lvm_tpu.data import synthetic


def load_params(path):
    z = np.load(f"{path}/params.npz")
    # mrd_svi params: views/<v>/<leaf> flattened by run.py's saver
    views = {}
    for k in z.files:
        if k.startswith("views/"):
            _, v, leaf = k.split("/", 2)
            views.setdefault(int(v), {})[leaf] = z[k]
    if views:
        params = {"views": [views[i] for i in sorted(views)]}
        for k in z.files:
            if not k.startswith("views/"):
                params[k] = z[k]
        return params
    return {k: z[k] for k in z.files}


def main():
    import jax
    import jax.numpy as jnp
    from dp_gp_lvm_tpu.models import mrd_svi
    from dp_gp_lvm_tpu.models import svi_gplvm as svi
    from dp_gp_lvm_tpu.models import prediction

    cfg = cfglib.get("c9_mrd_svi_bigN")
    dtype = jnp.float32
    rng = jax.random.PRNGKey(cfg.seed)
    n_hold = 512
    Y1, Y2, _ = synthetic.two_view_big(
        rng, n=cfg.n + n_hold, d1=cfg.views[0], d2=cfg.views[1],
        q_shared=2, q_private=1, private_weight=0.5, dtype=dtype,
    )
    Y1_test, Y2_test = Y1[cfg.n:], Y2[cfg.n:]
    Y2_train_mean = Y2[:cfg.n].mean(axis=0)

    out = {}
    for path in sys.argv[1:]:
        params = jax.tree.map(jnp.asarray, load_params(path))
        mcfg = mrd_svi.config_from_experiment(cfg)
        rel = np.asarray(mrd_svi.ard_relevance(params))
        m_s, s_s, trace = mrd_svi.infer_latent(
            params, {0: Y1_test}, mrd_svi._latent_init(
                params, {0: Y1_test}, mcfg), mcfg, num_steps=300,
        )
        mean, var = mrd_svi.predict_view(params, m_s, s_s, 1, mcfg)
        cv = mrd_svi.constrain_views(params, mcfg)
        noise = [float(np.mean(np.asarray(c["noise"]))) for c in cv]
        kvar = [float(np.asarray(c["variance"])) for c in cv]
        err2 = np.asarray((mean - Y2_test) ** 2)
        v = np.asarray(var)
        pll = float(prediction.gaussian_predictive_loglik(
            Y2_test, mean, var, jnp.ones_like(Y2_test)) / Y2_test.size)
        row = {
            "relevance": rel.round(4).tolist(),
            "noise_mean_per_view": noise,
            "kernel_variance_per_view": kvar,
            "qx_var_per_dim_mean": np.asarray(s_s).mean(0).round(4).tolist(),
            "qx_var_per_dim_min": np.asarray(s_s).min(0).round(4).tolist(),
            "pred_var_mean": float(v.mean()),
            "pred_var_min": float(v.min()),
            "err2_mean": float(err2.mean()),
            "pll_per_dim": pll,
            "calib_ratio_err2_over_var": float((err2 / v).mean()),
        }
        out[path] = row
        print(json.dumps({path: row}, indent=1), flush=True)

    with open("results/c9_diag.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
