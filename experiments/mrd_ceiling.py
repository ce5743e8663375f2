"""Cross-view prediction ceiling analysis for config 3 (VERDICT r2 weak
item 2 / next-round item 3).

The c3 calibration note used to cite a "both-view bound ~0.23" as the
achievable cross-view MSE ratio. That number is NOT a cross-view
ceiling: observing both views at test time constrains the target view's
PRIVATE latent coordinate, which a cross-view predictor cannot know.
This script measures the real ceilings on the committed generator and
holdout protocol (two_view q_shared=2, private_weight=0.5, strided
every-8th-row test split):

  theory    — infinite-data RBF marginalization over the private dims:
              predictable variance fraction 1/sqrt(1 + 2 w q_private)
              => floor ratio 1 - 1/sqrt(2) ~ 0.293 (generator docstring,
              data/synthetic.py two_view).
  oracle    — an EXACT GP regression trained on the TRUE shared latent
              coordinates of the training rows (the information a
              perfect MRD could at best recover), predicting the
              held-out rows. Finite data + standardization push the
              floor well above theory.
  mrd       — the committed c3 recipe (8000 steps, best of 3 restarts)
              + cross-view latent inference, for comparison.

Measured (TPU v5e, 2026-08-17): oracle ratio 0.485; MRD 0.62-0.65
depending on optimizer (NGD 0.620 / Adam 0.645) — i.e. the trained
model sits within ~1.3x of a ceiling that does not yet include
latent-inference error (the oracle is GIVEN the test rows' shared
coordinates; MRD must infer them from the observed view). The remaining
gap is the ceiling, not a calibration bug: every latent-inference
variant (s0 in {0.1, 1.0}, 400-2000 inner steps, relevance-masked
init) lands on ratio 0.645 +- 0.001 with the private dim correctly at
prior variance ~0.91 (measured this round; see VERDICT r3 notes).

    python experiments/mrd_ceiling.py --out results/mrd_ceiling.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/mrd_ceiling.json")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--restarts", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from dp_gp_lvm_tpu.data import synthetic
    from dp_gp_lvm_tpu.models import gp_regression, mrd, prediction
    from dp_gp_lvm_tpu.train.loop import (
        fit,
        gp_optimizer,
        init_state,
        make_multi_step_fn,
    )

    rng = jax.random.PRNGKey(0)
    # the exact c3 protocol (experiments/run.py two_view branch)
    Y1, Y2, X = synthetic.two_view(
        rng, n=256, d1=8, d2=8, q_shared=2, private_weight=0.5,
        dtype=jnp.float32,
    )
    keep = np.ones(Y1.shape[0], bool)
    keep[7::8] = False
    Y1_test, Y2_test = Y1[~keep], Y2[~keep]
    Xs_train = X[keep][:, :2].astype(jnp.float32)
    Xs_test = X[~keep][:, :2].astype(jnp.float32)
    Y1, Y2 = Y1[keep], Y2[keep]
    base = float(jnp.mean((Y2.mean(axis=0) - Y2_test) ** 2))

    theory = 1.0 - 1.0 / float(np.sqrt(1.0 + 2.0 * 0.5 * 1.0))

    # oracle: exact GP from the TRUE shared latents
    gp_p = gp_regression.init_params(2, jnp.float32)
    gp_p, _ = fit(
        lambda p, x, y: gp_regression.loss(p, x, y), gp_p,
        (Xs_train, Y2), 800, lr=2e-2,
    )
    mean_o, _ = gp_regression.predict(gp_p, Xs_train, Y2, Xs_test)[:2]
    oracle = float(jnp.mean((mean_o - Y2_test) ** 2)) / base

    # the committed c3 recipe
    cfg = mrd.Config(num_latent=4, num_inducing=32, num_views=2)
    opt = gp_optimizer(
        mrd.init_params(jax.random.PRNGKey(0), [Y1, Y2], cfg),
        lr=2e-2, decay_steps=args.steps,
    )
    multi = make_multi_step_fn(
        lambda p, a, b: mrd.loss(p, [a, b], cfg), opt, num_inner=500
    )
    best = None
    t0 = time.perf_counter()
    for r in range(args.restarts):
        p = mrd.init_params(jax.random.PRNGKey(r), [Y1, Y2], cfg)
        st = init_state(p, opt)
        for _ in range(args.steps // 500):
            st, losses = multi(st, Y1, Y2)
        e = -float(losses[-1])
        if best is None or e > best[1]:
            best = (st.params, e)
    params, elbo = best

    mean, var, *_ = prediction.predict_view_from_views(
        params, [Y1, Y2], cfg, observed={0: Y1_test}, target_view=1,
        num_steps=400,
    )
    mrd_ratio = float(jnp.mean((mean - Y2_test) ** 2)) / base
    pll = float(prediction.gaussian_predictive_loglik(
        Y2_test, mean, var, jnp.ones_like(Y2_test)) / Y2_test.size)

    artifact = {
        "protocol": "c3_mrd_twoview strided holdout (every 8th row)",
        "device": jax.devices()[0].device_kind,
        "mse_ratio_theory_floor": round(theory, 4),
        "mse_ratio_oracle_true_latents": round(oracle, 4),
        "mse_ratio_mrd": round(mrd_ratio, 4),
        "mrd_pll_per_dim": round(pll, 4),
        "mrd_best_elbo": round(elbo, 2),
        "mrd_over_oracle": round(mrd_ratio / oracle, 3),
        "seconds": round(time.perf_counter() - t0, 1),
        "note": "oracle is GIVEN the held-out rows' true shared latent "
                "coordinates — a strict upper bound on any cross-view "
                "predictor, which must additionally infer them from the "
                "observed view. The once-cited 0.23 'both-view bound' "
                "leaks the private coordinate and is not a cross-view "
                "ceiling.",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=2)
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
