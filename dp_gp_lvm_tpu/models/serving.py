"""Compile-once serving wrappers for trained models.

Production inference (the prompt's deployment/serving concern) for this
model family means repeated missing-data imputation / cross-view
prediction against a *fixed* trained model. These factories do all the
train-data-dependent work once (posterior caches), close over it, and
return a single jitted function with static shapes — so the serving path
is one XLA program per (batch-size, mask-pattern-free) signature, with
no retracing per request.

    imputer = make_dp_imputer(params, Y_train, config, num_steps=150)
    mean, var = imputer(y_batch, mask_batch)   # jitted, reusable
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.models import bgplvm, dp_gp_lvm, mrd, prediction

# Measured unroll-vs-tol crossover (results/serving_bench.json, TPU
# v5e at the mocap serving scale): tol early-stopping wins at batch 1
# but the convergence predicate is batch-global — the slowest row
# governs the early exit, and the lax.cond bookkeeping costs ~1.3x the
# plain step — so from ~batch 8 the fixed unroll is faster. "auto" mode
# (the default) picks per compiled batch shape: tol at
# batch <= TOL_MAX_BATCH, fixed unroll beyond. Batch size is static
# under jit, so the choice costs nothing at serving time.
TOL_MAX_BATCH = 4
AUTO_TOL = 1e-5
AUTO_TOL_CAP = 300      # step cap in tol mode (early exit governs)


def _resolve(tol, num_steps, batch: int):
    """(tol, num_steps) for one compiled batch shape. tol="auto" picks
    the measured-faster mode for this batch size; an explicit float or
    None is always honored as given."""
    if tol == "auto":
        if batch <= TOL_MAX_BATCH:
            return AUTO_TOL, max(num_steps, AUTO_TOL_CAP)
        return None, num_steps
    return tol, num_steps


def make_bgplvm_imputer(
    params, Y, config: bgplvm.Config, num_steps: int = 150, lr: float = 0.05,
    tol: float | str | None = "auto",
) -> Callable:
    """Returns jitted `impute(y_star, mask) -> (mean, var)`. tol="auto"
    (default) serves each batch size in its measured-faster mode; a
    float forces early-stopping, None forces the fixed unroll
    (num_steps stays the cap either way)."""
    cache = prediction.bgplvm_posterior(params, Y, config)
    qx_mean = params["qx_mean"]

    @jax.jit
    def impute(y_star, mask):
        t, steps = _resolve(tol, num_steps, y_star.shape[0])
        m0 = prediction.init_latent_from_nearest(qx_mean, Y, y_star, mask)
        m_s, s_s, _ = prediction.infer_latent(
            cache, y_star, mask, m0, steps, lr, kernel=config.kernel,
            tol=t,
        )
        return prediction.predict_from_latent(
            cache, m_s, s_s, kernel=config.kernel
        )

    return impute


def make_dp_imputer(
    params, Y, config: dp_gp_lvm.Config, num_steps: int = 150,
    lr: float = 0.05, tol: float | str | None = "auto",
) -> Callable:
    """Returns jitted `impute(y_star, mask) -> (mean, var)` mixing atoms.
    tol="auto" (default) picks the measured-faster latent-inference mode
    per batch size (see module constants)."""
    caches, phi = prediction.dp_posterior(params, Y, config)
    qx_mean = params["qx_mean"]

    @jax.jit
    def impute(y_star, mask):
        t, steps = _resolve(tol, num_steps, y_star.shape[0])
        m0 = prediction.init_latent_from_nearest(qx_mean, Y, y_star, mask)
        m_s, s_s, _ = prediction.dp_infer_latent(
            caches, phi, y_star, mask, m0, steps, lr,
            kernel=config.kernel, tol=t,
        )
        return prediction.dp_predict_from_latent(
            caches, phi, m_s, s_s, kernel=config.kernel
        )

    return impute


def make_dp_svi_imputer(
    params, config, num_steps: int = 150, lr: float = 0.05,
    tol: float | str | None = "auto",
) -> Callable:
    """Serving imputer for the minibatch-trained DP-SVI model — no
    training Y needed (the model carries explicit per-atom q(u|t)).
    The nearest-latent init candidates (an N-capped subsample of the
    training latents and their mixture-predicted means) are computed
    once here; each call is one compiled program per batch shape."""
    from dp_gp_lvm_tpu.models import dp_svi

    c = dp_svi.constrain(params)
    if "qx_mean" in c:
        qx, qx_var = c["qx_mean"], c["qx_var"]
        take = jnp.arange(0, qx.shape[0], max(1, qx.shape[0] // 2048))
        cand = qx[take]
        cand_mean, _ = dp_svi.predict_from_latent(
            params, cand, qx_var[take], config
        )

        def init0(y_star, mask):
            d2 = jnp.sum(
                ((y_star[:, None, :] - cand_mean[None, :, :]) ** 2)
                * mask[:, None, :],
                axis=-1,
            )
            return cand[jnp.argmin(d2, axis=1)]
    else:
        from dp_gp_lvm_tpu.models import amortized

        def init0(y_star, mask):
            return amortized.encoder_fill_init(c, y_star, mask)

    @jax.jit
    def impute(y_star, mask):
        t, steps = _resolve(tol, num_steps, y_star.shape[0])
        m0 = init0(y_star, mask)
        m_s, s_s, _ = dp_svi.infer_latent(
            params, y_star, mask, m0, config, steps, lr, t
        )
        return dp_svi.predict_from_latent(params, m_s, s_s, config)

    return impute


def make_mrd_svi_predictor(
    params, config, observed_view: int, target_view: int,
    num_steps: int = 150, lr: float = 0.05,
    tol: float | str | None = "auto",
) -> Callable:
    """Cross-view serving for the minibatch MRD family
    (models/mrd_svi.py): jitted `predict(y_observed_view) -> (mean,
    var)` from the explicit q(u^v) alone — unlike
    make_mrd_cross_view_predictor there is NO training data in the
    closure at all (no posterior-cache rebuild from full-batch
    statistics), so the factory works for models trained at any N,
    including streamed datasets that never lived on the device."""
    from dp_gp_lvm_tpu.models import mrd_svi

    # resident mode: hoist the params-only nearest-latent candidate
    # table (C-candidate predict_view pipeline) to factory time so each
    # new batch shape compiles only the inference scan + predictive
    init_table = (None if config.amortized
                  else mrd_svi.candidate_table(params, observed_view,
                                               config))

    @jax.jit
    def predict(y_obs):
        t, steps = _resolve(tol, num_steps, y_obs.shape[0])
        mean, var, *_ = mrd_svi.cross_view_predict(
            params, {observed_view: y_obs}, target_view, config,
            num_steps=steps, lr=lr, tol=t, init_table=init_table,
        )
        return mean, var

    return predict


def make_encoder_imputer(
    params, config, model: str = "svi_gplvm",
    refine_steps: int = 0, lr: float = 0.05,
) -> Callable:
    """One-forward-pass serving for AMORTIZED models
    (models/amortized.py): q(x*) = encode(y* with missing dims filled
    at the encoder center), then the psi-moment predictive — no
    per-row optimization loop at all, so imputation latency is two
    small matmuls plus the predictive, independent of any convergence
    schedule. refine_steps > 0 optionally follows with that many
    masked-ELL refinement steps from the encoded init (the encoder's
    variance head is trained on complete rows, so heavily-masked
    inputs benefit from a short refinement; measure per workload).

    model: "svi_gplvm" or "dp_svi" (both SVI families support
    Config.amortized)."""
    from dp_gp_lvm_tpu.models import amortized

    if model == "svi_gplvm":
        from dp_gp_lvm_tpu.models import svi_gplvm as mod
    elif model == "dp_svi":
        from dp_gp_lvm_tpu.models import dp_svi as mod
    else:
        raise ValueError(f"model must be 'svi_gplvm'|'dp_svi', got {model!r}")
    c = mod.constrain(params)
    if "enc_mean" not in c:
        raise ValueError(
            "make_encoder_imputer needs amortized params "
            "(Config.amortized=True); got a resident q(X) table"
        )

    @jax.jit
    def impute(y_star, mask):
        y_fill = jnp.where(mask > 0, y_star, c["enc_mean"][None, :])
        m0, s0 = amortized.encode(c, y_fill)
        if refine_steps:
            m_s, s_s, _ = mod.infer_latent(
                params, y_star, mask, m0, config, refine_steps, lr, None
            )
        else:
            m_s, s_s = m0, s0
        return mod.predict_from_latent(params, m_s, s_s, config)

    return impute


def make_mrd_cross_view_predictor(
    params, Ys, config: mrd.Config, observed_view: int, target_view: int,
    num_steps: int = 150, lr: float = 0.05, tol: float | str | None = "auto",
) -> Callable:
    """Returns jitted `predict(y_observed_view) -> (mean, var)`."""
    caches = prediction.mrd_posterior(params, Ys, config)
    qx_mean = params["qx_mean"]
    Y_obs_train = Ys[observed_view]

    @jax.jit
    def predict(y_obs):
        t, steps = _resolve(tol, num_steps, y_obs.shape[0])
        mask = jnp.ones_like(y_obs)
        m0 = prediction.init_latent_from_nearest(
            qx_mean, Y_obs_train, y_obs, mask
        )
        m_s, s_s, _ = prediction.mrd_infer_latent(
            caches, {observed_view: y_obs}, m0, steps, lr,
            kernel=config.kernel, tol=t,
        )
        return prediction.predict_from_latent(
            caches[target_view], m_s, s_s, kernel=config.kernel
        )

    return predict
