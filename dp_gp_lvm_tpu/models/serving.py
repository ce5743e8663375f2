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


def make_bgplvm_imputer(
    params, Y, config: bgplvm.Config, num_steps: int = 150, lr: float = 0.05,
    tol: float | None = None,
) -> Callable:
    """Returns jitted `impute(y_star, mask) -> (mean, var)`. `tol`
    enables early-stopped latent inference (num_steps stays the cap)."""
    cache = prediction.bgplvm_posterior(params, Y, config)
    qx_mean = params["qx_mean"]

    @jax.jit
    def impute(y_star, mask):
        m0 = prediction.init_latent_from_nearest(qx_mean, Y, y_star, mask)
        m_s, s_s, _ = prediction.infer_latent(
            cache, y_star, mask, m0, num_steps, lr, kernel=config.kernel,
            tol=tol,
        )
        return prediction.predict_from_latent(
            cache, m_s, s_s, kernel=config.kernel
        )

    return impute


def make_dp_imputer(
    params, Y, config: dp_gp_lvm.Config, num_steps: int = 150,
    lr: float = 0.05, tol: float | None = None,
) -> Callable:
    """Returns jitted `impute(y_star, mask) -> (mean, var)` mixing atoms."""
    caches, phi = prediction.dp_posterior(params, Y, config)
    qx_mean = params["qx_mean"]

    @jax.jit
    def impute(y_star, mask):
        m0 = prediction.init_latent_from_nearest(qx_mean, Y, y_star, mask)
        m_s, s_s, _ = prediction.dp_infer_latent(
            caches, phi, y_star, mask, m0, num_steps, lr,
            kernel=config.kernel, tol=tol,
        )
        return prediction.dp_predict_from_latent(
            caches, phi, m_s, s_s, kernel=config.kernel
        )

    return impute


def make_mrd_cross_view_predictor(
    params, Ys, config: mrd.Config, observed_view: int, target_view: int,
    num_steps: int = 150, lr: float = 0.05, tol: float | None = None,
) -> Callable:
    """Returns jitted `predict(y_observed_view) -> (mean, var)`."""
    caches = prediction.mrd_posterior(params, Ys, config)
    qx_mean = params["qx_mean"]
    Y_obs_train = Ys[observed_view]

    @jax.jit
    def predict(y_obs):
        mask = jnp.ones_like(y_obs)
        m0 = prediction.init_latent_from_nearest(
            qx_mean, Y_obs_train, y_obs, mask
        )
        m_s, s_s, _ = prediction.mrd_infer_latent(
            caches, {observed_view: y_obs}, m0, num_steps, lr,
            kernel=config.kernel, tol=tol,
        )
        return prediction.predict_from_latent(
            caches[target_view], m_s, s_s, kernel=config.kernel
        )

    return predict
