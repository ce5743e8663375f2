r"""Amortized variational inference (recognition network) for the SVI
model families: q(x_n) = N(mu_w(y_n), diag s_w(y_n)).

Why (TPU-first redesign, beyond the reference): the reference — and the
resident SVI paths here — keep a free-form q(X) table of N x Q means and
variances plus optimizer moments, so the variational state grows O(N)
and every step gathers rows by index. Amortizing q(X) through a shared
recognition network (Lawrence & Quiñonero-Candela's back-constraints;
the GP-LVM recognition models of Dai et al. 2015, "Variationally
Auto-encoded Deep GPs") makes the state O(encoder), which

  * completes the beyond-HBM-N story: with the streaming input pipeline
    (data/stream.py) NOTHING scales with N on the device — rows stream
    through the encoder inside the same jitted step;
  * serves latents for NEW rows in one forward pass (no per-row
    optimization loop at test time);
  * acts as the classic back-constraint: nearby outputs get nearby
    latents by construction, a smoothness prior the free table lacks.

The bound is the standard minibatch Hensman/Titsias estimate with
(mu_b, s_b) = encode(y_b) substituted for the table gather; it remains
a valid ELBO (a restriction of the variational family), so
elbo_amortized <= elbo_free_table at the respective optima.

Architecture: PCA-initialized linear readout plus a zero-initialized
tanh-MLP correction,

    h      = tanh(y W1 + b1)                       (hidden, optional)
    mu     = y Wlin + h Wm + bm
    raw_s  = h Ws + bs_raw                         (softplus + floor)

Zero-initializing Wm/Ws/W1-independent heads makes encode(Y) at init
EXACTLY the resident init (PCA means, 0.5 variances), so amortized and
resident training start from the same q(X) — and with hidden=0 and
one-hot rows the encoder can represent any table exactly, giving the
equivalence oracle used in tests/test_amortized.py.

Leaf naming: every leaf is prefixed "enc_" so model `constrain`
functions pass them through raw and `gp_optimizer` labels them "var"
(full learning rate — recognition weights are variational parameters).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.core.transforms import (
    positive_inverse,
    positive_variational_var,
)
from dp_gp_lvm_tpu.train.init import pca_latents

_HIGHEST = jax.lax.Precision.HIGHEST

ENCODER_PREFIX = "enc_"


def is_encoder_leaf(name: str) -> bool:
    return name.startswith(ENCODER_PREFIX)


def init_encoder(rng, Y, q: int, hidden: int, dtype=None) -> dict:
    """Encoder leaves whose initial encode(Y) equals the resident init
    (PCA latents, variance 0.5).

    The PCA readout solves Wlin = lstsq(Yc, pca_latents(Y)) so
    y -> (y - mean) Wlin reproduces the PCA scores exactly (PCA scores
    ARE a linear map of centered Y; lstsq recovers it without forming
    V/S explicitly). MLP correction heads start at zero.
    """
    dtype = dtype or Y.dtype
    d = Y.shape[1]
    mean = jnp.mean(Y, axis=0)
    x0 = pca_latents(Y, q).astype(dtype)
    wlin, *_ = jnp.linalg.lstsq(Y - mean[None, :], x0)
    params = {
        "enc_mean": mean.astype(dtype),
        "enc_wlin": wlin.astype(dtype),
        "enc_bm": jnp.zeros((q,), dtype),
        # raw variance bias: softplus^{-1} so s(y) starts at 0.5
        "enc_bs": jnp.full((q,), positive_inverse(
            jnp.asarray(0.5, dtype)
        ), dtype),
    }
    if hidden > 0:
        k1, _ = jax.random.split(rng)
        scale = jnp.asarray(1.0 / jnp.sqrt(d), dtype)
        params.update({
            "enc_w1": jax.random.normal(k1, (d, hidden), dtype) * scale,
            "enc_b1": jnp.zeros((hidden,), dtype),
            # zero heads: the MLP contributes nothing at init
            "enc_wm": jnp.zeros((hidden, q), dtype),
            "enc_ws": jnp.zeros((hidden, q), dtype),
        })
    return params


def qx_batch(c, y, idx):
    """q(X) moments for data rows from a constrained param dict: a
    table gather (resident mode, "qx_mean" present) or a recognition-
    network forward pass (amortized mode). idx=None means "all rows of
    y" (full-batch paths). Shared by svi_gplvm and dp_svi so every
    bound/serving path works in both modes."""
    if "qx_mean" in c:
        if idx is None:
            return c["qx_mean"], c["qx_var"]
        return c["qx_mean"][idx], c["qx_var"][idx]
    return encode(c, y)


def qx_leaves_or_encoder(rng, Y, q: int, config) -> dict:
    """The q(X) half of a model's init_params: encoder leaves when
    config.amortized, else the resident (N, Q) table at the SAME
    initial q(X) (PCA means, 0.5 variances)."""
    if getattr(config, "amortized", False):
        return init_encoder(rng, Y, q, config.encoder_hidden, Y.dtype)
    x0 = pca_latents(Y, q).astype(Y.dtype)
    return {
        "qx_mean": x0,
        "raw_qx_var": positive_inverse(0.5 * jnp.ones_like(x0)),
    }


def encoder_fill_init(c, y_star, mask):
    """Amortized one-pass q(x*) init for serving: missing dims filled
    at the encoder center contribute exactly zero after centering."""
    y_fill = jnp.where(mask > 0, y_star, c["enc_mean"][None, :])
    m0, _ = encode(c, y_fill)
    return m0


def encode(params, y):
    """(mu (B, Q), s (B, Q)): amortized q(x) moments for rows y (B, D).
    `params` may be the raw or constrained dict — encoder leaves are
    unconstrained and pass through `constrain` untouched.

    "enc_var_floor" (a static float the model's `constrain` copies from
    Config.qx_var_floor) adds an additive lower bound on the encoded
    variance: a valid restriction of the variational family that keeps
    q(X) from collapsing to near-deterministic at big-N amortized scale
    — collapsed variances make the batch psi statistics hyper-local, so
    batch-to-batch whitened-stat variance explodes and the stochastic
    natural-gradient q(u) recursion diverges (the round-3 c8 failure;
    measured in experiments/debug_c8.py)."""
    yc = y - params["enc_mean"][None, :]
    mu = jnp.dot(yc, params["enc_wlin"], precision=_HIGHEST) \
        + params["enc_bm"][None, :]
    raw_s = params["enc_bs"][None, :] + jnp.zeros_like(mu)
    if "enc_w1" in params:
        h = jnp.tanh(
            jnp.dot(yc, params["enc_w1"], precision=_HIGHEST)
            + params["enc_b1"][None, :]
        )
        mu = mu + jnp.dot(h, params["enc_wm"], precision=_HIGHEST)
        raw_s = raw_s + jnp.dot(h, params["enc_ws"], precision=_HIGHEST)
    s = positive_variational_var(raw_s)
    floor = params.get("enc_var_floor", 0.0)
    if floor:
        s = s + jnp.asarray(floor, s.dtype)
    return mu, s
