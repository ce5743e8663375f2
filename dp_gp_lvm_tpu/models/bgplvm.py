r"""Bayesian GP-LVM (Titsias & Lawrence 2010) — collapsed variational bound.

Latent X is unobserved with q(X) = prod N(x_n | mu_n, diag(s_n));
all D output dims share one ARD-RBF kernel and noise (SURVEY.md section 2a
'Bayesian GP-LVM', call stack 3.1):

    ELBO = sum_d F_d(Psi0, Psi1, Psi2, K_uu, sigma^2) - KL[q(X) || N(0,I)].

Params (unconstrained pytree):
    qx_mean (N, Q), raw_qx_var (N, Q),
    z (M, Q), raw_variance (), raw_ard (Q,), raw_noise ().

This module is also the single-view / single-atom special case of MRD and
DP-GP-LVM and is the minimum end-to-end slice (SURVEY.md section 7).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.core.transforms import (
    positive,
    positive_inverse,
    positive_noise,
    positive_variational_var,
)
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.distributions import gaussian
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.models.bound import collapsed_bound, suff_stats_from_psi
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.train.init import inducing_from_latents, pca_latents


class Config(NamedTuple):
    """Static model hyperparameters (hashable; safe as a jit static arg)."""

    num_latent: int
    num_inducing: int
    psi2_block: int | None = None  # chunk size over N for Psi2 accumulation
    use_pallas: bool = False       # fused Pallas psi kernels (ops/pallas)
    kernel: str = "ard_rbf"        # "ard_rbf" | "linear"
    fast_chol: bool = False    # skip the jitter search in the hot step
    hyperprior_std: float = 0.0    # log-normal prior on hypers (0 = off)


def init_params(rng, Y, config: Config):
    """PCA-initialized params, matching the reference's init scheme."""
    dtype = Y.dtype
    x0 = pca_latents(Y, config.num_latent).astype(dtype)
    z0 = inducing_from_latents(rng, x0, config.num_inducing)
    q = config.num_latent
    return {
        "qx_mean": x0,
        "raw_qx_var": positive_inverse(0.5 * jnp.ones_like(x0)),
        "z": z0,
        "raw_variance": positive_inverse(jnp.asarray(1.0, dtype)),
        "raw_ard": positive_inverse(jnp.ones((q,), dtype)),
        "raw_noise": positive_inverse(jnp.asarray(0.1, dtype)),
    }


def constrain(params):
    return {
        "qx_mean": params["qx_mean"],
        "qx_var": positive_variational_var(params["raw_qx_var"]),
        "z": params["z"],
        "variance": positive(params["raw_variance"]),
        "ard": positive(params["raw_ard"]),
        "noise": positive_noise(params["raw_noise"]),
    }




def _log_normal_hyperprior(std, *values):
    """sum of log N(log v | 0, std^2) up to constants — the weak
    'default hyperprior' regularizer (SURVEY.md L1); 0 disables."""
    if not std:
        return 0.0
    tot = 0.0
    for v in values:
        lv = jnp.log(v)
        tot = tot - 0.5 * jnp.sum(lv * lv) / (std * std)
    return tot


def elbo_terms(params, Y, config: Config, policy: JitterPolicy = JitterPolicy()):
    """Per-term ELBO decomposition (the primary parity-debugging tool)."""
    if config.fast_chol:
        policy = JitterPolicy(max_tries=0)
    hyp = constrain(params)
    mu, s, z = hyp["qx_mean"], hyp["qx_var"], hyp["z"]
    p0, p1, p2 = dispatch.psi_stats(
        hyp["variance"], hyp["ard"], mu, s, z, block_n=config.psi2_block,
        use_pallas=config.use_pallas, kernel=config.kernel,
    )
    kuu = dispatch.gram(hyp["variance"], hyp["ard"], z, kernel=config.kernel)
    stats = suff_stats_from_psi(p0, p1, p2, Y)
    terms = collapsed_bound(kuu, stats, hyp["noise"], policy)
    fit = jnp.sum(terms.per_dim)
    kl_x = gaussian.kl_to_standard_normal(mu, s)
    hp = _log_normal_hyperprior(
        config.hyperprior_std, hyp["variance"], hyp["ard"], hyp["noise"]
    )
    return {
        "elbo": fit - kl_x + hp,
        "hyperprior": hp,
        "fit": fit,
        "kl_x": kl_x,
        "logdet_b": terms.logdet_b,
        "trace_a": terms.trace_a,
        "jitter": terms.jitter,
    }


def elbo(params, Y, config: Config, policy: JitterPolicy = JitterPolicy()):
    return elbo_terms(params, Y, config, policy)["elbo"]


def loss(params, Y, config: Config):
    return -elbo(params, Y, config)
