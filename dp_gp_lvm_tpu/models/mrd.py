r"""MRD — Manifold Relevance Determination (Damianou et al. 2012).

Multiple observation views Y^(v) share one latent space q(X); each view has
its own ARD-RBF kernel (own ARD weights), noise, and inducing points
(SURVEY.md section 2a 'MRD'). ARD sparsity patterns across views separate
*shared* from *private* latent dimensions:

    ELBO = sum_v sum_{d in view v} F_vd - KL[q(X) || N(0, I)].

Views may have different output dimensionality, so per-view params live in
a (pytree) list and the view loop is a static Python loop — XLA still fuses
the whole ELBO into one program; the number of views is small and static.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

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
from dp_gp_lvm_tpu.models.bound import collapsed_bound
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.train.init import inducing_from_latents, pca_latents


class Config(NamedTuple):
    num_latent: int
    num_inducing: int
    num_views: int
    psi2_block: int | None = None
    # True | False | "auto": same crossover rule as models/dp_gp_lvm.py —
    # the fused Pallas suffstats kernel (Psi1 never in HBM) takes over per
    # view above ~5e8 tile elements (ops/dispatch.resolve_pallas).
    use_pallas: bool | str = "auto"
    kernel: str = "ard_rbf"
    fast_chol: bool = False    # skip the jitter search in the hot step
    hyperprior_std: float = 0.0    # log-normal prior on hypers (0 = off)


def init_params(rng, Ys: Sequence[jnp.ndarray], config: Config):
    """PCA init on the concatenated views; per-view kernels/inducing."""
    Yall = jnp.concatenate(list(Ys), axis=1)
    dtype = Yall.dtype
    x0 = pca_latents(Yall, config.num_latent).astype(dtype)
    q = config.num_latent
    rngs = jax.random.split(rng, len(Ys))
    views = []
    for r, _ in zip(rngs, Ys):
        views.append(
            {
                "z": inducing_from_latents(r, x0, config.num_inducing),
                "raw_variance": positive_inverse(jnp.asarray(1.0, dtype)),
                "raw_ard": positive_inverse(jnp.ones((q,), dtype)),
                "raw_noise": positive_inverse(jnp.asarray(0.1, dtype)),
            }
        )
    return {
        "qx_mean": x0,
        "raw_qx_var": positive_inverse(0.5 * jnp.ones_like(x0)),
        "views": views,
    }


def constrain_view(vp):
    return {
        "z": vp["z"],
        "variance": positive(vp["raw_variance"]),
        "ard": positive(vp["raw_ard"]),
        "noise": positive_noise(vp["raw_noise"]),
    }


def elbo_terms(params, Ys, config: Config, policy: JitterPolicy = JitterPolicy()):
    if config.fast_chol:
        policy = JitterPolicy(max_tries=0)
    mu = params["qx_mean"]
    s = positive_variational_var(params["raw_qx_var"])
    fit_per_view = []
    for vp, Y in zip(params["views"], Ys):
        hyp = constrain_view(vp)
        stats = dispatch.suff_stats(
            hyp["variance"], hyp["ard"], mu, s, hyp["z"], Y,
            block_n=config.psi2_block, use_pallas=config.use_pallas,
            kernel=config.kernel,
        )
        kuu = dispatch.gram(
            hyp["variance"], hyp["ard"], hyp["z"], kernel=config.kernel
        )
        terms = collapsed_bound(kuu, stats, hyp["noise"], policy)
        fit_per_view.append(jnp.sum(terms.per_dim))
    fit = sum(fit_per_view)
    kl_x = gaussian.kl_to_standard_normal(mu, s)
    from dp_gp_lvm_tpu.models.bgplvm import _log_normal_hyperprior

    hp = 0.0
    if config.hyperprior_std:
        for vp in params["views"]:
            h = constrain_view(vp)
            hp = hp + _log_normal_hyperprior(
                config.hyperprior_std, h["variance"], h["ard"], h["noise"]
            )
    return {
        "elbo": fit - kl_x + hp,
        "hyperprior": hp,
        "fit": fit,
        "kl_x": kl_x,
        "fit_per_view": jnp.stack(fit_per_view),
    }


def elbo(params, Ys, config: Config, policy: JitterPolicy = JitterPolicy()):
    return elbo_terms(params, Ys, config, policy)["elbo"]


def loss(params, Ys, config: Config):
    return -elbo(params, Ys, config)


def ard_relevance(params):
    """Per-view ARD weights (V, Q): the shared/private dimension signature.

    A latent dim q is 'shared' when its ARD weight is large in several
    views, 'private' when large in exactly one — the MRD readout.
    """
    return jnp.stack([positive(vp["raw_ard"]) for vp in params["views"]])
