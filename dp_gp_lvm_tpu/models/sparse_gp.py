r"""Sparse variational GP regression (SGPR, Titsias 2009) with ARD-RBF.

Observed-inputs specialization of the collapsed bound (SURVEY.md section 2a
'Sparse variational GP'): the psi statistics degenerate to
Psi1 = K_nm, Psi2 = K_mn K_nm, Psi0 = tr(K_nn) = N sigma_f^2.

Params: raw_variance (), raw_ard (Q,), raw_noise (), z (M, Q).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax as _lax

_HIGHEST = _lax.Precision.HIGHEST

from dp_gp_lvm_tpu.core.transforms import (
    positive,
    positive_inverse,
    positive_noise,
)
from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.linalg import tri_solve
from dp_gp_lvm_tpu.models.bound import (
    SuffStats,
    collapsed_bound,
    optimal_qu,
    suff_stats_from_psi,
)


def init_params(rng, X, num_inducing: int):
    """Z initialized from a random subset of the inputs."""
    n, q = X.shape
    idx = jax.random.permutation(rng, n)[:num_inducing]
    one = jnp.asarray(1.0, X.dtype)
    return {
        "raw_variance": positive_inverse(one),
        "raw_ard": positive_inverse(jnp.ones((q,), X.dtype)),
        "raw_noise": positive_inverse(jnp.asarray(0.1, X.dtype)),
        "z": X[idx],
    }


def constrain(params):
    return {
        "variance": positive(params["raw_variance"]),
        "ard": positive(params["raw_ard"]),
        "noise": positive_noise(params["raw_noise"]),
        "z": params["z"],
    }


def _stats(hyp, X, Y) -> SuffStats:
    p0, p1, p2 = ard_rbf.observed_psi(hyp["variance"], hyp["ard"], X, hyp["z"])
    return suff_stats_from_psi(p0, p1, p2, Y)


def elbo(params, X, Y, policy: JitterPolicy = JitterPolicy()):
    """Collapsed lower bound on log p(Y | X), summed over output dims."""
    hyp = constrain(params)
    kuu = ard_rbf.gram(hyp["variance"], hyp["ard"], hyp["z"])
    terms = collapsed_bound(kuu, _stats(hyp, X, Y), hyp["noise"], policy)
    return jnp.sum(terms.per_dim)


def loss(params, X, Y):
    return -elbo(params, X, Y)


def predict(params, X, Y, X_star, policy: JitterPolicy = JitterPolicy()):
    """Predictive mean (N*, D) and marginal variance (N*,) incl. noise."""
    hyp = constrain(params)
    kuu = ard_rbf.gram(hyp["variance"], hyp["ard"], hyp["z"])
    stats = _stats(hyp, X, Y)
    w, L, LB = optimal_qu(kuu, stats, hyp["noise"], policy)
    ksu = ard_rbf.gram(hyp["variance"], hyp["ard"], X_star, hyp["z"])
    mean = jnp.dot(ksu, w, precision=_HIGHEST)
    # var = k** - k_su (K_uu^{-1} - (K_uu + beta Psi2)^{-1}) k_us + noise
    a = tri_solve(L, ksu.T)            # L^{-1} k_us
    b = tri_solve(LB, a)               # LB^{-1} L^{-1} k_us
    var = (
        ard_rbf.gram_diag(hyp["variance"], hyp["ard"], X_star)
        - jnp.sum(a * a, axis=0)
        + jnp.sum(b * b, axis=0)
        + hyp["noise"]
    )
    return mean, var
