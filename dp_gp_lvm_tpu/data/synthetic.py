"""Synthetic dataset generators matching the BASELINE configs.

- `toy_gplvm`: GP draws from a Q-dim latent (config 1: N=100, D=10, Q=2).
- `two_view`: shared + private latent structure for MRD (config 3).
- `grouped_dims`: output-dimension groups with distinct latent dependence,
  the planted-structure recovery test for DP-GP-LVM (config 4 synthetic).
- `oil_flow_like`: N=1000, D=12 three-regime surrogate for the oil-flow
  benchmark (config 2) — same shape/statistics family; the real dataset
  loader lives in data/oil_flow.py and falls back to this when the file is
  absent (zero-egress environment).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.linalg import safe_cholesky


def _gp_draws(rng, X, ard, num_out, noise, variance=1.0):
    """Draw num_out independent GP function values over rows of X."""
    n = X.shape[0]
    k = ard_rbf.gram(jnp.asarray(variance, X.dtype), ard, X)
    L, _ = safe_cholesky(k)
    r1, r2 = jax.random.split(rng)
    f = L @ jax.random.normal(r1, (n, num_out), X.dtype)
    return f + jnp.sqrt(noise) * jax.random.normal(r2, (n, num_out), X.dtype)


def toy_gplvm(rng, n=100, d=10, q_true=2, q_total=None, noise=0.01,
              dtype=jnp.float64):
    """Config 1 data: D outputs driven by q_true active latent dims.

    Returns (Y, X_true). With q_total > q_true, the generating ARD weights
    are zero on the inactive dims — the ARD-recovery check.
    """
    q_total = q_total or q_true
    r1, r2 = jax.random.split(rng)
    X = jax.random.normal(r1, (n, q_total), dtype)
    ard = jnp.concatenate(
        [jnp.ones((q_true,), dtype), jnp.zeros((q_total - q_true,), dtype)]
    )
    Y = _gp_draws(r2, X, ard, d, noise)
    Y = (Y - Y.mean(axis=0)) / Y.std(axis=0)
    return Y, X


def two_view(rng, n=100, d1=8, d2=8, q_shared=1, q_private=1, noise=0.01,
             dtype=jnp.float64):
    """Config 3 data: two views sharing q_shared latent dims, each with its
    own q_private dims. Returns (Y1, Y2, X) with X = [shared, priv1, priv2].
    """
    r0, r1, r2 = jax.random.split(rng, 3)
    q = q_shared + 2 * q_private
    X = jax.random.normal(r0, (n, q), dtype)
    ard1 = jnp.concatenate([
        jnp.ones((q_shared,), dtype),
        jnp.ones((q_private,), dtype),
        jnp.zeros((q_private,), dtype),
    ])
    ard2 = jnp.concatenate([
        jnp.ones((q_shared,), dtype),
        jnp.zeros((q_private,), dtype),
        jnp.ones((q_private,), dtype),
    ])
    Y1 = _gp_draws(r1, X, ard1, d1, noise)
    Y2 = _gp_draws(r2, X, ard2, d2, noise)
    std = lambda Y: (Y - Y.mean(axis=0)) / Y.std(axis=0)
    return std(Y1), std(Y2), X


def grouped_dims(rng, n=100, dims_per_group=(6, 6), q=3, noise=0.01,
                 dtype=jnp.float64):
    """Config-4 recovery data: groups of output dims, each group driven by a
    *different* subset of latent dims. Returns (Y, labels, X)."""
    num_groups = len(dims_per_group)
    rngs = jax.random.split(rng, num_groups + 1)
    X = jax.random.normal(rngs[0], (n, q), dtype)
    Ys, labels = [], []
    for g, dg in enumerate(dims_per_group):
        # group g depends on latent dim g (mod q) only
        ard = jnp.zeros((q,), dtype).at[g % q].set(1.0)
        Ys.append(_gp_draws(rngs[g + 1], X, ard, dg, noise))
        labels += [g] * dg
    Y = jnp.concatenate(Ys, axis=1)
    Y = (Y - Y.mean(axis=0)) / Y.std(axis=0)
    return Y, jnp.asarray(labels), X


def oil_flow_like(rng, n=1000, d=12, dtype=jnp.float64):
    """Three-regime multiphase-flow surrogate (config 2 shape: N=1000, D=12).

    Three well-separated clusters in a 2-dim latent, mapped through smooth
    GP-like random features — mimics the oil-flow dataset's structure.
    """
    r0, r1, r2, r3 = jax.random.split(rng, 4)
    labels = jax.random.randint(r0, (n,), 0, 3)
    centers = jnp.asarray([[-2.0, 0.0], [2.0, 0.0], [0.0, 2.5]], dtype)
    X = centers[labels] + 0.3 * jax.random.normal(r1, (n, 2), dtype)
    # random Fourier feature map to D outputs
    W = jax.random.normal(r2, (2, d), dtype)
    b = jax.random.uniform(r3, (d,), dtype, 0.0, 2.0 * jnp.pi)
    Y = jnp.sin(X @ W + b[None, :])
    Y = (Y - Y.mean(axis=0)) / Y.std(axis=0)
    return Y, labels, X


def mocap_like(rng, n=1024, d=59, q_true=4, noise=0.02, dtype=jnp.float64):
    """CMU-mocap-shaped surrogate (config 4/5 scale: N~1k, D~60): smooth
    low-dimensional trajectories through a high-dim joint-angle space."""
    r1, r2 = jax.random.split(rng)
    t = jnp.linspace(0.0, 8.0 * jnp.pi, n, dtype=dtype)[:, None]
    freqs = 0.5 + jnp.arange(q_true, dtype=dtype)[None, :] * 0.35
    phases = jax.random.uniform(r1, (1, q_true), dtype, 0.0, 2 * jnp.pi)
    X = jnp.sin(t * freqs + phases)
    W = jax.random.normal(r2, (q_true, d), dtype) / jnp.sqrt(q_true)
    Y = X @ W + noise * jax.random.normal(rng, (n, d), dtype)
    Y = (Y - Y.mean(axis=0)) / Y.std(axis=0)
    return Y, X
