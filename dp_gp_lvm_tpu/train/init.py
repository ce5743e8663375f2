"""Initialization schemes: PCA latents, inducing-point selection, phi init.

PCA init of q(X) means is the standard GP-LVM starting point (SURVEY.md
section 3.5) and is required for matching reference ELBO trajectories from
the same start. All helpers are host-side numpy-compatible jnp (run once,
outside the jitted step).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pca_latents(Y, q: int):
    """Project Y (N, D) onto its top-q principal components, unit-scaled.

    Returns (N, q) latent means. Deterministic (SVD), matching the
    reference's PCA-based q(X) mean init.
    """
    Yc = Y - jnp.mean(Y, axis=0, keepdims=True)
    # economy SVD of centered data: Yc = U S V^T ; scores = U S
    u, sv, _ = jnp.linalg.svd(Yc, full_matrices=False)
    k = min(q, sv.shape[0])
    scores = u[:, :k] * sv[None, :k]
    # unit variance per retained component (scale-free latent space)
    std = jnp.maximum(jnp.std(scores, axis=0, keepdims=True), 1e-8)
    scores = scores / std
    if k < q:  # more latent dims requested than data rank: pad with zeros
        pad = jnp.zeros((Y.shape[0], q - k), Y.dtype)
        scores = jnp.concatenate([scores, pad], axis=1)
    return scores


def inducing_from_latents(rng, x_mean, num_inducing: int):
    """Z init: random subset of initial latent means (k-means-free)."""
    n = x_mean.shape[0]
    idx = jax.random.permutation(rng, n)[:num_inducing]
    return x_mean[idx]


def near_uniform_assignments(rng, d: int, t: int, noise_scale: float = 0.01):
    """phi logits init: near-uniform with a small symmetry-breaking jitter."""
    return noise_scale * jax.random.normal(rng, (d, t))
