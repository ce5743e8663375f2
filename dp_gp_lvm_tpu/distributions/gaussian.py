r"""Diagonal Gaussian variational posterior q(X) and its KL terms.

q(X) = prod_{n,q} N(x_nq | mu_nq, s_nq)  with standard-normal prior
p(X) = N(0, I) (SURVEY.md section 2a 'Gaussian q(X)').

KL[q(X) || N(0, I)] = 1/2 sum_{n,q} (mu^2 + s - log s - 1).

The KL decomposes as a sum over n, so it shards exactly like the data axis
in the data-parallel ELBO (parallel/): per-shard partial KLs are psummed.
"""
from __future__ import annotations

import jax.numpy as jnp


def kl_to_standard_normal(mu, s, weights=None):
    """KL[q(X)||N(0,I)] for mu, s of shape (N, Q); optional row weights."""
    per_row = 0.5 * jnp.sum(mu * mu + s - jnp.log(s) - 1.0, axis=-1)
    if weights is not None:
        per_row = per_row * weights
    return jnp.sum(per_row)


def log_prob_diag(x, mu, s):
    """Elementwise-independent Gaussian log density, summed over last axis."""
    d = x - mu
    return -0.5 * jnp.sum(
        d * d / s + jnp.log(s) + jnp.log(2.0 * jnp.pi).astype(x.dtype), axis=-1
    )


def sample(rng, mu, s, num_samples: int):
    """Draw (num_samples, N, Q) samples from q(X) — MC oracle for psi tests."""
    import jax

    eps = jax.random.normal(rng, (num_samples,) + mu.shape, dtype=mu.dtype)
    return mu[None] + jnp.sqrt(s)[None] * eps
