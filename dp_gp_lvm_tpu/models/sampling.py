r"""Pathwise posterior function sampling (Matheron's rule, decoupled).

Draws joint function samples f_s ~ p(f | data) from the trained sparse-GP
families — the generative counterpart of models/prediction.py's moment
predictions. A GP-LVM is a generative model; sampling novel outputs from
a path through latent space (new poses along a trajectory, new oil-flow
configurations) needs *function* draws that are consistent across test
points, which the marginal predictive mean/var cannot provide.

Method — decoupled sampling (Wilson et al. 2020, "Efficiently Sampling
Functions from Gaussian Process Posteriors"):

    f_s(x) = f_prior_s(x) + k(x, Z) K_uu^{-1} (u_s - f_prior_s(Z))

where f_prior_s is a draw from the GP prior represented in a finite
feature basis and u_s ~ q(u) is an exact draw from the (collapsed-
optimal) inducing posterior.  The update term is Matheron's rule: it
corrects the prior draw to interpolate the sampled inducing values, so
the posterior-sample marginals converge to the exact predictive as the
feature count grows (exactly, for kernels with exact finite features).

Prior feature bases:
  ard_rbf — random Fourier features (Rahimi & Recht 2007). With the
    repo's convention k(x,x') = sigma^2 exp(-1/2 sum_q alpha_q (x_q-x'_q)^2)
    (kernels/ard_rbf.py:8), Bochner gives omega ~ N(0, diag(alpha)):
        phi_l(x) = sqrt(2 sigma^2 / L) cos(omega_l . x + b_l),  b ~ U[0, 2pi).
  linear — the feature map is EXACT and Q-dimensional:
        k(x,x') = sigma^2 sum_q alpha_q x_q x'_q = phi(x) . phi(x'),
        phi(x) = sqrt(sigma^2 alpha) * x            (kernels/linear.py:26).

Exact q(u) draws from the collapsed cache (models/prediction.py):
with L = chol(K_uu), B = I + beta L^{-1} Psi2 L^{-T}, LB = chol(B), the
Titsias-optimal q(u) is N(m, Sigma_u) with K_uu^{-1} m = cache.w and
Sigma_u = K_uu (K_uu + beta Psi2)^{-1} K_uu = (L LB^{-T})(L LB^{-T})^T,
so u_s = L L^T w + L LB^{-T} eps, eps ~ N(0, I_M).

TPU shape discipline: the sampler is built ONCE (all Cholesky work and
per-sample weights precomputed); evaluating S samples at N* points is
then two MXU matmuls — (N*,L)x(L,S*D) features and (N*,M)x(M,S*D)
Matheron correction — with no per-sample loop.

No reference-file citation is possible (the /root/reference mount has
been empty every round — SURVEY.md provenance note); capability is the
published GP-LVM generative use (Titsias & Lawrence 2010 sample novel
outputs from the latent space) extended TPU-first.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from dp_gp_lvm_tpu.kernels import ard_rbf, linear
from dp_gp_lvm_tpu.linalg import tri_solve
from dp_gp_lvm_tpu.models.prediction import PosteriorCache

_HIGHEST = lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class PathwiseSampler:
    """Precomputed pathwise posterior draws; evaluate with sample_at().

    A pytree whose `kernel` field is STATIC metadata (registered below),
    so samplers jit/vmap cleanly — vmapping over atoms maps the array
    leaves and requires the kernel name to agree.

    Leaves (S samples, M inducing, D output dims, L features, Q latents):
      freqs  (L, Q)  feature frequencies (RFF omega, or the exact
                     linear-feature scaling rows)
      phases (L,)    RFF phase offsets b (zeros for linear)
      scale  ()      feature amplitude: sqrt(2 sigma^2 / L) for RFF, 1
                     for linear (folded into freqs)
      wts    (S, L, D) prior feature weights w_s ~ N(0, I)
      v      (S, M, D) Matheron correction K_uu^{-1}(u_s - f_prior_s(Z))
      variance, ard, z: kernel hypers + inducing inputs for k(x, Z)
    """

    freqs: jnp.ndarray
    phases: jnp.ndarray
    scale: jnp.ndarray
    wts: jnp.ndarray
    v: jnp.ndarray
    variance: jnp.ndarray
    ard: jnp.ndarray
    z: jnp.ndarray
    kernel: str


jax.tree_util.register_dataclass(
    PathwiseSampler,
    data_fields=["freqs", "phases", "scale", "wts", "v", "variance",
                 "ard", "z"],
    meta_fields=["kernel"],
)


def _prior_features(x, sampler_or_tuple):
    """Feature matrix phi(x): (N, L)."""
    freqs, phases, scale, kernel = (
        sampler_or_tuple.freqs,
        sampler_or_tuple.phases,
        sampler_or_tuple.scale,
        sampler_or_tuple.kernel,
    )
    proj = jnp.dot(x, freqs.T, precision=_HIGHEST)       # (N, L)
    if kernel == "linear":
        return proj
    return scale * jnp.cos(proj + phases[None, :])


def qu_draws(rng, cache: PosteriorCache, num_samples: int, num_dims: int):
    """Exact draws u_s ~ q(u): (S, M, D). Shared covariance across dims.

    m = K_uu w = L L^T w; Sigma_u^{1/2} = L LB^{-T} (see module docstring).
    """
    m_u = cache.L @ (cache.L.T @ cache.w)                # (M, D)
    # C = L LB^{-T}: C^T = LB^{-1} L^T, i.e. solve LB C^T = L^T (no
    # transpose — LB^T C^T = L^T would give C C^T = L (LB^T LB)^{-1} L^T,
    # which is NOT Sigma_u = L B^{-1} L^T).
    c_t = tri_solve(cache.LB, cache.L.T, lower=True)
    eps = jax.random.normal(
        rng, (num_samples, cache.L.shape[0], num_dims), dtype=cache.w.dtype
    )
    u = m_u[None] + jnp.einsum(
        "km,skd->smd", c_t, eps, precision=_HIGHEST
    )
    return u


def _feature_basis(r_w, r_b, kernel, variance, ard, num_features,
                   num_latent, dtype):
    """(freqs, phases, scale) for the prior feature map (module
    docstring): exact Q linear features, or L RFF cosines for ard_rbf."""
    if kernel == "linear":
        # exact features: phi(x) = sqrt(sigma^2 alpha) * x  (Q of them)
        freqs = jnp.sqrt(variance * ard)[:, None] * jnp.eye(
            num_latent, dtype=dtype
        )
        phases = jnp.zeros((num_latent,), dtype)
        scale = jnp.asarray(1.0, dtype)
    elif kernel == "ard_rbf":
        freqs = jnp.sqrt(ard)[None, :] * jax.random.normal(
            r_w, (num_features, num_latent), dtype=dtype
        )
        phases = jax.random.uniform(
            r_b, (num_features,), dtype, 0.0, 2.0 * jnp.pi
        )
        scale = jnp.sqrt(2.0 * variance / num_features).astype(dtype)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    return freqs, phases, scale


def _matheron_finish(partial: PathwiseSampler, u, L) -> PathwiseSampler:
    """Complete a sampler from q(u) draws: evaluate the prior draws at
    Z, form the Matheron residual, and solve v = K_uu^{-1}(u_s - f0(Z))
    as one batched (M, S*D) triangular-solve pair. Shared by the
    collapsed-cache and explicit-whitened-q(u) samplers — the solve and
    reshape live in exactly one place."""
    phi_z = _prior_features(partial.z, partial)          # (M, L)
    f0_z = jnp.einsum(
        "ml,sld->smd", phi_z, partial.wts, precision=_HIGHEST
    )
    rhs = u - f0_z                                       # (S, M, D)
    m = L.shape[0]
    num_samples, _, d = u.shape
    rhs_flat = jnp.moveaxis(rhs, 1, 0).reshape(m, -1)    # (M, S*D)
    v_flat = tri_solve(L, tri_solve(L, rhs_flat), trans=True)
    v = jnp.moveaxis(v_flat.reshape(m, num_samples, d), 0, 1)
    return dataclasses.replace(partial, v=v)


def make_pathwise_sampler(
    rng,
    cache: PosteriorCache,
    num_samples: int,
    num_latent: int,
    num_features: int = 2048,
    kernel: str = "ard_rbf",
) -> PathwiseSampler:
    """Build S pathwise posterior draws from a trained PosteriorCache.

    num_latent: Q (static — freqs shape). All expensive work (feature
    draw, q(u) draw, the two triangular solves) happens here, once.

    kernel MUST match the kernel the cache was built with (config.kernel
    at training time): Matheron's prior cancellation needs the prior
    basis covariance and cache.L = chol(K_uu) to describe the same
    kernel; mixing them silently skews the posterior sample covariance.
    """
    dtype = cache.w.dtype
    d = cache.w.shape[1]
    r_w, r_b, r_wts, r_u = jax.random.split(rng, 4)
    freqs, phases, scale = _feature_basis(
        r_w, r_b, kernel, cache.variance, cache.ard, num_features,
        num_latent, dtype,
    )
    num_features = freqs.shape[0]
    wts = jax.random.normal(r_wts, (num_samples, num_features, d), dtype)

    partial = PathwiseSampler(
        freqs=freqs, phases=phases, scale=scale, wts=wts,
        v=jnp.zeros((num_samples, cache.L.shape[0], d), dtype),
        variance=cache.variance, ard=cache.ard, z=cache.z, kernel=kernel,
    )
    u = qu_draws(r_u, cache, num_samples, d)             # (S, M, D)
    return _matheron_finish(partial, u, cache.L)


def make_svi_pathwise_sampler(
    rng,
    params,
    config,
    num_samples: int,
    num_features: int = 2048,
) -> PathwiseSampler:
    """Pathwise draws from the EXPLICIT whitened q(u) of the SVI
    families (models/svi_gplvm.py; a view of models/mrd_svi.py via
    `mrd_svi._view_params`): the whitened parameterization is
    u = L v with v ~ N(u_mean, Ls Ls^T) and L = chol(K_uu), so exact
    q(u) draws are

        u_s = L (u_mean + Ls eps_s),   eps_s ~ N(0, I_M)

    and Matheron's correction solves against the same L. Unlike
    make_pathwise_sampler there is NO collapsed cache and NO training
    data involved — the generative path works for models trained at any
    N (streamed datasets included), the same property as the SVI
    serving paths. Returns the same PathwiseSampler pytree; evaluate
    with sample_at()."""
    from dp_gp_lvm_tpu.core.types import JitterPolicy
    from dp_gp_lvm_tpu.linalg import safe_cholesky
    from dp_gp_lvm_tpu.models import svi_gplvm as svi
    from dp_gp_lvm_tpu.ops import dispatch

    c = svi.constrain(params, config)
    kernel = config.kernel
    dtype = c["u_mean"].dtype
    m, d = c["u_mean"].shape
    q = c["ard"].shape[0]
    kuu = dispatch.gram(c["variance"], c["ard"], c["z"], kernel=kernel)
    L, _ = safe_cholesky(kuu, JitterPolicy())

    r_w, r_b, r_wts, r_u = jax.random.split(rng, 4)
    freqs, phases, scale = _feature_basis(
        r_w, r_b, kernel, c["variance"], c["ard"], num_features, q, dtype,
    )
    num_features = freqs.shape[0]
    wts = jax.random.normal(r_wts, (num_samples, num_features, d), dtype)

    partial = PathwiseSampler(
        freqs=freqs, phases=phases, scale=scale, wts=wts,
        v=jnp.zeros((num_samples, m, d), dtype),
        variance=c["variance"], ard=c["ard"], z=c["z"], kernel=kernel,
    )
    # exact whitened draws: u_s = L (m_v + Ls eps_s)
    eps = jax.random.normal(r_u, (num_samples, m, d), dtype)
    v_s = c["u_mean"][None] + jnp.einsum(
        "mk,skd->smd", c["u_scale"], eps, precision=_HIGHEST
    )
    u = jnp.einsum("mk,skd->smd", L, v_s, precision=_HIGHEST)
    return _matheron_finish(partial, u, L)


def sample_at(sampler: PathwiseSampler, x_star) -> jnp.ndarray:
    """Evaluate the S posterior function draws at x_star (N*, Q).

    Returns (S, N*, D) noise-free function values; jointly consistent
    across test points within each sample. Two MXU matmuls.
    """
    phi_x = _prior_features(x_star, sampler)             # (N*, L)
    prior = jnp.einsum(
        "nl,sld->snd", phi_x, sampler.wts, precision=_HIGHEST
    )
    mod = linear if sampler.kernel == "linear" else ard_rbf
    k_xz = mod.gram(sampler.variance, sampler.ard, x_star, sampler.z)
    return prior + jnp.einsum(
        "nm,smd->snd", k_xz, sampler.v, precision=_HIGHEST
    )


def sample_at_latent_draws(sampler: PathwiseSampler, x_draws) -> jnp.ndarray:
    """Evaluate sample s of the posterior at ITS OWN latent draw
    x_draws[s] (S, N*, Q) -> (S, N*, D): the composition that propagates
    LATENT uncertainty through the function draws — x_s ~ q(x*),
    f_s ~ p(f | data), y_s = f_s(x_s). Marginally, mean over s converges
    to the psi-moment predictive mean and var to (predictive var −
    noise), since the predictive integrates the same q(x*) (the oracle
    in tests/test_sampling.py). Same two-matmul shape discipline as
    sample_at, batched over S."""
    phi_x = jax.vmap(lambda x: _prior_features(x, sampler))(x_draws)
    prior = jnp.einsum(
        "snl,sld->snd", phi_x, sampler.wts, precision=_HIGHEST
    )
    mod = linear if sampler.kernel == "linear" else ard_rbf
    k_xz = jax.vmap(
        lambda x: mod.gram(sampler.variance, sampler.ard, x, sampler.z)
    )(x_draws)                                           # (S, N*, M)
    return prior + jnp.einsum(
        "snm,smd->snd", k_xz, sampler.v, precision=_HIGHEST
    )


def make_dp_pathwise_sampler(rng, caches: PosteriorCache, phi,
                             num_samples: int, num_latent: int,
                             num_features: int = 2048,
                             kernel: str = "ard_rbf"):
    """DP mixture pathwise sampler: per-atom samplers + sampled atom
    assignments.

    caches: batched PosteriorCache over atoms (leading axis T, from
    prediction.dp_posterior); phi: (D, T) variational assignments.
    Each (sample, dim) pair draws its atom t ~ Cat(phi_d) once, so a
    sample is a coherent draw from the mixture posterior (within a
    sample, dim d follows a single atom across all test points).
    Returns (samplers, assign) where assign is (S, D) int32.
    """
    t_count = caches.L.shape[0]
    r_atoms, r_pick = jax.random.split(rng)
    rngs = jax.random.split(r_atoms, t_count)
    samplers = jax.vmap(
        lambda r, c: make_pathwise_sampler(
            r, c, num_samples, num_latent, num_features, kernel
        )
    )(rngs, caches)
    d = phi.shape[0]
    assign = jax.vmap(
        lambda r, p: jax.random.categorical(
            r, jnp.log(jnp.maximum(p, 1e-38)), shape=(num_samples,)
        ),
        out_axes=1,
    )(jax.random.split(r_pick, d), phi)                  # (S, D)
    return samplers, assign


def dp_sample_at(samplers: PathwiseSampler, assign, x_star) -> jnp.ndarray:
    """Evaluate DP mixture draws at x_star: (S, N*, D).

    Evaluates every atom (vmapped — T batched MXU matmuls) and gathers
    each (sample, dim)'s assigned atom; T is small (truncation), so the
    dense evaluation stays cheaper than per-pair gathers on TPU.
    """
    f_all = jax.vmap(lambda sm: sample_at(sm, x_star))(samplers)
    # f_all: (T, S, N*, D); pick t = assign[s, d]
    idx = assign[None, :, None, :]                       # (1, S, 1, D)
    return jnp.take_along_axis(f_all, idx, axis=0)[0]
