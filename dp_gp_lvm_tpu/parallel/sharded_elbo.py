r"""Explicit-SPMD ELBOs: shard_map over the device mesh, psum over ICI.

Decomposition (SURVEY.md sections 2b, 5 'long-context analogue'):
every data-dependent quantity in the collapsed bound is a *sum over n* —
Psi0, Psi1^T Y (M x D), Psi2 (M x M), y^T y, and KL[q(X)] — so the mesh
program is:

    per-device:  partial sufficient statistics on the local N-shard
    psum:        one all-reduce of (MxD + MxM + D + 2) floats over "data"
    replicated:  the O(M^3 + M^2 D) bound algebra (tiny), stick/assignment
                 terms, final scalar.

This is mathematically exact (not an approximation): the same ELBO as the
single-device program, bit-differences only from reduction order. For
DP-GP-LVM the atom axis T additionally shards over "model": each device
computes its local atoms' per-dim free energies F_td against the psummed
statistics of its data shard, and the phi-weighted fit psums over both
axes. Gradients flow through shard_map/psum natively (psum transposes to
psum), so the same functions serve as training losses under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax as _lax

_HIGHEST = _lax.Precision.HIGHEST
from jax.sharding import Mesh, PartitionSpec as P

from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.core.transforms import (
    positive,
    positive_noise,
    positive_variational_var,
)
from dp_gp_lvm_tpu.distributions import gaussian, stick_breaking
from dp_gp_lvm_tpu.kernels import ard_rbf
from dp_gp_lvm_tpu.models.bound import SuffStats, collapsed_bound
from dp_gp_lvm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _local_stats(variance, ard, mu, s, z, Y, block_n):
    """Per-shard partial sufficient statistics (no psum yet)."""
    p0 = ard_rbf.psi0(variance, mu)
    p1 = ard_rbf.psi1(variance, ard, mu, s, z)
    p2 = ard_rbf.psi2(variance, ard, mu, s, z, block_n=block_n)
    return SuffStats(
        psi0=p0,
        psi1T_y=jnp.dot(p1.T, Y, precision=_HIGHEST),
        psi2=p2,
        yty=jnp.sum(Y * Y, axis=0),
        n=jnp.asarray(Y.shape[0], Y.dtype),
    )


def _psum_stats(stats: SuffStats, axis) -> SuffStats:
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), stats)


def bgplvm_elbo_sharded(
    params, Y, config, mesh: Mesh, policy: JitterPolicy = JitterPolicy()
):
    """Data-parallel Bayesian GP-LVM ELBO. Y, qx_mean, qx_var shard over
    rows; kernel/inducing params replicate. N must divide the data axis."""

    def program(qx_mean, raw_qx_var, z, raw_var, raw_ard, raw_noise, y):
        variance = positive(raw_var)
        ard = positive(raw_ard)
        noise = positive_noise(raw_noise)
        s = positive_variational_var(raw_qx_var)
        stats = _local_stats(
            variance, ard, qx_mean, s, z, y, config.psi2_block
        )
        stats = _psum_stats(stats, DATA_AXIS)
        kl = jax.lax.psum(
            gaussian.kl_to_standard_normal(qx_mean, s), DATA_AXIS
        )
        kuu = ard_rbf.gram(variance, ard, z)
        terms = collapsed_bound(kuu, stats, noise, policy)
        return jnp.sum(terms.per_dim) - kl

    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS), P(DATA_AXIS),  # qx_mean, raw_qx_var
            P(), P(), P(), P(),          # z, kernel hypers
            P(DATA_AXIS),                # Y
        ),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(
        params["qx_mean"], params["raw_qx_var"], params["z"],
        params["raw_variance"], params["raw_ard"], params["raw_noise"], Y,
    )


def bgplvm_loss_sharded(params, Y, config, mesh):
    return -bgplvm_elbo_sharded(params, Y, config, mesh)


def dp_elbo_sharded(
    params, Y, config, mesh: Mesh, policy: JitterPolicy = JitterPolicy()
):
    """2D-parallel DP-GP-LVM ELBO: rows shard over "data", atoms over
    "model". Requires N % data_axis == 0 and T % model_axis == 0."""

    def program(
        qx_mean, raw_qx_var, z, raw_var, raw_ard, raw_noise,
        phi_logits, raw_g1, raw_g2, y,
    ):
        s = positive_variational_var(raw_qx_var)
        # phi is normalized over the FULL atom axis; logits are replicated.
        phi = jax.nn.softmax(phi_logits, axis=-1)       # (D, T) replicated
        t_local = z.shape[0]
        t_index = jax.lax.axis_index(MODEL_AXIS) * t_local

        def one_atom(z_t, rv_t, ra_t, rn_t):
            variance, ard, noise = (
                positive(rv_t), positive(ra_t), positive_noise(rn_t)
            )
            stats = _local_stats(
                variance, ard, qx_mean, s, z_t, y, config.psi2_block
            )
            stats = _psum_stats(stats, DATA_AXIS)
            kuu = ard_rbf.gram(variance, ard, z_t)
            return collapsed_bound(kuu, stats, noise, policy).per_dim

        f_local = jax.vmap(one_atom)(z, raw_var, raw_ard, raw_noise)  # (Tl,D)
        phi_local = jax.lax.dynamic_slice_in_dim(
            phi, t_index, t_local, axis=1
        )                                                # (D, T_local)
        fit = jax.lax.psum(
            jnp.sum(phi_local * f_local.T), MODEL_AXIS
        )
        kl_x = jax.lax.psum(
            gaussian.kl_to_standard_normal(qx_mean, s), DATA_AXIS
        )
        dp_terms = stick_breaking.dp_kl_terms(
            phi, positive(raw_g1, 1e-4), positive(raw_g2, 1e-4),
            jnp.asarray(config.alpha, y.dtype),
        )
        return fit + dp_terms - kl_x

    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS), P(DATA_AXIS),                    # q(X)
            P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS),
            P(), P(), P(),                                 # phi, gammas
            P(DATA_AXIS),                                  # Y
        ),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(
        params["qx_mean"], params["raw_qx_var"], params["z"],
        params["raw_variance"], params["raw_ard"], params["raw_noise"],
        params["phi_logits"], params["raw_gamma1"], params["raw_gamma2"], Y,
    )


def dp_loss_sharded(params, Y, config, mesh):
    return -dp_elbo_sharded(params, Y, config, mesh)
