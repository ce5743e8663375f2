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
computes ALL of its local atoms' sufficient statistics in one fused
Pallas kernel call (ops/pallas/psi.suffstats_batched_fused — grid
(T_local, N_local/B), Psi1 never materializes in HBM) when
config.use_pallas selects it ("auto" decides from the per-device tile
volume, same crossover rule as models/dp_gp_lvm.py), psums the stacked
statistics once over "data", and phi-weights the per-atom free energies
over "model". Gradients flow through shard_map/psum natively (psum
transposes to psum), so the same functions serve as training losses
under jit.

The sharded objectives include every term of the single-device ELBOs —
hyperprior and learnable-alpha included — asserted term-for-term in
tests/test_parallel.py.
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
from dp_gp_lvm_tpu.models.bgplvm import _log_normal_hyperprior
from dp_gp_lvm_tpu.models.bound import SuffStats, collapsed_bound
from dp_gp_lvm_tpu.ops import dispatch
from dp_gp_lvm_tpu.ops.pallas import psi as psi_pallas
from dp_gp_lvm_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


_resolve_pallas = dispatch.resolve_pallas


def _local_stats(variance, ard, mu, s, z, Y, config):
    """Per-shard partial sufficient statistics (no psum yet), dispatching
    through ops.dispatch so use_pallas composes with the mesh program
    (fused suffstats kernel per shard when the PER-DEVICE tile volume
    crosses the rule — the crossover is about local work)."""
    return dispatch.suff_stats(
        variance, ard, mu, s, z, Y,
        block_n=config.psi2_block,
        use_pallas=_resolve_pallas(
            config.use_pallas, config.kernel, 1, mu.shape[0], z.shape[0]
        ),
        kernel=config.kernel,
    )


def _psum_stats(stats: SuffStats, axis) -> SuffStats:
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), stats)


def bgplvm_elbo_sharded(
    params, Y, config, mesh: Mesh, policy: JitterPolicy = JitterPolicy()
):
    """Data-parallel Bayesian GP-LVM ELBO. Y, qx_mean, qx_var shard over
    rows; kernel/inducing params replicate. N must divide the data axis."""

    def program(p, y):
        variance = positive(p["raw_variance"])
        ard = positive(p["raw_ard"])
        noise = positive_noise(p["raw_noise"])
        s = positive_variational_var(p["raw_qx_var"])
        stats = _local_stats(variance, ard, p["qx_mean"], s, p["z"], y,
                             config)
        stats = _psum_stats(stats, DATA_AXIS)
        kl = jax.lax.psum(
            gaussian.kl_to_standard_normal(p["qx_mean"], s), DATA_AXIS
        )
        kuu = dispatch.gram(variance, ard, p["z"], kernel=config.kernel)
        terms = collapsed_bound(kuu, stats, noise, policy)
        hp = _log_normal_hyperprior(
            getattr(config, "hyperprior_std", 0.0), variance, ard, noise
        )
        return jnp.sum(terms.per_dim) - kl + hp

    pspec = {
        "qx_mean": P(DATA_AXIS), "raw_qx_var": P(DATA_AXIS),
        "z": P(), "raw_variance": P(), "raw_ard": P(), "raw_noise": P(),
    }
    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(params, Y)


def bgplvm_loss_sharded(params, Y, config, mesh):
    return -bgplvm_elbo_sharded(params, Y, config, mesh)


def _dp_local_stats_batched(variance, ard, mu, s, Zs, y, config, policy):
    """Stacked per-atom partial sufficient statistics for the local data
    shard: (Psi0 (Tl,), Psi1^T Y (Tl,M,D), Psi2 (Tl,M,M)) — one fused
    Pallas kernel when selected, else vmapped pure JAX. Thin wrapper
    over dispatch.dp_batched_suffstats (PER-DEVICE shapes drive the
    fused-kernel crossover)."""
    p0, p1y, p2, yty, n = dispatch.dp_batched_suffstats(
        variance, ard, mu, s, Zs, y,
        block_n=config.psi2_block, use_pallas=config.use_pallas,
        kernel=config.kernel,
    )
    return SuffStats(psi0=p0, psi1T_y=p1y, psi2=p2, yty=yty, n=n)


def dp_elbo_sharded(
    params, Y, config, mesh: Mesh, policy: JitterPolicy = JitterPolicy()
):
    """2D-parallel DP-GP-LVM ELBO: rows shard over "data", atoms over
    "model". Requires N % data_axis == 0 and T % model_axis == 0.

    Includes ALL terms of models/dp_gp_lvm.elbo — phi-weighted fits, DP
    stick/assignment terms, KL[q(X)], the log-normal hyperprior
    (psummed over the model axis), and the learnable-alpha Gamma prior
    when params carry raw_alpha."""
    learn_alpha = "raw_alpha" in params

    def program(p, y):
        mu = p["qx_mean"]
        s = positive_variational_var(p["raw_qx_var"])
        z = p["z"]                                    # (Tl, M, Q)
        variance = positive(p["raw_variance"])       # (Tl,)
        ard = positive(p["raw_ard"])                 # (Tl, Q)
        noise = positive_noise(p["raw_noise"])       # (Tl,)
        phi = jax.nn.softmax(p["phi_logits"], axis=-1)   # (D, T) replicated
        t_local = z.shape[0]

        stats = _dp_local_stats_batched(
            variance, ard, mu, s, z, y, config, policy
        )
        stats = _psum_stats(stats, DATA_AXIS)

        # ONE batched bound call over the local atoms (round 5): the
        # psummed stats are already atom-stacked, and the batched call
        # keeps the speculative safe Cholesky's fallback predicate
        # scalar (collapsed_bound docstring — the vmapped jitter search
        # dominated the single-chip step)
        kuu_b = jax.vmap(
            lambda v_t, a_t, z_t: dispatch.gram(
                v_t, a_t, z_t, kernel=config.kernel
            )
        )(variance, ard, z)
        st = SuffStats(psi0=stats.psi0, psi1T_y=stats.psi1T_y,
                       psi2=stats.psi2, yty=stats.yty, n=stats.n)
        f_local = collapsed_bound(kuu_b, st, noise, policy).per_dim
        #                                             (Tl, D)
        t_index = jax.lax.axis_index(MODEL_AXIS) * t_local
        phi_local = jax.lax.dynamic_slice_in_dim(
            phi, t_index, t_local, axis=1
        )                                             # (D, T_local)
        fit = jax.lax.psum(jnp.sum(phi_local * f_local.T), MODEL_AXIS)
        kl_x = jax.lax.psum(
            gaussian.kl_to_standard_normal(mu, s), DATA_AXIS
        )
        alpha = (
            positive(p["raw_alpha"], 1e-3)
            if learn_alpha
            else jnp.asarray(config.alpha, y.dtype)
        )
        dp_terms = stick_breaking.dp_kl_terms(
            phi, positive(p["raw_gamma1"], 1e-4),
            positive(p["raw_gamma2"], 1e-4), alpha,
            logits=p["phi_logits"],
        )
        if learn_alpha:
            dp_terms = dp_terms + stick_breaking.alpha_log_prior(alpha)
        out = fit + dp_terms - kl_x
        if config.hyperprior_std:
            out = out + jax.lax.psum(
                _log_normal_hyperprior(
                    config.hyperprior_std, variance, ard, noise
                ),
                MODEL_AXIS,
            )
        return out

    pspec = {
        "qx_mean": P(DATA_AXIS), "raw_qx_var": P(DATA_AXIS),
        "z": P(MODEL_AXIS), "raw_variance": P(MODEL_AXIS),
        "raw_ard": P(MODEL_AXIS), "raw_noise": P(MODEL_AXIS),
        "phi_logits": P(), "raw_gamma1": P(), "raw_gamma2": P(),
    }
    if learn_alpha:
        pspec["raw_alpha"] = P()
    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(params, Y)


def dp_loss_sharded(params, Y, config, mesh):
    return -dp_elbo_sharded(params, Y, config, mesh)


def mrd_elbo_sharded(
    params, Ys, config, mesh: Mesh, policy: JitterPolicy = JitterPolicy()
):
    """Data-parallel MRD ELBO: rows of every view and q(X) shard over
    "data"; per-view kernel/inducing params replicate. Views have
    heterogeneous output widths (a pytree list), so the view loop stays a
    static Python loop inside the mesh program — each view contributes one
    psummed SuffStats, exactly like the single-device
    models/mrd.elbo_terms, hyperprior included."""
    from dp_gp_lvm_tpu.models import mrd as mrd_mod

    def program(p, *ys):
        mu = p["qx_mean"]
        s = positive_variational_var(p["raw_qx_var"])
        fit = 0.0
        hp = 0.0
        for vp, y in zip(p["views"], ys):
            hyp = mrd_mod.constrain_view(vp)
            stats = dispatch.suff_stats(
                hyp["variance"], hyp["ard"], mu, s, hyp["z"], y,
                block_n=config.psi2_block,
                use_pallas=_resolve_pallas(
                    config.use_pallas, config.kernel, 1, mu.shape[0],
                    hyp["z"].shape[0],
                ),
                kernel=config.kernel,
            )
            stats = _psum_stats(stats, DATA_AXIS)
            kuu = dispatch.gram(
                hyp["variance"], hyp["ard"], hyp["z"], kernel=config.kernel
            )
            fit = fit + jnp.sum(
                collapsed_bound(kuu, stats, hyp["noise"], policy).per_dim
            )
            if getattr(config, "hyperprior_std", 0.0):
                hp = hp + _log_normal_hyperprior(
                    config.hyperprior_std, hyp["variance"], hyp["ard"],
                    hyp["noise"],
                )
        kl = jax.lax.psum(
            gaussian.kl_to_standard_normal(mu, s), DATA_AXIS
        )
        return fit - kl + hp

    view_spec = {
        "z": P(), "raw_variance": P(), "raw_ard": P(), "raw_noise": P(),
    }
    pspec = {
        "qx_mean": P(DATA_AXIS),
        "raw_qx_var": P(DATA_AXIS),
        "views": [dict(view_spec) for _ in params["views"]],
    }
    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(pspec, *[P(DATA_AXIS) for _ in Ys]),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(params, *Ys)


def mrd_loss_sharded(params, Ys, config, mesh):
    return -mrd_elbo_sharded(params, Ys, config, mesh)


def svi_elbo_sharded(
    params, y_batch, idx, n_total: int, config, mesh: Mesh,
    policy: JitterPolicy = JitterPolicy(), with_aux: bool = False,
):
    """Data-parallel minibatch SVI-GPLVM (models/svi_gplvm.py): the batch
    rows (and their latent indices) shard over "data"; the full-N q(X)
    table, q(u), and hypers replicate. Each device computes its shard's
    partial SuffStats, ONE psum forms the global batch statistics, and
    the whitened Hensman bound evaluates replicated. Gradients w.r.t.
    the replicated q(X) table flow through the local gathers (shard_map
    transposes replicated-input cotangents with a psum), so sharded
    minibatch training matches single-device exactly — and the two scale
    axes multiply: rows/step = batch x devices, each at O(B_local M^2).

    with_aux=True additionally returns the (already psummed, replicated)
    whitened batch statistics (a (M, D), A2 (M, M)) so the
    natural-gradient q(u) blend (models/svi_gplvm.make_svi_natgrad_step
    with mesh=...) reuses them without a second psi pass.
    """
    from dp_gp_lvm_tpu.models import svi_gplvm as svi

    b_total = y_batch.shape[0]

    def program(p, y_b, ix):
        c = svi.constrain(p, config)
        # table gather (resident) or recognition-net forward (amortized);
        # either way the cotangents w.r.t. the replicated leaves psum at
        # the shard_map transpose, so gradients match single-device
        mu_b, s_b = svi._qx_batch(c, y_b, ix)
        stats = dispatch.suff_stats(
            c["variance"], c["ard"], mu_b, s_b, c["z"], y_b,
            block_n=config.psi2_block,
            use_pallas=_resolve_pallas(
                config.use_pallas, config.kernel, 1, mu_b.shape[0],
                c["z"].shape[0],
            ),
            kernel=config.kernel,
        )
        stats = _psum_stats(stats, DATA_AXIS)
        scale = jnp.asarray(n_total / b_total, y_b.dtype)
        stats = stats._replace(
            psi0=stats.psi0 * scale,
            psi1T_y=stats.psi1T_y * scale,
            psi2=stats.psi2 * scale,
            yty=stats.yty * scale,
            n=stats.n * scale,
        )
        kl_x = scale * jax.lax.psum(
            gaussian.kl_to_standard_normal(mu_b, s_b), DATA_AXIS
        )
        bound, a, A2 = svi._bound_and_whitened(c, stats, kl_x, policy,
                                               config.kernel)
        return (bound, (a, A2)) if with_aux else bound

    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), (P(), P())) if with_aux else P(),
        check_vma=False,
    )
    return sharded(params, y_batch, idx)


def svi_loss_sharded(params, y_batch, idx, n_total, config, mesh):
    return -svi_elbo_sharded(params, y_batch, idx, n_total, config, mesh)


def mrd_svi_elbo_sharded(
    params, y_batches, idx, n_total: int, config, mesh: Mesh,
    policy: JitterPolicy = JitterPolicy(), with_aux: bool = False,
):
    """Data-parallel minibatch MRD-SVI (models/mrd_svi.py): the aligned
    batch rows of EVERY view (and their latent indices) shard over
    "data"; the shared q(X) table/encoder, each view's whitened q(u^v),
    and all hypers replicate. Each device computes its row-shard's
    partial per-view SuffStats, one psum per view forms the global batch
    statistics (V small psums — still one collective round, XLA fuses
    adjacent all-reduces), and the per-view whitened bounds evaluate
    replicated. Exact vs the single-device elbo_minibatch (tested).

    with_aux=True additionally returns the per-view (a, A2, beta)
    whitened statistics for the per-view natural-gradient q(u^v) blend
    (models/mrd_svi.make_svi_natgrad_step with mesh=...)."""
    from dp_gp_lvm_tpu.models import amortized
    from dp_gp_lvm_tpu.models import mrd_svi
    from dp_gp_lvm_tpu.models import svi_gplvm as svi

    b_total = y_batches[0].shape[0]

    def program(p, y_bs, ix):
        c_views = mrd_svi.constrain_views(p, config)
        y_cat = jnp.concatenate(list(y_bs), axis=1)
        mu_b, s_b = amortized.qx_batch(c_views[0], y_cat, ix)
        scale = jnp.asarray(n_total / b_total, y_cat.dtype)
        bounds, whitened = [], []
        for c, y_b in zip(c_views, y_bs):
            stats = dispatch.suff_stats(
                c["variance"], c["ard"], mu_b, s_b, c["z"], y_b,
                block_n=config.psi2_block,
                use_pallas=_resolve_pallas(
                    config.use_pallas, config.kernel, 1, mu_b.shape[0],
                    c["z"].shape[0],
                ),
                kernel=config.kernel,
            )
            stats = _psum_stats(stats, DATA_AXIS)
            stats = stats._replace(
                psi0=stats.psi0 * scale, psi1T_y=stats.psi1T_y * scale,
                psi2=stats.psi2 * scale, yty=stats.yty * scale,
                n=stats.n * scale,
            )
            bound_v, a, A2 = svi._bound_and_whitened(c, stats, 0.0,
                                                     policy, config.kernel)
            bounds.append(bound_v)
            whitened.append((a, A2, 1.0 / c["noise"]))
        kl_x = scale * jax.lax.psum(
            gaussian.kl_to_standard_normal(mu_b, s_b), DATA_AXIS
        )
        bound = sum(bounds) - kl_x
        if with_aux:
            return bound, tuple(whitened)
        return bound

    n_views = len(y_batches)
    aux_spec = tuple((P(), P(), P()) for _ in range(n_views))
    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(P(), tuple(P(DATA_AXIS) for _ in range(n_views)),
                  P(DATA_AXIS)),
        out_specs=(P(), aux_spec) if with_aux else P(),
        check_vma=False,
    )
    return sharded(params, tuple(y_batches), idx)


def mrd_svi_loss_sharded(params, y_batches, idx, n_total, config, mesh):
    return -mrd_svi_elbo_sharded(params, y_batches, idx, n_total, config,
                                 mesh)


def dp_svi_elbo_sharded(
    params, y_batch, idx, n_total: int, config, mesh: Mesh,
    policy: JitterPolicy = JitterPolicy(), with_aux: bool = False,
):
    """2D-parallel minibatch DP-SVI (models/dp_svi.py): batch rows shard
    over "data", truncation atoms over "model". Each device computes its
    local atoms' partial SuffStats on its row shard (one fused batched
    kernel when dispatch selects it), ONE psum over "data" forms the
    global (N/B)-scaled batch statistics, the per-atom uncollapsed free
    energies f_td evaluate on the atom shards, and the phi-weighted fit
    psums over "model". The full-N q(X) table, phi, and stick params
    replicate; per-atom hypers and q(u|t) naturals (u_h, u_lam) shard
    over "model". Exact vs the single-device elbo_minibatch (tested).

    with_aux=True additionally returns (f_td (T, D), a (T, M, D),
    A2 (T, M, M)) — f_td/a/A2 concatenated over the model axis — for the
    natural-gradient blend in make_dp_svi_step(mesh=...): no second psi
    pass, and the blend's inputs are laid out atom-sharded already.
    """
    from dp_gp_lvm_tpu.models import dp_svi

    b_total = y_batch.shape[0]
    learn_alpha = "raw_alpha" in params

    def program(p, y_b, ix):
        c = dp_svi.constrain(p, config)  # atom leaves are LOCAL blocks
        mu_b, s_b = dp_svi._qx(c, y_b, ix)   # gather or encode
        scale = jnp.asarray(n_total / b_total, y_b.dtype)
        stats = dispatch.dp_batched_suffstats(
            c["variance"], c["ard"], mu_b, s_b, c["z"], y_b,
            block_n=config.psi2_block, use_pallas=config.use_pallas,
            kernel=config.kernel,
        )
        stats = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, DATA_AXIS) * scale, stats
        )
        f_local, a_l, A2_l = dp_svi._free_energy_and_whitened(
            c, stats, config, policy
        )                                              # (Tl, D) / ...
        t_local = f_local.shape[0]
        t_index = jax.lax.axis_index(MODEL_AXIS) * t_local
        phi = c["phi"]                                 # (D, T) replicated
        phi_local = jax.lax.dynamic_slice_in_dim(
            phi, t_index, t_local, axis=1
        )
        fit = jax.lax.psum(jnp.sum(phi_local * f_local.T), MODEL_AXIS)
        kl_x = scale * jax.lax.psum(
            gaussian.kl_to_standard_normal(mu_b, s_b), DATA_AXIS
        )
        alpha = c.get("alpha", jnp.asarray(config.alpha, y_b.dtype))
        dp_terms = stick_breaking.dp_kl_terms(
            phi, c["gamma1"], c["gamma2"], alpha,
            logits=c["phi_logits"],
        )
        if learn_alpha:
            dp_terms = dp_terms + stick_breaking.alpha_log_prior(alpha)
        out = fit + dp_terms - kl_x
        if config.hyperprior_std:
            out = out + jax.lax.psum(
                _log_normal_hyperprior(
                    config.hyperprior_std, c["variance"], c["ard"],
                    c["noise"],
                ),
                MODEL_AXIS,
            )
        return (out, (f_local, a_l, A2_l)) if with_aux else out

    atom = P(MODEL_AXIS)
    pspec = {
        "z": atom, "raw_variance": atom, "raw_ard": atom,
        "raw_noise": atom, "u_h": atom, "u_lam": atom,
        "phi_logits": P(), "raw_gamma1": P(), "raw_gamma2": P(),
    }
    # resident q(X) table or recognition-network leaves: replicated
    # either way (encoder weights are global variational params)
    for k in params:
        if k in ("qx_mean", "raw_qx_var") or k.startswith("enc_"):
            pspec[k] = P()
    if learn_alpha:
        pspec["raw_alpha"] = P()
    sharded = jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(pspec, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), (atom, atom, atom)) if with_aux else P(),
        check_vma=False,
    )
    return sharded(params, y_batch, idx)


def dp_svi_loss_sharded(params, y_batch, idx, n_total, config, mesh):
    return -dp_svi_elbo_sharded(params, y_batch, idx, n_total, config,
                                mesh)
