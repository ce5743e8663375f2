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
import numpy as np

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
             dtype=jnp.float64, private_weight=1.0):
    """Config 3 data: two views sharing q_shared latent dims, each with its
    own q_private dims. Returns (Y1, Y2, X) with X = [shared, priv1, priv2].

    private_weight scales the private dims' ARD weight in the generating
    GP: with unit weights and x ~ N(0,1), the variance of a view that is
    predictable from the shared coordinates alone is only
    1/sqrt(1 + 2*q_private) (RBF marginalization over the private dims) —
    ~58% at q_shared=q_private=1 — so the cross-view prediction ceiling
    is weak no matter how well MRD recovers the structure. Weighting the
    privates at w raises the predictable fraction to
    1/sqrt(1 + 2*w*q_private); the c3 gate uses q_shared=2, w=0.5.
    """
    r0, r1, r2 = jax.random.split(rng, 3)
    q = q_shared + 2 * q_private
    X = jax.random.normal(r0, (n, q), dtype)
    w = jnp.asarray(private_weight, dtype)
    ard1 = jnp.concatenate([
        jnp.ones((q_shared,), dtype),
        w * jnp.ones((q_private,), dtype),
        jnp.zeros((q_private,), dtype),
    ])
    ard2 = jnp.concatenate([
        jnp.ones((q_shared,), dtype),
        jnp.zeros((q_private,), dtype),
        w * jnp.ones((q_private,), dtype),
    ])
    Y1 = _gp_draws(r1, X, ard1, d1, noise)
    Y2 = _gp_draws(r2, X, ard2, d2, noise)
    std = lambda Y: (Y - Y.mean(axis=0)) / Y.std(axis=0)
    return std(Y1), std(Y2), X


def two_view_big(rng, n=131072, d1=32, d2=32, q_shared=2, q_private=1,
                 noise=0.05, private_weight=0.5, num_features=64,
                 lengthscale=1.5, dtype=jnp.float64):
    """Big-N analogue of two_view for the minibatch MRD-SVI configs:
    two views sharing q_shared latent dims (plus q_private each), drawn
    through random Fourier features — an O(n) stand-in for two_view's
    exact GP draw, which needs an (N, N) Cholesky and dies past a few
    thousand rows (the same scaling trick as grouped_dims_big).

    The RFF frequencies are scaled per latent dim by sqrt(ard)/ell, so
    the generating kernel is ARD-RBF with the SAME shared/private ARD
    signature as two_view: view 1 weights [1]*q_shared + [w]*q_private
    + [0]*q_private, view 2 the mirror. private_weight and the
    cross-view predictability ceiling behave exactly as documented on
    two_view (the c3 regime is q_shared=2, w=0.5).

    Returns (Y1, Y2, X) with X = [shared, priv1, priv2], both views
    standardized per column."""
    q = q_shared + 2 * q_private
    r0, rf, ra, rn = jax.random.split(rng, 4)
    X = jax.random.normal(r0, (n, q), dtype)
    w = jnp.asarray(private_weight, dtype)
    ards = (
        jnp.concatenate([jnp.ones((q_shared,), dtype),
                         w * jnp.ones((q_private,), dtype),
                         jnp.zeros((q_private,), dtype)]),
        jnp.concatenate([jnp.ones((q_shared,), dtype),
                         jnp.zeros((q_private,), dtype),
                         w * jnp.ones((q_private,), dtype)]),
    )
    Ys = []
    for v, (ard, d_v) in enumerate(zip(ards, (d1, d2))):
        freq = jax.random.normal(
            jax.random.fold_in(rf, v), (q, num_features), dtype
        ) * (jnp.sqrt(ard)[:, None] / lengthscale)
        b = jax.random.uniform(
            jax.random.fold_in(rf, 100 + v), (num_features,), dtype,
            0.0, 2.0 * jnp.pi,
        )
        feats = jnp.sqrt(2.0 / num_features) * jnp.cos(X @ freq + b[None])
        amp = jax.random.normal(
            jax.random.fold_in(ra, v), (num_features, d_v), dtype
        )
        y = feats @ amp
        y = y / y.std(axis=0)               # unit signal, THEN noise
        y = y + noise * jax.random.normal(
            jax.random.fold_in(rn, v), y.shape, dtype
        )
        Ys.append((y - y.mean(axis=0)) / y.std(axis=0))
    return Ys[0], Ys[1], X


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


def grouped_dims_big(rng, n=65536, dims_per_group=(16, 16), q=4,
                     noise=(0.05, 0.25, 0.6, 1.2), lengthscales=4.0,
                     num_features=64, dtype=jnp.float64):
    """Big-N analogue of grouped_dims for the minibatch DP-SVI configs:
    groups of output dims, each driven by a different latent dim, drawn
    through random Fourier features (an O(n) approximation of the GP
    draw — grouped_dims' exact draw needs an (N, N) Cholesky and dies
    past a few thousand rows).

    At big N the latent posterior tightens, so latent-SUBSET structure
    alone stops paying in the bound (the marginalization blur that
    rewards per-group ARD pruning vanishes) and a single broad-ARD atom
    becomes near-optimal — measured: both the collapsed model and DP-SVI
    merge groups on a subset-only version of this data. Groups here
    therefore differ in observation NOISE — the one per-atom parameter a
    single atom cannot absorb (per-dim lengthscale differences are
    absorbed by one atom's ARD, since each group lives on its own
    latent dim): a one-atom solution must compromise log sigma^2 across
    groups, an O(N) bound penalty that keeps the split identifiable at
    any scale. The default noise levels are log-spaced so neighbouring
    groups stay separable above a sparse-GP residual floor of a few
    percent of variance (the measured fit floor of the M=64 recipe);
    the default lengthscale (scalar 4.0 = smooth) keeps the latent
    functions learnable from cold PCA inits at big N.
    noise/lengthscales: scalar or per-group sequence.

    Returns (Y, labels, X)."""
    num_groups = len(dims_per_group)
    # np.ndim (not jnp): accepts tuples without a deprecation warning
    if np.ndim(noise) == 0 or isinstance(noise, float):
        noise = (float(noise),) * num_groups
    if np.ndim(lengthscales) == 0 or isinstance(lengthscales, float):
        lengthscales = (float(lengthscales),) * num_groups
    rngs = jax.random.split(rng, 2 * num_groups + 2)
    X = jax.random.normal(rngs[0], (n, q), dtype)
    Ys, labels = [], []
    for g, dg in enumerate(dims_per_group):
        x_g = X[:, g % q][:, None]                       # (n, 1)
        w = jax.random.normal(
            rngs[2 * g + 1], (1, num_features), dtype
        ) / lengthscales[g]
        b = jax.random.uniform(
            rngs[2 * g + 2], (num_features,), dtype, 0.0, 2.0 * jnp.pi
        )
        feats = jnp.sqrt(2.0 / num_features) * jnp.cos(x_g @ w + b[None])
        amp = jax.random.normal(
            jax.random.fold_in(rngs[-1], g), (num_features, dg), dtype
        )
        y_g = feats @ amp
        y_g = y_g / y_g.std(axis=0)          # unit signal, THEN noise —
        # so the per-group noise level survives the final standardization
        y_g = y_g + noise[g] * jax.random.normal(
            jax.random.fold_in(rngs[-1], 1000 + g), y_g.shape, dtype
        )
        Ys.append(y_g)
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


# 2D articulated figure for pose_like: (parent, length, base_angle,
# gait_group) per joint; joint 0 is the root (pelvis). Groups: 0 spine/head,
# 1 left leg, 2 right leg, 3 left arm, 4 right arm — limbs move with
# different gait signals, giving the grouped dependency structure the DP
# model should recover.
_POSE_SKELETON = (
    (-1, 0.0, 0.0, 0),    # 0 pelvis (root)
    (0, 0.5, 1.571, 0),   # 1 lower spine
    (1, 0.5, 1.571, 0),   # 2 upper spine
    (2, 0.3, 1.571, 0),   # 3 head
    (0, 0.5, -1.271, 1),  # 4 left hip
    (4, 0.5, -1.571, 1),  # 5 left knee
    (5, 0.25, -1.871, 1),  # 6 left foot
    (0, 0.5, -1.871, 2),  # 7 right hip
    (7, 0.5, -1.571, 2),  # 8 right knee
    (8, 0.25, -1.271, 2),  # 9 right foot
    (2, 0.45, -0.771, 3),  # 10 left shoulder
    (10, 0.45, -1.271, 3),  # 11 left elbow
    (11, 0.2, -1.571, 3),   # 12 left hand
    (2, 0.45, -2.371, 4),   # 13 right shoulder
    (13, 0.45, -1.871, 4),  # 14 right elbow
    (14, 0.2, -1.571, 4),   # 15 right hand
)


def pose_like(rng, n=512, q_true=3, noise=0.01, dtype=jnp.float64):
    """Pose-shaped surrogate (BASELINE configs[4] 'mocap + pose'): 2D
    keypoint trajectories of a 16-joint articulated figure walking.

    A few smooth gait signals drive joint ANGLES per limb group through a
    2D forward-kinematic chain, so the observed dims (x, y per joint) are
    nonlinear in the latents and come in limb groups with shared
    dependency structure — the DP-GP-LVM grouping + imputation target.
    Returns (Y (n, 32), X_true (n, q_true), joint_groups (16,)).
    """
    r1, r2, r3 = jax.random.split(rng, 3)
    t = jnp.linspace(0.0, 6.0 * jnp.pi, n, dtype=dtype)[:, None]
    freqs = 0.7 + jnp.arange(q_true, dtype=dtype)[None, :] * 0.4
    phases = jax.random.uniform(r1, (1, q_true), dtype, 0.0, 2 * jnp.pi)
    gait = jnp.sin(t * freqs + phases)                      # (n, q_true)
    # each gait group mixes the latent signals with its own weights;
    # opposite limbs get opposite sign (walking anti-phase)
    num_groups = 5
    mix = 0.5 * jax.random.normal(r2, (num_groups, q_true), dtype)
    mix = mix.at[2].set(-mix[1]).at[4].set(-mix[3])
    group_angle = gait @ mix.T                              # (n, groups)

    positions = {}
    cum_angles = {}
    for j, (parent, length, base, group) in enumerate(_POSE_SKELETON):
        swing = 0.0 if parent < 0 else group_angle[:, group]
        if parent < 0:
            cum_angles[j] = jnp.zeros((n,), dtype)
            positions[j] = jnp.zeros((n, 2), dtype)
        else:
            ang = cum_angles[parent] * 0.3 + base + swing
            cum_angles[j] = ang
            step = length * jnp.stack(
                [jnp.cos(ang), jnp.sin(ang)], axis=-1
            )
            positions[j] = positions[parent] + step
    Y = jnp.concatenate(
        [positions[j] for j in range(len(_POSE_SKELETON))], axis=1
    )
    Y = Y + noise * jax.random.normal(r3, Y.shape, dtype)
    sd = Y.std(axis=0)
    Y = (Y - Y.mean(axis=0)) / jnp.maximum(sd, 1e-3)
    groups = jnp.asarray([g for (_, _, _, g) in _POSE_SKELETON])
    return Y, gait, groups
