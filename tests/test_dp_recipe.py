"""Staged split-init DP-SVI recipe (train/dp_recipe.py).

  1. The library recipe runs end-to-end at toy scale and returns a
     finite, structurally complete result (full-T params, stage info).
  2. Stage-boundary checkpoints: every boundary file exists after a
     run with ckpt_dir set.
  3. Resume = fault tolerance: delete the later boundaries, rerun with
     resume=True from the surviving one, and the final params are
     BIT-IDENTICAL to the uninterrupted run (the recipe consumes the
     same rng splits for skipped stages).
  4. resume=False ignores existing checkpoints (fresh runs never
     silently continue a stale directory).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import dp_svi
from dp_gp_lvm_tpu.train import dp_recipe


def _drive(step_fn, state, n_steps, rng, Y, label=""):
    """Minimal scan driver matching the recipe's drive contract."""
    def one(st, r):
        st, m = step_fn(st, r, Y)
        return st, m["loss"]

    state, losses = jax.jit(
        lambda st, rr: jax.lax.scan(one, st, rr)
    )(state, jax.random.split(rng, n_steps))
    jax.block_until_ready(losses)
    assert bool(jnp.all(jnp.isfinite(losses))), f"{label}loss not finite"
    return state, float("nan"), 0.0


def _setup():
    Y, labels, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(3), n=64, dims_per_group=(4, 4), q=2, noise=0.01
    )
    cfg = dp_svi.Config(num_latent=2, num_inducing=8, truncation=3,
                        batch=16)
    return Y, cfg


def _run(Y, cfg, ckpt_dir=None, resume=False):
    state, opt, info = dp_recipe.staged_dp_svi(
        jax.random.PRNGKey(1), jax.random.PRNGKey(101), Y, cfg,
        Y.shape[0], steps=20, chunk=5, lr=1e-2, ngd_lr=None,
        drive=_drive, ckpt_dir=ckpt_dir, resume=resume,
        log=lambda s: None,
    )
    return state, info


def test_staged_recipe_end_to_end():
    Y, cfg = _setup()
    state, info = _run(Y, cfg)
    assert info["recipe"].startswith("split-init")
    assert info["stage1_steps"] + info["stage2_steps"] >= 20
    assert "resumed_from" not in info
    p = state.params
    assert p["u_h"].shape[0] == cfg.truncation          # full-T structure
    assert bool(jnp.all(jnp.isfinite(
        dp_svi.elbo(p, Y, cfg)
    )))


def test_stage_boundaries_written(tmp_path):
    Y, cfg = _setup()
    d = str(tmp_path / "stages")
    _run(Y, cfg, ckpt_dir=d)
    for stage in (dp_recipe.STAGE_SPLIT, dp_recipe.STAGE_WARM,
                  dp_recipe.STAGE_ASSIGN):
        assert os.path.exists(os.path.join(d, stage + ".npz")), stage


def test_resume_bit_identical(tmp_path):
    Y, cfg = _setup()
    d1 = str(tmp_path / "a")
    state_full, _ = _run(Y, cfg, ckpt_dir=d1)

    # simulate a crash after the warmup stage: keep split+warm
    # boundaries, drop the assign boundary, resume
    d2 = str(tmp_path / "b")
    _run(Y, cfg, ckpt_dir=d2)
    os.remove(os.path.join(d2, dp_recipe.STAGE_ASSIGN + ".npz"))
    state_res, info = _run(Y, cfg, ckpt_dir=d2, resume=True)
    assert info["resumed_from"] == dp_recipe.STAGE_WARM

    flat_full = jax.tree_util.tree_leaves(state_full.params)
    flat_res = jax.tree_util.tree_leaves(state_res.params)
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_false_ignores_checkpoints(tmp_path):
    Y, cfg = _setup()
    d = str(tmp_path / "stages")
    _run(Y, cfg, ckpt_dir=d)
    # corrupt-by-meaning: a fresh run must NOT read these
    _, info = _run(Y, cfg, ckpt_dir=d, resume=False)
    assert "resumed_from" not in info


def test_staged_recipe_on_mesh_matches_single_device():
    """The staged recipe with mesh=... (the --mesh production path) is
    the same math as single-device: same rngs, same stages — final
    params agree to f32 psum reordering tolerance."""
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib

    Y, labels, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(3), n=64, dims_per_group=(4, 4), q=2,
        noise=0.01
    )
    cfg = dp_svi.Config(num_latent=2, num_inducing=8, truncation=4,
                        batch=16)
    mesh = mesh_lib.make_mesh(data=4, model=2)

    def run(m):
        state, _, info = dp_recipe.staged_dp_svi(
            jax.random.PRNGKey(1), jax.random.PRNGKey(101), Y, cfg,
            Y.shape[0], steps=20, chunk=5, lr=1e-2, ngd_lr=None,
            drive=_drive, mesh=m, log=lambda s: None,
        )
        return state, info

    s_single, _ = run(None)
    s_mesh, info = run(mesh)
    e1 = float(dp_svi.elbo(s_single.params, Y, cfg))
    e2 = float(dp_svi.elbo(s_mesh.params, Y, cfg))
    assert np.isfinite(e2)
    np.testing.assert_allclose(e2, e1, rtol=5e-3)
    for k in s_single.params:
        np.testing.assert_allclose(
            np.asarray(s_single.params[k]), np.asarray(s_mesh.params[k]),
            rtol=0.05, atol=1e-4, err_msg=k,
        )


def test_staged_recipe_amortized():
    """The staged recipe composes with amortized q(X): the stage-2b
    manifold freeze extends to encoder leaves
    (dp_recipe._frozen_manifold_for), the split keeps the encoder, and
    the run finishes finite with encoder leaves intact."""
    Y, labels, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(3), n=64, dims_per_group=(4, 4), q=2,
        noise=0.01
    )
    cfg = dp_svi.Config(num_latent=2, num_inducing=8, truncation=3,
                        batch=16, amortized=True, encoder_hidden=8)
    state, _, info = dp_recipe.staged_dp_svi(
        jax.random.PRNGKey(1), jax.random.PRNGKey(101), Y, cfg,
        Y.shape[0], steps=20, chunk=5, lr=1e-2, ngd_lr=None,
        drive=_drive, log=lambda s: None,
    )
    p = state.params
    assert any(k.startswith("enc_") for k in p)
    assert "qx_mean" not in p
    assert p["u_h"].shape[0] == cfg.truncation
    assert bool(jnp.all(jnp.isfinite(dp_svi.elbo(p, Y, cfg))))
