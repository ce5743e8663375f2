"""The staged structure-then-recalibrate MRD-SVI recipe
(train/mrd_recipe.py): boundary surgery is prediction-invariant, the
frozen leaves stay pinned through phase B, and an interrupted-and-resumed
run finishes bit-identical to an uninterrupted one."""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.core.transforms import positive
from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import mrd_svi
from dp_gp_lvm_tpu.train import mrd_recipe


def _setup(n=64):
    Y1, Y2, _ = synthetic.two_view(
        jax.random.PRNGKey(3), n=n, d1=6, d2=7, dtype=jnp.float32
    )
    cfg = mrd_svi.Config(num_latent=3, num_inducing=8, num_views=2,
                         batch=16)
    return (Y1, Y2), cfg


def _drive(chunk=4):
    def drive(step_fn, state, n_steps, rng_d, Y_cur, label="",
              ck=None, ckpt_every=0):
        def one(st, r):
            st, mm = step_fn(st, r, Y_cur)
            return st, mm["loss"]

        @jax.jit
        def multi(st, start):
            keys = jax.vmap(lambda i: jax.random.fold_in(rng_d, i))(
                start + jnp.arange(chunk)
            )
            return jax.lax.scan(one, st, keys)

        done = int(state.step)
        while done < n_steps:
            state, losses = multi(state, jnp.int32(done))
            done += chunk
            assert bool(np.all(np.isfinite(np.asarray(losses)))), losses
        return state, float("nan"), 0.0

    return drive


def test_recalibrated_keeps_predictive_mean():
    """The phase-B variance reset rescales the whitened q(u^v) mean so
    the predictive mean is invariant at the boundary (f ~ sigma_f * m:
    Psi1 ~ sigma_f^2 and Kuu^{-1/2} ~ 1/sigma_f for ARD-RBF)."""
    Ys, cfg = _setup()
    params = mrd_svi.init_params(jax.random.PRNGKey(0), list(Ys), cfg)
    # give q(u) a nonzero mean and the kernel a non-default variance so
    # the rescaling actually has something to preserve
    views = []
    for v, vp in enumerate(params["views"]):
        views.append({
            **vp,
            "u_mean": jax.random.normal(jax.random.PRNGKey(v),
                                        vp["u_mean"].shape,
                                        vp["u_mean"].dtype),
            "raw_variance": vp["raw_variance"] - 2.0,   # collapse-ish
        })
    params = {**params, "views": views}
    x = jax.random.normal(jax.random.PRNGKey(9), (12, cfg.num_latent),
                          jnp.float32)
    s = 0.05 * jnp.ones_like(x)
    before = [mrd_svi.predict_view(params, x, s, v, cfg)[0]
              for v in range(2)]

    new = mrd_recipe.recalibrated(params, reset_variance=0.4,
                                  reset_noise=0.25)
    for v in range(2):
        after_mean, after_var = mrd_svi.predict_view(new, x, s, v, cfg)
        # mean invariant up to the jitter-level mismatch of K^{-1/2}
        np.testing.assert_allclose(np.asarray(after_mean),
                                   np.asarray(before[v]), rtol=2e-2,
                                   atol=2e-2)
        np.testing.assert_allclose(
            float(positive(new["views"][v]["raw_variance"])), 0.4,
            rtol=1e-5,
        )


def test_staged_recipe_runs_and_pins_structure():
    Ys, cfg = _setup()
    state, _, info = mrd_recipe.staged_mrd_svi(
        jax.random.PRNGKey(2), jax.random.PRNGKey(100), Ys, cfg, 64,
        steps=24, chunk=4, lr=1e-2, drive=_drive(),
        log=lambda s: None,
    )
    assert info["phase_a_steps"] + info["phase_b_steps"] == 24
    for vp in state.params["views"]:
        # frozen through phase B at the reset value
        np.testing.assert_allclose(float(positive(vp["raw_variance"])),
                                   0.4, rtol=1e-6)
        # noise FREE in phase B: it must have moved off the reset
        assert float(positive(vp["raw_noise"])) != np.float32(0.25)
    e = float(mrd_svi.elbo(state.params, list(Ys), cfg))
    assert np.isfinite(e)


def test_staged_recipe_resume_bit_identical(tmp_path):
    Ys, cfg = _setup()
    kw = dict(steps=24, chunk=4, lr=1e-2, drive=_drive(),
              log=lambda s: None)
    ck = str(tmp_path / "stages")
    s_full, _, _ = mrd_recipe.staged_mrd_svi(
        jax.random.PRNGKey(2), jax.random.PRNGKey(100), Ys, cfg, 64,
        ckpt_dir=ck, **kw,
    )
    # rerun with resume: phase A is skipped (boundary npz), phase B
    # replays on the same rng split -> bit-identical final params
    s_res, _, info = mrd_recipe.staged_mrd_svi(
        jax.random.PRNGKey(2), jax.random.PRNGKey(100), Ys, cfg, 64,
        ckpt_dir=ck, resume=True, **kw,
    )
    assert info.get("resumed_from") == mrd_recipe.PHASE_A
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
