"""Checkpoint/resume (SURVEY.md section 5 'fault injection'): kill a run,
restore, and continue — the ELBO continuation must be bit-identical to the
uninterrupted run. Plus npz export roundtrip and logger records."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dp_gp_lvm_tpu.data import synthetic
from dp_gp_lvm_tpu.models import bgplvm
from dp_gp_lvm_tpu.train import checkpoint as ckpt_lib
from dp_gp_lvm_tpu.train.logging import JsonlLogger
from dp_gp_lvm_tpu.train.loop import TrainState, init_state, make_step_fn


@pytest.fixture(scope="module")
def setup():
    Y, _ = synthetic.toy_gplvm(jax.random.PRNGKey(0), n=24, d=4, q_true=2)
    cfg = bgplvm.Config(num_latent=2, num_inducing=6)
    params = bgplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    optimizer = optax.adam(1e-2)
    step = make_step_fn(
        lambda p, y: bgplvm.loss(p, y, cfg), optimizer, donate=False
    )
    return Y, cfg, params, optimizer, step


def test_resume_is_bit_identical(setup, tmp_path):
    Y, cfg, params, optimizer, step = setup

    # uninterrupted: 6 steps
    state = init_state(params, optimizer)
    for _ in range(6):
        state, m = step(state, Y)
    elbo_full = float(m["elbo"])

    # interrupted: 3 steps, save, "crash", restore, 3 more
    state = init_state(params, optimizer)
    for _ in range(3):
        state, m = step(state, Y)
    ck = ckpt_lib.Checkpointer(str(tmp_path / "ck"))
    ck.save(state)

    template = init_state(params, optimizer)
    restored = ck.restore(template)
    assert restored is not None
    assert int(restored.step) == 3
    for _ in range(3):
        restored, m2 = step(restored, Y)
    elbo_resumed = float(m2["elbo"])
    ck.close()

    assert elbo_resumed == elbo_full, (elbo_resumed, elbo_full)


def test_npz_export_roundtrip(setup, tmp_path):
    Y, cfg, params, *_ = setup
    path = str(tmp_path / "params.npz")
    ckpt_lib.export_npz(path, bgplvm.constrain(params))
    loaded = ckpt_lib.load_npz(path)
    np.testing.assert_allclose(
        loaded["qx_mean"], np.asarray(params["qx_mean"])
    )
    assert "variance" in loaded and "ard" in loaded


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    lg = JsonlLogger(path)
    lg.log(0, elbo=-12.5, grad_norm=3.25)
    lg.log(1, elbo=-10.0)
    lg.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["elbo"] == -12.5
    assert recs[1]["step"] == 1


def test_viz_smoke(setup, tmp_path):
    """Visualisation helpers produce files without a display."""
    Y, cfg, params, *_ = setup
    from dp_gp_lvm_tpu import viz

    viz.plot_latent_scatter(
        params["qx_mean"], path=str(tmp_path / "latent.png")
    )
    viz.plot_ard_weights(
        np.asarray([1.0, 0.5]), path=str(tmp_path / "ard.png")
    )
    viz.plot_stick_weights(
        np.asarray([2.0, 1.0]), np.asarray([1.0, 1.0]),
        path=str(tmp_path / "sticks.png"),
    )
    viz.plot_assignment_matrix(
        np.asarray([[0.9, 0.1], [0.2, 0.8]]),
        path=str(tmp_path / "phi.png"),
    )
    assert os.path.exists(tmp_path / "latent.png")
    assert os.path.exists(tmp_path / "phi.png")


def test_tensorboard_logger(tmp_path):
    from dp_gp_lvm_tpu.train.logging import TensorBoardLogger

    lg = TensorBoardLogger(str(tmp_path / "tb"))
    lg.log(0, elbo=-5.0, grad_norm=1.5)
    lg.log(1, elbo=-4.0)
    lg.close()
    if lg.active:
        files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert files, "no event files written"


def test_checkpoint_sharded_state(tmp_path):
    """orbax round-trips device-sharded training state (multi-chip case)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs fake devices")
    from dp_gp_lvm_tpu.data import synthetic as synth

    Y, _ = synth.toy_gplvm(jax.random.PRNGKey(0), n=24, d=4, q_true=2)
    cfg = bgplvm.Config(num_latent=2, num_inducing=6)
    params = bgplvm.init_params(jax.random.PRNGKey(1), Y, cfg)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    row = NamedSharding(mesh, P("data"))
    params["qx_mean"] = jax.device_put(params["qx_mean"], row)
    params["raw_qx_var"] = jax.device_put(params["raw_qx_var"], row)
    opt = optax.adam(1e-2)
    state = init_state(params, opt)
    ck = ckpt_lib.Checkpointer(str(tmp_path / "ck"))
    ck.save(state)
    restored = ck.restore(init_state(params, opt))
    ck.close()
    np.testing.assert_allclose(
        np.asarray(restored.params["qx_mean"]),
        np.asarray(params["qx_mean"]),
    )
