"""Streaming input pipeline (data/stream.py + native/stream_loader.cpp).

  1. Native mmap gather == numpy fancy indexing (repeated + boundary
     indices), through the same API as the numpy fallback.
  2. Out-of-range indices surface as IndexError at wait(), not UB.
  3. ChunkStream: shapes, seed-determinism, and gathered rows match the
     dataset at the returned indices across buffer-alternating calls.
  4. The streaming DP-SVI step is EXACTLY the resident step at equal
     indices (same program, host-fed rows) — single step and a whole
     make_streaming_scan_fn chunk.
  5. End-to-end: a short streamed training run moves the ELBO and stays
     finite.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dp_gp_lvm_tpu.data import stream, synthetic
from dp_gp_lvm_tpu.models import dp_svi
from dp_gp_lvm_tpu.train.loop import (
    gp_optimizer,
    init_state,
    make_streaming_scan_fn,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    Y, _, _ = synthetic.grouped_dims(
        jax.random.PRNGKey(0), n=96, dims_per_group=(3, 3), q=2, noise=0.01
    )
    Y = np.asarray(Y, np.float32)
    path = str(tmp_path_factory.mktemp("stream") / "y.f32")
    stream.write_rows(path, Y)
    return path, Y


def test_native_gather_matches_numpy(dataset):
    path, Y = dataset
    if not stream.native_available():
        pytest.skip("no C++ compiler on this host")
    n, d = Y.shape
    rng = np.random.Generator(np.random.Philox(1))
    idx = rng.integers(0, n, size=200, dtype=np.int32)
    idx[:3] = [0, n - 1, 0]                      # boundaries + repeats
    out_native = np.empty((idx.size, d), np.float32)
    out_numpy = np.empty((idx.size, d), np.float32)
    with stream.StreamLoader(path, n, d) as ld:
        ld.request(idx, out_native)
        ld.wait()
    npld = stream.NumpyLoader(path, n, d)
    npld.request(idx, out_numpy)
    npld.wait()
    np.testing.assert_array_equal(out_native, out_numpy)
    np.testing.assert_array_equal(out_native, Y[idx])


def test_out_of_range_raises(dataset):
    path, Y = dataset
    n, d = Y.shape
    ld = stream.open_loader(path, n, d)
    out = np.empty((2, d), np.float32)
    ld.request(np.array([0, n], np.int32), out)   # n is out of range
    with pytest.raises(IndexError):
        ld.wait()
    ld.close()


def test_chunkstream_deterministic_and_correct(dataset):
    path, Y = dataset
    n, d = Y.shape
    chunks = []
    for _ in range(2):                            # same seed -> same stream
        with stream.ChunkStream(stream.open_loader(path, n, d),
                                batch=8, chunk=3, seed=7) as cs:
            # copy BEFORE the next call: the prefetch issued inside
            # call k+1 reuses call k's buffer (documented contract)
            chunks.append([
                (i.copy(), y.copy())
                for i, y in (cs.next_chunk() for _ in range(3))
            ])
    for (i1, y1), (i2, y2) in zip(*chunks):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(y1, y2)
    for idx, y in chunks[0]:
        assert idx.shape == (3, 8) and y.shape == (3, 8, d)
        np.testing.assert_array_equal(y, Y[idx])


def _cfg():
    return dp_svi.Config(num_latent=2, num_inducing=8, truncation=3,
                         batch=8)


def test_streaming_step_equals_resident(dataset):
    path, Y = dataset
    n, d = Y.shape
    cfg = _cfg()
    Yj = jnp.asarray(Y)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Yj, cfg)
    opt = gp_optimizer(params, lr=1e-2)
    idx = np.array([3, 3, 0, 95, 17, 4, 60, 8], np.int32)

    res_step = dp_svi.make_dp_svi_step(
        cfg, n, opt, rho=0.3, sample_idx=lambda r: jnp.asarray(idx)
    )
    str_step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.3, streaming=True)

    r = jax.random.PRNGKey(2)
    st_res, m_res = res_step(init_state(params, opt), r, Yj)
    st_str, m_str = str_step(
        init_state(params, opt), r, (jnp.asarray(idx), Yj[idx])
    )
    assert float(m_res["loss"]) == float(m_str["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                    jax.tree_util.tree_leaves(st_str.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_scan_chunk_equals_resident_loop(dataset):
    path, Y = dataset
    n, d = Y.shape
    cfg = _cfg()
    Yj = jnp.asarray(Y)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Yj, cfg)
    opt = gp_optimizer(params, lr=1e-2)
    chunk = 4
    rng = np.random.Generator(np.random.Philox(5))
    idx = rng.integers(0, n, size=(chunk, cfg.batch), dtype=np.int32)
    rngs = jax.random.split(jax.random.PRNGKey(9), chunk)

    # resident reference: python loop, one step per hand-fed index row
    st_ref = init_state(params, opt)
    losses_ref = []
    for k in range(chunk):
        step_k = dp_svi.make_dp_svi_step(
            cfg, n, opt, rho=0.3,
            sample_idx=lambda r, k=k: jnp.asarray(idx[k]),
        )
        st_ref, m = step_k(st_ref, rngs[k], Yj)
        losses_ref.append(float(m["loss"]))

    str_step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.3, streaming=True)
    scan_chunk = make_streaming_scan_fn(str_step)
    st_s, losses_s = scan_chunk(
        init_state(params, opt), rngs, jnp.asarray(idx), Yj[idx]
    )
    np.testing.assert_allclose(np.asarray(losses_s), losses_ref, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_ref.params),
                    jax.tree_util.tree_leaves(st_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_svi_gplvm_streaming_step_equals_resident(dataset):
    from dp_gp_lvm_tpu.models import svi_gplvm

    path, Y = dataset
    n, d = Y.shape
    cfg = svi_gplvm.Config(num_latent=2, num_inducing=8, batch=8)
    Yj = jnp.asarray(Y)
    params = svi_gplvm.init_params(jax.random.PRNGKey(1), Yj, cfg)
    opt = gp_optimizer(params, lr=1e-2)
    idx = np.array([5, 5, 1, 95, 33, 2, 70, 0], np.int32)

    res_step = svi_gplvm.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, sample_idx=lambda r: jnp.asarray(idx)
    )
    str_step = svi_gplvm.make_svi_natgrad_step(
        cfg, n, opt, rho=0.3, streaming=True
    )
    r = jax.random.PRNGKey(2)
    st_res, m_res = res_step(init_state(params, opt), r, Yj)
    st_str, m_str = str_step(
        init_state(params, opt), r, (jnp.asarray(idx), Yj[idx])
    )
    assert float(m_res["loss"]) == float(m_str["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                    jax.tree_util.tree_leaves(st_str.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_step_on_mesh_equals_resident_mesh(dataset):
    """streaming=True composes with mesh=... : host-fed chunks are
    resharded by GSPMD onto the data axis and the step equals the
    resident mesh step at equal indices."""
    from dp_gp_lvm_tpu.parallel import mesh as mesh_lib, recipe

    path, Y = dataset
    n, d = Y.shape
    cfg = dp_svi.Config(num_latent=2, num_inducing=8, truncation=2,
                        batch=8)
    Yj = jnp.asarray(Y)
    params = dp_svi.init_params(jax.random.PRNGKey(1), Yj, cfg)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    opt = gp_optimizer(params, lr=1e-2)
    idx = np.array([7, 7, 2, 95, 40, 1, 64, 9], np.int32)

    res_step = dp_svi.make_dp_svi_step(
        cfg, n, opt, rho=0.3, mesh=mesh,
        sample_idx=lambda r: jnp.asarray(idx),
    )
    str_step = dp_svi.make_dp_svi_step(
        cfg, n, opt, rho=0.3, mesh=mesh, streaming=True
    )
    p_m, (Y_m,) = recipe.place_svi("dp_svi", params, (Yj,), mesh)
    r = jax.random.PRNGKey(2)
    st_res, m_res = res_step(init_state(p_m, opt), r, Y_m)
    st_str, m_str = str_step(
        init_state(p_m, opt), r, (jnp.asarray(idx), jnp.asarray(Y[idx]))
    )
    np.testing.assert_allclose(float(m_res["loss"]), float(m_str["loss"]),
                               rtol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(st_res.params),
                    jax.tree_util.tree_leaves(st_str.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_streamed_training_end_to_end(dataset):
    path, Y = dataset
    n, d = Y.shape
    cfg = _cfg()
    params = dp_svi.init_params(jax.random.PRNGKey(1), jnp.asarray(Y), cfg)
    opt = gp_optimizer(params, lr=1e-2)
    str_step = dp_svi.make_dp_svi_step(cfg, n, opt, rho=0.3, streaming=True)
    scan_chunk = make_streaming_scan_fn(str_step)

    state = init_state(params, opt)
    first = last = None
    rng = jax.random.PRNGKey(11)
    with stream.ChunkStream(stream.open_loader(path, n, d),
                            batch=cfg.batch, chunk=5, seed=3) as cs:
        for _ in range(4):
            idx, y = cs.next_chunk()
            rng, sub = jax.random.split(rng)
            state, losses = scan_chunk(
                state, jax.random.split(sub, idx.shape[0]),
                jnp.asarray(idx), jnp.asarray(y),
            )
            losses = np.asarray(losses)
            assert np.all(np.isfinite(losses)), losses
            if first is None:
                first = losses[0]
            last = losses[-1]
    assert last < first          # 20 steps move the bound at lr=1e-2
