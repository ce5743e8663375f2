"""Data IO tests: AMC parser (Python and native C++ paths agree), oil-flow
and mocap loaders with synthetic fallback, generator shapes/stats."""
import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dp_gp_lvm_tpu.data import mocap, native_io, oil_flow, synthetic

AMC_SAMPLE = textwrap.dedent("""\
    #!OML:ASF sample
    :FULLY-SPECIFIED
    :DEGREES
    1
    root 0.1 0.2 0.3 -1.5 2.0 0.0
    lowerback 0.5 -0.25 1.0
    thorax 1 2 3
    2
    root 0.2 0.3 0.4 -1.6 2.1 0.1
    lowerback 0.6 -0.35 1.1
    thorax 4 5 6
    3
    root 0.3 0.4 0.5 -1.7 2.2 0.2
    lowerback 0.7 -0.45 1.2
    thorax 7 8 9
""")


@pytest.fixture
def amc_file(tmp_path):
    p = tmp_path / "trial.amc"
    p.write_text(AMC_SAMPLE)
    return str(p)


def test_parse_amc_python(amc_file):
    Y, names = mocap.parse_amc(amc_file)
    assert Y.shape == (3, 12)
    assert names[0] == "root:0"
    np.testing.assert_allclose(Y[0, :3], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(Y[2, -1], 9.0)


def test_parse_amc_native_matches_python(amc_file):
    if not native_io.available():
        pytest.skip("no C++ toolchain")
    Y_py, _ = mocap.parse_amc(amc_file)
    Y_c = native_io.parse_amc_native(amc_file)
    np.testing.assert_allclose(Y_c, Y_py, rtol=1e-12)


def test_parse_amc_native_rejects_reordered_bones(tmp_path):
    """A frame with equal total width but permuted bones must error, not
    silently permute columns (the Python parser keys by name)."""
    if not native_io.available():
        pytest.skip("no C++ toolchain")
    bad = AMC_SAMPLE.replace(
        "2\nroot 0.2 0.3 0.4 -1.6 2.1 0.1\nlowerback 0.6 -0.35 1.1\n"
        "thorax 4 5 6",
        "2\nroot 0.2 0.3 0.4 -1.6 2.1 0.1\nthorax 4 5 6\n"
        "lowerback 0.6 -0.35 1.1",
    )
    p = tmp_path / "reordered.amc"
    p.write_text(bad)
    with pytest.raises(Exception, match="bone order"):
        native_io.parse_amc_native(str(p))


def test_parse_amc_native_large_roundtrip(tmp_path):
    if not native_io.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(0)
    n, bones = 500, [("root", 6), ("la", 3), ("rb", 2)]
    vals = rng.normal(size=(n, 11))
    lines = []
    for i in range(n):
        lines.append(str(i + 1))
        off = 0
        for b, w in bones:
            lines.append(
                b + " " + " ".join(f"{v:.10g}" for v in vals[i, off:off + w])
            )
            off += w
    p = tmp_path / "big.amc"
    p.write_text(":DEGREES\n" + "\n".join(lines) + "\n")
    Y_py, _ = mocap.parse_amc(str(p))
    Y_c = native_io.parse_amc_native(str(p))
    np.testing.assert_allclose(Y_c, Y_py, rtol=1e-12)
    np.testing.assert_allclose(Y_c, vals, rtol=1e-9)


def test_load_mocap_fallback():
    Y, tag = mocap.load_mocap(None, n=64, d=10)
    assert Y.shape == (64, 10)
    assert tag.startswith("synthetic")
    np.testing.assert_allclose(np.asarray(Y).mean(axis=0), 0.0, atol=1e-8)


def test_load_oil_flow_fallback():
    Y, labels, tag = oil_flow.load_oil_flow(None)
    assert Y.shape == (1000, 12)
    assert labels.shape == (1000,)
    assert set(np.unique(np.asarray(labels))) <= {0, 1, 2}


def test_preprocess_drops_constant_channels():
    Y = np.ones((10, 3))
    Y[:, 1] = np.arange(10)
    out = mocap.preprocess(Y)
    assert out.shape == (10, 1)


def test_synthetic_generators_shapes():
    rng = jax.random.PRNGKey(0)
    Y, labels, X = synthetic.grouped_dims(rng, n=20, dims_per_group=(3, 4))
    assert Y.shape == (20, 7) and labels.shape == (7,)
    Y1, Y2, X = synthetic.two_view(rng, n=16, d1=3, d2=5)
    assert Y1.shape == (16, 3) and Y2.shape == (16, 5)


def test_two_view_big_standardized_and_shared_signal():
    """O(n) RFF two-view generator (c9): standardized columns, and the
    shared latent dims actually carry cross-view signal — rows close in
    the shared coordinates have correlated view-2 values given view-1
    proximity (checked via the generating X, which the function
    returns)."""
    rng = jax.random.PRNGKey(3)
    Y1, Y2, X = synthetic.two_view_big(rng, n=4096, d1=6, d2=4,
                                       q_shared=2, q_private=1,
                                       private_weight=0.5)
    assert Y1.shape == (4096, 6) and Y2.shape == (4096, 4)
    assert X.shape == (4096, 4)
    for Y in (Y1, Y2):
        np.testing.assert_allclose(np.asarray(Y.mean(axis=0)), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(Y.std(axis=0)), 1.0,
                                   rtol=1e-6)
    # shared signal: nearest-neighbour in the SHARED latent coords
    # predicts view 2 far better than chance (the generating ARD gives
    # the shared dims unit weight in BOTH views)
    import numpy as _np

    Xs = _np.asarray(X[:, :2])
    Y2n = _np.asarray(Y2)
    d2 = ((Xs[:512, None, :] - Xs[None, 512:1536, :]) ** 2).sum(-1)
    nn = 512 + d2.argmin(axis=1)
    mse_nn = float(((Y2n[:512] - Y2n[nn]) ** 2).mean())
    assert mse_nn < 0.75, mse_nn  # vs ~2.0 for random pairing
