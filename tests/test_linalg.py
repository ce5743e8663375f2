"""Safe-Cholesky jitter escalation, solves, logdet."""
import jax
import jax.numpy as jnp
import numpy as np

from dp_gp_lvm_tpu.core.types import JitterPolicy
from dp_gp_lvm_tpu.linalg import (
    cho_solve,
    logdet_from_chol,
    safe_cholesky,
    tri_solve,
)


def _spd(np_rng, n=8):
    A = np_rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_safe_cholesky_reconstructs(np_rng):
    A = _spd(np_rng)
    L, jit = safe_cholesky(A)
    np.testing.assert_allclose(
        np.asarray(L @ L.T), np.asarray(A), rtol=1e-6, atol=1e-4
    )
    assert float(jit) == JitterPolicy().initial


def test_safe_cholesky_escalates_on_near_singular(np_rng):
    """Rank-deficient matrix: jitter must escalate but still give a finite
    factor — the Cholesky-failure 'sanitizer'."""
    v = jnp.asarray(np_rng.normal(size=(8, 2)))
    A = v @ v.T  # rank 2, needs jitter
    L, jit = safe_cholesky(A)
    assert bool(jnp.all(jnp.isfinite(L)))


def test_safe_cholesky_inside_jit_and_vmap(np_rng):
    A = jnp.stack([_spd(np_rng), _spd(np_rng)])
    Ls, jits = jax.jit(jax.vmap(lambda a: safe_cholesky(a)))(A)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(Ls[i] @ Ls[i].T), np.asarray(A[i]), rtol=1e-6,
            atol=1e-4,
        )


def test_solves_and_logdet(np_rng):
    A = _spd(np_rng)
    B = jnp.asarray(np_rng.normal(size=(8, 3)))
    L, _ = safe_cholesky(A, JitterPolicy(initial=0.0))
    X = cho_solve(L, B)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), rtol=1e-8)
    np.testing.assert_allclose(
        float(logdet_from_chol(L)), float(np.linalg.slogdet(np.asarray(A))[1]),
        rtol=1e-8,
    )
    Xt = tri_solve(L, B, trans=True)
    np.testing.assert_allclose(np.asarray(L.T @ Xt), np.asarray(B), rtol=1e-8)


def test_safe_cholesky_spec_matches_safe_on_good_batch():
    """Speculative batched chol == the searched factor bit-for-bit when
    the initial jitter succeeds (the common path): both factor
    A + init*scale*I."""
    from dp_gp_lvm_tpu.linalg import safe_cholesky, safe_cholesky_spec

    rng = jax.random.PRNGKey(0)
    A0 = jax.random.normal(rng, (5, 16, 16))
    A = A0 @ jnp.swapaxes(A0, 1, 2) / 16.0 + 2.0 * jnp.eye(16)
    L_spec, jit_spec = safe_cholesky_spec(A)
    L_ref, jit_ref = jax.vmap(lambda a: safe_cholesky(a))(A)
    np.testing.assert_array_equal(np.asarray(L_spec), np.asarray(L_ref))
    np.testing.assert_allclose(np.asarray(jit_spec), np.asarray(jit_ref))
    assert jit_spec.shape == (5,)


def test_safe_cholesky_spec_repairs_bad_batch():
    """A non-PSD member trips the scalar fallback: the repair branch
    escalates a SHARED jitter until every batch member factors."""
    from dp_gp_lvm_tpu.linalg import safe_cholesky_spec

    good = 2.0 * jnp.eye(8)
    # indefinite, but repairable within the f64 ladder (initial 1e-6,
    # 6 decades -> max relative jitter 1.0 at scale 1): min eig -0.5
    bad = jnp.eye(8).at[0, 0].set(-0.5)
    A = jnp.stack([good, bad])
    L, jit = safe_cholesky_spec(A)
    assert bool(jnp.all(jnp.isfinite(L)))
    # the shared repaired jitter must exceed the initial level
    from dp_gp_lvm_tpu.core.types import JitterPolicy

    assert float(jit[0]) > JitterPolicy().initial_for(A.dtype)
