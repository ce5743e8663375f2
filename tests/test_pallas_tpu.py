"""Compiled-Mosaic equivalence gate (VERDICT r1 item 8).

CI pins 8 fake CPU devices, so these tests are skipped there — interpret
-mode equivalence is covered by tests/test_pallas.py. On a real TPU
(`JAX_PLATFORMS=tpu python -m pytest tests/test_pallas_tpu.py -p
no:dpgp_bootstrap`) the same checks run against the COMPILED Mosaic
kernels; experiments/pallas_tpu_gate.py is the scriptable twin that
writes the per-round PALLAS_TPU_r*.json artifact.
"""
import jax
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() in ("cpu", "gpu"),
        reason="compiled-Mosaic gate needs a real TPU backend",
    ),
]


def test_compiled_fused_kernels_match_reference():
    from experiments.pallas_tpu_gate import run_checks

    results = run_checks()
    failures = {k: v for k, v in results.items() if not v["ok"]}
    assert not failures, failures
