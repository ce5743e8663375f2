"""Early pytest plugin: re-exec with a clean JAX environment.

Loaded via `-p dpgp_bootstrap` (see pytest.ini), which happens during
pytest's plugin preparse — *before* output capture starts, so the
re-exec'd run's output stays visible.

Why: this machine's `sitecustomize` (axon TPU relay) pre-imports jax and
initializes its PJRT plumbing in every interpreter, which breaks
`--xla_force_host_platform_device_count` — the 8 fake CPU devices the
multi-device tests (tests/test_parallel.py, SURVEY.md section 4) need.
Re-exec'ing with PYTHONPATH cleared restores standard JAX behavior.
"""
import os
import sys

_N_FAKE_DEVICES = 8

if (
    os.environ.get("DPGP_TEST_REEXEC") != "1"
    and "jax" in sys.modules  # sitecustomize got there first
):
    env = dict(os.environ)
    env["DPGP_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = ""  # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_N_FAKE_DEVICES}"
    ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )
