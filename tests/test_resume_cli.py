"""Checkpoint/resume for the generic SVI minibatch loop (experiments/
run.py drive): a run interrupted at a checkpoint boundary and resumed
finishes BIT-IDENTICAL to an uninterrupted run — the fold_in(step-index)
rng derivation makes the chunk keys independent of how many times the
process restarted. (The staged c7 recipe has its own boundary-checkpoint
resume, tested via dryrun_multichip; this covers c6/c8/c9-style runs.)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out_dir, *extra):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    cmd = [
        sys.executable, "experiments/run.py", "c6_svi_bigN",
        "--n", "128", "--steps", "8", "--batch", "32",
        "--log-every", "2", "--out", out_dir, *extra,
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(os.path.join(out_dir, "result.json")) as fh:
        return json.load(fh), proc.stdout


def test_svi_loop_resume_bit_identical(tmp_path):
    out_a = str(tmp_path / "straight")
    out_b = str(tmp_path / "interrupted")

    res_a, _ = _run(out_a)

    # same schedule (--steps 8 builds the same lr decay), but stop the
    # loop at step 4 with a checkpoint there, then resume to the end
    _run(out_b, "--stop-after", "4", "--ckpt-every", "2")
    res_b, log_b = _run(out_b, "--resume", "--ckpt-every", "2")
    assert "resumed at step 4" in log_b, log_b

    assert res_a["elbo"] == res_b["elbo"], (res_a["elbo"], res_b["elbo"])
    assert res_a["imputation_mse"] == res_b["imputation_mse"]


def test_svi_stream_loop_resume_bit_identical(tmp_path):
    """Same drill through the host-streaming pipeline: the Philox
    fast-forward (ChunkStream skip_chunks) replays the exact index
    sequence a previous run consumed, so the resumed streamed run
    finishes bit-identical to an uninterrupted streamed run."""
    out_a = str(tmp_path / "straight")
    out_b = str(tmp_path / "interrupted")

    res_a, _ = _run(out_a, "--stream")
    _run(out_b, "--stream", "--stop-after", "4", "--ckpt-every", "2")
    res_b, log_b = _run(out_b, "--stream", "--resume", "--ckpt-every",
                        "2")
    assert "resumed at step 4" in log_b, log_b
    assert res_a["elbo"] == res_b["elbo"], (res_a["elbo"], res_b["elbo"])


def test_divergent_run_aborts_nonzero(tmp_path):
    """Fault injection (VERDICT r4 weak-4): a run whose chunk losses go
    non-finite must STOP after K consecutive bad chunks, write a
    result.json marked failed, and exit nonzero — not scan to the end."""
    out = str(tmp_path / "diverged")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    cmd = [
        sys.executable, "experiments/run.py", "c6_svi_bigN",
        "--n", "128", "--steps", "200", "--batch", "32",
        "--log-every", "2", "--out", out,
        "--inject-nonfinite-at", "6",
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 3, (proc.returncode, proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    assert "ABORT" in proc.stdout, proc.stdout[-2000:]
    with open(os.path.join(out, "result.json")) as fh:
        res = json.load(fh)
    assert res["aborted_nonfinite"] is True
    assert res["first_nonfinite_step"] >= 6
    # well short of the requested 200 steps
    assert res["aborted_at_step"] <= 20
