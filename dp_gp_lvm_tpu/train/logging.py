"""Structured per-step training records (SURVEY.md section 5 metrics).

Replaces the reference's stdout ELBO prints with JSONL records carrying
the per-term ELBO decomposition (fit / trace / KL-X / KL-v / KL-z), grad
norm, Cholesky jitter diagnostics and step wall-clock — the primary
debugging tool for parity work. Pure host-side; call with already-
device-fetched scalars (do not force syncs inside the hot loop more often
than the logging cadence).
"""
from __future__ import annotations

import json
import time
from typing import IO, Any


class JsonlLogger:
    def __init__(self, path: str | None = None, stream: IO | None = None):
        self._fh = open(path, "a") if path else stream
        self._t_last = time.perf_counter()

    def log(self, step: int, **scalars: Any):
        now = time.perf_counter()
        rec = {
            "step": int(step),
            "wall_dt_s": round(now - self._t_last, 6),
        }
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._t_last = now
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh is not None:
            self._fh.close()


class TensorBoardLogger:
    """TensorBoard scalar writer (the reference's TF summaries analogue).

    Uses tf.summary when TensorFlow is importable (it is in this image);
    degrades to a no-op otherwise so the library never hard-depends on TF.
    """

    def __init__(self, logdir: str):
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = None
            self._writer = None

    @property
    def active(self) -> bool:
        return self._writer is not None

    def log(self, step: int, **scalars: Any):
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in scalars.items():
                try:
                    self._tf.summary.scalar(k, float(v), step=int(step))
                except (TypeError, ValueError):
                    continue
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


def named_scope(name: str):
    """jax.named_scope passthrough for XLA-level profile attribution."""
    import jax

    return jax.named_scope(name)
