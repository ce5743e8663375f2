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


def named_scope(name: str):
    """jax.named_scope passthrough for XLA-level profile attribution."""
    import jax

    return jax.named_scope(name)
