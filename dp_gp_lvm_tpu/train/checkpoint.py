"""Checkpoint / resume via orbax (SURVEY.md section 5).

The reference at most dumped TF Saver checkpoints / numpy params; here the
whole training pytree (params + optax state + step) checkpoints every K
steps and resumes exactly — ELBO continuation from a restored checkpoint
is bit-identical to the uninterrupted run (asserted in
tests/test_checkpoint.py, the 'fault injection' test). A portable .npz
export of the constrained parameters supports cross-checking against
reference runs.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np

import orbax.checkpoint as ocp

from dp_gp_lvm_tpu.train.loop import TrainState


class Checkpointer:
    """Thin orbax wrapper: save/restore (params, opt_state, step)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(self, state: TrainState, force: bool = False):
        step = int(state.step)
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, template: TrainState) -> TrainState | None:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def close(self):
        self._mgr.close()


def export_npz(path: str, constrained_params: dict[str, Any]):
    """Portable dump of constrained params (mu, S, Z, theta, gamma, phi)."""
    flat = {}

    def add(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                add(f"{prefix}{k}/", v)
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                add(f"{prefix}{i}/", v)
        else:
            flat[prefix.rstrip("/")] = np.asarray(obj)

    add("", constrained_params)
    np.savez(path, **flat)


def load_npz(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as f:
        return {k: f[k] for k in f.files}
