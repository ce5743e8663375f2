"""Oil-flow dataset IO (Bishop & James three-phase flow, N=1000, D=12).

The reference loads the classic oil-flow benchmark for the sparse GP-LVM
config (SURVEY.md section 2a 'Data IO'; BASELINE configs[1]). The real
files (DataTrn.txt / DataTrnLbls.txt) are not present in this zero-egress
environment; `load_oil_flow` reads them when a directory is supplied and
they exist, else falls back to the `synthetic.oil_flow_like` generator
with the same shape and three-regime cluster structure.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def load_oil_flow(directory: str | None = None, dtype=jnp.float64, rng=None):
    """Returns (Y (1000, 12), labels (1000,), source_tag)."""
    if directory:
        data_p = os.path.join(directory, "DataTrn.txt")
        lbl_p = os.path.join(directory, "DataTrnLbls.txt")
        if os.path.exists(data_p):
            Y = np.loadtxt(data_p)
            Y = (Y - Y.mean(axis=0)) / Y.std(axis=0)
            if os.path.exists(lbl_p):
                lbls = np.argmax(np.loadtxt(lbl_p), axis=1)
            else:
                lbls = np.zeros(len(Y), dtype=int)
            return jnp.asarray(Y, dtype), jnp.asarray(lbls), "file:oil_flow"
    import jax

    from dp_gp_lvm_tpu.data import synthetic

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    Y, labels, _ = synthetic.oil_flow_like(rng, n=1000, d=12, dtype=dtype)
    return Y, labels, "synthetic:oil_flow_like"
