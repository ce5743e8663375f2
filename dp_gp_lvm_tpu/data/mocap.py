"""CMU mocap data IO: AMC joint-angle parser + synthetic fallback.

The reference's data layer parses CMU skeleton files into an (N, D~60)
joint-angle matrix (SURVEY.md section 2a 'Data IO'). This parser reads the
standard AMC motion-capture text format:

    :FULLY-SPECIFIED / :DEGREES header lines
    <frame number>
    bonename v1 v2 ...      (one line per bone, channels in ASF order)

Returns the per-frame concatenation of all bone channels. In this
zero-egress environment the CMU files are absent, so `load_mocap` falls
back to the `synthetic.mocap_like` generator at the same (N, D) scale —
the BASELINE configs run either way.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def parse_amc(path: str):
    """Parse an AMC file -> (frames (N, D) float64, channel names list)."""
    frames: list[dict[str, list[float]]] = []
    current: dict[str, list[float]] | None = None
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#") or line.startswith(":"):
                continue
            if line.isdigit():
                if current:
                    frames.append(current)
                current = {}
                continue
            if current is None:
                continue
            parts = line.split()
            current[parts[0]] = [float(v) for v in parts[1:]]
    if current:
        frames.append(current)
    if not frames:
        raise ValueError(f"no frames parsed from {path}")
    bones = list(frames[0].keys())
    names = []
    for b in bones:
        for i in range(len(frames[0][b])):
            names.append(f"{b}:{i}")
    data = np.asarray(
        [[v for b in bones for v in fr[b]] for fr in frames], dtype=np.float64
    )
    return data, names


def preprocess(Y: np.ndarray, drop_constant: bool = True):
    """Standardize channels; drop zero-variance (constant) channels, as is
    conventional for GP-LVM mocap experiments."""
    std = Y.std(axis=0)
    if drop_constant:
        keep = std > 1e-8
        Y = Y[:, keep]
        std = std[keep]
    return (Y - Y.mean(axis=0)) / std


def load_mocap(
    path: str | None = None,
    n: int = 1024,
    d: int = 59,
    subsample: int = 1,
    dtype=jnp.float64,
    rng=None,
):
    """Load an AMC file if available, else generate mocap-like data.

    Returns (Y (N, D), source_tag)."""
    if path and os.path.exists(path):
        Y, _ = parse_amc(path)
        Y = preprocess(Y[::subsample])
        return jnp.asarray(Y, dtype), f"amc:{os.path.basename(path)}"
    import jax

    from dp_gp_lvm_tpu.data import synthetic

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    Y, _ = synthetic.mocap_like(rng, n=n, d=d, dtype=dtype)
    return Y, "synthetic:mocap_like"
