"""Named experiment configurations — one per BASELINE.json config (1-5),
runnable by name through experiments/run.py so each capability gate can be
exercised directly (SURVEY.md section 5 'Config / flag system').

Each entry fully determines data generation/loading, the model family,
model sizes, optimizer settings, and dtype policy. Serialized alongside
checkpoints for reproducibility.
"""
from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    model: str                   # gp_regression | sparse_gp | bgplvm | mrd | dp_gp_lvm
    dataset: str                 # synthetic generator or loader name
    n: int
    d: int                       # total output dims (per-view for mrd: see views)
    q: int                       # latent dims
    m: int = 0                   # inducing points (0 = exact GP)
    t: int = 1                   # DP truncation
    alpha: float = 1.0
    views: tuple[int, ...] = ()  # MRD per-view dims
    steps: int = 2000
    lr: float = 1e-2
    psi2_block: int | None = None
    dtype: str = "float32"       # float32 on TPU; float64 for CPU parity
    seed: int = 0
    missing_fraction: float = 0.0  # config 5: fraction of held-out dims

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


CONFIGS: dict[str, ExperimentConfig] = {
    # BASELINE configs[0]
    "c1_bgplvm_toy": ExperimentConfig(
        name="c1_bgplvm_toy", model="bgplvm", dataset="toy_gplvm",
        n=100, d=10, q=2, m=20, steps=2000, lr=2e-2,
    ),
    # BASELINE configs[1]
    "c2_sparse_oil": ExperimentConfig(
        name="c2_sparse_oil", model="bgplvm", dataset="oil_flow",
        n=1000, d=12, q=10, m=50, steps=3000, lr=1e-2,
    ),
    # BASELINE configs[2]
    "c3_mrd_twoview": ExperimentConfig(
        name="c3_mrd_twoview", model="mrd", dataset="two_view",
        n=100, d=16, q=4, m=20, views=(8, 8), steps=2000, lr=2e-2,
    ),
    # BASELINE configs[3]
    "c4_dp_mocap": ExperimentConfig(
        name="c4_dp_mocap", model="dp_gp_lvm", dataset="mocap",
        n=1024, d=59, q=10, m=64, t=20, steps=8000, lr=3e-3,
    ),
    # BASELINE configs[4]
    "c5_dp_missing": ExperimentConfig(
        name="c5_dp_missing", model="dp_gp_lvm", dataset="mocap",
        n=1024, d=59, q=10, m=64, t=20, steps=8000, lr=3e-3,
        missing_fraction=0.5,
    ),
}


def get(name: str) -> ExperimentConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config {name!r}; have {sorted(CONFIGS)}")
    return CONFIGS[name]
