"""Suggest CHECKS gate lines from a finished run's result.json.

The committed regression gates (core/config.CHECKS) are calibrated from
measured TPU artifacts with headroom so they catch regressions, not seed
noise. New configs ship with UNCALIBRATED conservative floors; after
their first full-scale TPU run this prints tightened entries to paste
into CHECKS (the numbers still get a human look — a run that landed in
a bad local optimum should not be enshrined):

    python experiments/calibrate_checks.py results/c8/result.json [...]

Headroom rule (matches how the existing gates were set): score-like
metrics (elbo, pll) get ~10-15% of |value| slack in the failing
direction; error metrics (mse, ratio) get ~30-40% multiplicative slack;
throughput floors sit at ~half the measured rate (the tunnel's per-chunk
dispatch latency varies session to session).
"""
from __future__ import annotations

import json
import math
import sys


# metric -> (direction, slack rule); direction ">=" means larger is
# better and the gate is a floor.
RULES = {
    "elbo": (">=", lambda v: v - 0.15 * abs(v)),
    "imputation_mse": ("<=", lambda v: 1.4 * v),
    "predictive_loglik_per_dim": (">=", lambda v: v - max(0.3, 0.3 * abs(v))),
    "cross_view_mse_ratio": ("<=", lambda v: min(1.0, 1.3 * v)),
    "cross_view_pll_per_dim": (">=", lambda v: v - max(0.3, 0.3 * abs(v))),
    "rows_per_sec": (">=", lambda v: 0.5 * v),
    "group_purity_min": (">=", lambda v: 0.8 * v),
    "distinct_atoms_for_groups": (">=", lambda v: v),
    "ard_recall_top2": (">=", lambda v: v),
    "ard_separation_ratio": (">=", lambda v: 0.25 * v),
}


def _fmt(x: float) -> str:
    if x == int(x) and abs(x) < 1e6:
        return f"{x:.1f}"
    if abs(x) >= 1e5:
        return f"{x:.3g}"
    return f"{x:.4g}"


def suggest(result: dict) -> list[str]:
    lines = [f'    "{result.get("config", "?")}": {{']
    for metric, (op, rule) in RULES.items():
        if metric not in result or result[metric] is None:
            continue
        v = float(result[metric])
        if not math.isfinite(v):
            continue
        lines.append(f'        "{metric}": ("{op}", {_fmt(rule(v))}),'
                     f'   # measured {_fmt(v)}')
    lines.append("    },")
    return lines


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    for path in sys.argv[1:]:
        with open(path) as fh:
            result = json.load(fh)
        print(f"# from {path} (data={result.get('data')}, "
              f"steps={result.get('steps')}):")
        print("\n".join(suggest(result)))
        print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
