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
import math


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
    restarts: int = 1            # train from `restarts` init seeds, keep
    #                              the best final ELBO (non-convex models:
    #                              MRD's independent-encoding local optimum)
    amortized: bool = False      # recognition-network q(X)
    #                              (models/amortized.py): O(encoder)
    #                              variational state instead of the
    #                              O(N) table — SVI families only
    noise_floor: float = 0.0     # lower bound on noise VARIANCE for the
    #                              SVI families (svi_gplvm/dp_svi/mrd_svi
    #                              Config.noise_floor). Required in
    #                              amortized mode: a shared encoder can
    #                              memorize y->x and collapse the noise
    #                              to its 1e-6 f32 floor (measured on the
    #                              first c8 TPU run: elbo estimates
    #                              oscillating at +-1e8 from beta~1e6 f32
    #                              cancellation, held-out imputation 10x
    #                              worse than c6's resident table).
    qx_var_floor: float = 0.0    # additive floor on AMORTIZED q(X)
    #                              variance (svi Config.qx_var_floor):
    #                              prevents the shared-encoder variance
    #                              collapse that makes batch psi stats
    #                              hyper-local and diverges the natgrad
    #                              q(u) recursion at c8 scale (round 4)
    ngd_lr: float | None = None  # natural-gradient rate for q(X) params
    #                              (train.loop.ngd_precondition); None = Adam
    #                              everywhere. ~1.0 is the measured stable
    #                              optimum at mocap scale; 2.0+ destabilizes.
    staged: bool = False         # mrd_svi: train via the two-phase
    #                              structure-then-recalibrate recipe
    #                              (train/mrd_recipe.py) — hot-hyper ARD
    #                              separation, then frozen-ARD
    #                              variance-reset calm recalibration.
    #                              Required at c9 scale: single-phase
    #                              runs either stay flat (calm) or end
    #                              overconfident (hot); see
    #                              results/c9_diag.json.
    ard_lr: float | None = None  # hot Adam rate for raw_ard ALONE
    #                              (train.loop.gp_optimizer): minibatch-SVI
    #                              ARD separation at big N needs ~30-100x
    #                              the calm lr/10 hyper rate, but heating
    #                              ALL hypers collapses sigma_f^2 into a
    #                              degenerate regime that caps predictive
    #                              variance and craters cross-view PLL
    #                              (results/c9_diag.json). None = ARD at
    #                              the hyper rate.

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


CONFIGS: dict[str, ExperimentConfig] = {
    # BASELINE configs[0].  q=6 with q_true=2 active generating dims so the
    # run demonstrates ARD pruning (SURVEY.md section 7 minimum-slice gate:
    # "ARD weights recover the 2 active dims" — meaningless at q_total ==
    # q_true, VERDICT r1 weak item 7).
    "c1_bgplvm_toy": ExperimentConfig(
        name="c1_bgplvm_toy", model="bgplvm", dataset="toy_gplvm",
        n=100, d=10, q=6, m=20, steps=6000, lr=2e-2,
    ),
    # BASELINE configs[1]
    "c2_sparse_oil": ExperimentConfig(
        name="c2_sparse_oil", model="bgplvm", dataset="oil_flow",
        n=1000, d=12, q=10, m=50, steps=3000, lr=1e-2, ngd_lr=1.0,
    ),
    # BASELINE configs[2]
    # n=256/m=32/8000 steps with a shared-dominant generator (q_shared=2,
    # private_weight=0.5 — see data/synthetic.two_view): at the round-1
    # settings (1-of-2 active dims shared, 2000 steps) MRD reliably falls
    # into the "independent encodings" local optimum (each view encodes
    # its signal in disjoint latent dims; cross-view ratio ~1.0). The
    # calibrated recipe recovers shared structure: measured cross-view
    # MSE ratio 0.645 under Adam; ngd_lr=1.0 (round-4 sweep,
    # results/c3_ngd_sweep.json) trims it to 0.621 and is adopted —
    # lr 0.3 underperforms, 3.0 diverges, 2x steps converges at 0.637.
    # Ceiling analysis (experiments/mrd_ceiling.py,
    # results/mrd_ceiling.json): an EXACT GP given the held-out rows'
    # TRUE shared latents reaches 0.485 on this protocol (theory floor
    # 0.293 at infinite data), so the recipe sits within ~1.28x of a
    # ceiling that excludes latent-inference error; the sweep shows
    # every trained-model dial lands in 0.62-0.65. (An earlier comment
    # cited a "both-view bound ~0.23" — retracted: observing both views
    # leaks the target's private coordinate; not a cross-view ceiling.)
    "c3_mrd_twoview": ExperimentConfig(
        name="c3_mrd_twoview", model="mrd", dataset="two_view",
        n=256, d=16, q=4, m=32, views=(8, 8), steps=8000, lr=2e-2,
        restarts=3, ngd_lr=1.0,
    ),
    # BASELINE configs[3]
    # ngd_lr=1.0: natural gradients on q(X) lift the DP configs off
    # Adam's variational-variance plateau (+20k nats at equal steps,
    # better held-out imputation — results/ngd_convergence.json); the
    # toy/small configs are already at their optimum under Adam.
    "c4_dp_mocap": ExperimentConfig(
        name="c4_dp_mocap", model="dp_gp_lvm", dataset="mocap",
        n=1024, d=59, q=10, m=64, t=20, steps=8000, lr=3e-3, ngd_lr=1.0,
    ),
    # BASELINE configs[4]
    "c5_dp_missing": ExperimentConfig(
        name="c5_dp_missing", model="dp_gp_lvm", dataset="mocap",
        n=1024, d=59, q=10, m=64, t=20, steps=8000, lr=3e-3, ngd_lr=1.0,
        missing_fraction=0.5,
    ),
    # BASELINE configs[4] second modality ("mocap + pose"): held-out-dim
    # imputation on 2D-keypoint pose trajectories (synthetic.pose_like —
    # forward-kinematic limb groups), VERDICT r1 missing item 4.
    "c5_pose_missing": ExperimentConfig(
        name="c5_pose_missing", model="dp_gp_lvm", dataset="pose",
        n=512, d=32, q=8, m=48, t=12, steps=6000, lr=3e-3, ngd_lr=1.0,
        missing_fraction=0.5,
    ),
    # Beyond-reference: minibatch SVI-GPLVM at 128x the reference's data
    # scale (the reference is full-batch-only). batch rows/step = 1024
    # (ExperimentConfig.m doubles as inducing count; batch fixed in the
    # svi run branch). Held-out-dim imputation served from q(u) alone.
    "c6_svi_bigN": ExperimentConfig(
        name="c6_svi_bigN", model="svi_gplvm", dataset="mocap",
        n=131072, d=32, q=8, m=64, steps=6000, lr=3e-3, ngd_lr=1.0,
        missing_fraction=0.5, psi2_block=8192,
    ),
    # Beyond-reference: minibatch DP-SVI — the flagship DP-GP-LVM at
    # 128x the reference's data scale (reference configs[3] is N=1024
    # full-batch). Per-atom natural-gradient q(u|t) + damped stochastic
    # CAVI phi/gamma (models/dp_svi.py); planted output-dim groups
    # (grouped_dims_big) give a recovery gate at scale.
    "c7_dp_svi": ExperimentConfig(
        name="c7_dp_svi", model="dp_svi", dataset="grouped_big",
        n=131072, d=32, q=8, m=64, t=8, steps=4000, lr=3e-3, ngd_lr=1.0,
        psi2_block=8192,
    ),
    # Beyond-reference: c6 with AMORTIZED q(X) (models/amortized.py) —
    # the recognition network replaces the 131072 x 8 variational table
    # with O(encoder) weights, so device state is N-free end to end
    # (composes with --stream for the full beyond-HBM pipeline) and
    # held-out latents come from ONE forward pass instead of a per-row
    # optimization loop.
    "c8_amortized_svi": ExperimentConfig(
        name="c8_amortized_svi", model="svi_gplvm", dataset="mocap",
        n=131072, d=32, q=8, m=64, steps=6000, lr=3e-3,
        missing_fraction=0.5, psi2_block=8192, amortized=True,
        noise_floor=1e-3, qx_var_floor=1e-2,
    ),
    # Beyond-reference: minibatch multi-view MRD-SVI (models/mrd_svi.py)
    # at 128x the reference's data scale (reference MRD / c3 is
    # full-batch-only). Shared q(X), per-view whitened q(u^v) by
    # per-view stochastic natural gradient; cross-view prediction served
    # from q(u) alone (no training data at serving time). Data is the
    # c3 signal regime (q_shared=2, private_weight=0.5) through the
    # O(n) RFF generator two_view_big.
    "c9_mrd_svi_bigN": ExperimentConfig(
        name="c9_mrd_svi_bigN", model="mrd_svi", dataset="two_view_big",
        n=131072, d=64, q=4, m=32, views=(32, 32), steps=24000, lr=3e-3,
        psi2_block=8192, staged=True,
        # phase-B noise runaway guard (see train/mrd_recipe.recalibrated
        # docstring): the honest per-view residual measured on the
        # stable run is ~0.078, so a 0.05 floor binds only against the
        # collapse. In the config (not the recipe) so training AND every
        # eval consumer constrain identically (advisor r4 finding 3).
        noise_floor=0.05,
    ),
}


def get(name: str) -> ExperimentConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config {name!r}; have {sorted(CONFIGS)}")
    return CONFIGS[name]


# Regression gates (VERDICT r1 item 7): committed quality thresholds per
# config, asserted by `experiments/run.py <name> --check`. Each entry is
# metric -> (op, threshold); a finished run FAILS (exit 1) if any gated
# metric regresses past its threshold. Thresholds carry headroom over the
# round-1/2 measured artifacts in results/ so they catch real regressions,
# not seed noise.
CHECKS: dict[str, dict[str, tuple[str, float]]] = {
    # calibrated on the 2026-08-16 TPU run: elbo -801.3, sep 42.1
    "c1_bgplvm_toy": {
        "elbo": (">=", -900.0),
        "ard_recall_top2": (">=", 1.0),       # both true dims in the top 2
        "ard_separation_ratio": (">=", 10.0),  # active vs pruned ARD gap
    },
    # calibrated on the 2026-08-17 NGD run: elbo -8029 (Adam: -9942)
    "c2_sparse_oil": {
        "elbo": (">=", -9000.0),
    },
    # calibrated on the 2026-08-17 TPU runs: elbo -4087, ratio 0.645,
    # pll/dim -1.100; oracle ceiling 0.485 (results/mrd_ceiling.json)
    "c3_mrd_twoview": {
        "elbo": (">=", -4700.0),
        # cross-view prediction must beat predicting the training mean
        # (measured 0.645 vs true-latent oracle 0.485 on this protocol)
        "cross_view_mse_ratio": ("<=", 0.70),
        "cross_view_pll_per_dim": (">=", -1.3),
        # shared/private structure gate (round-4 verdict weak-2): the
        # weakest per-view ARD weight (the other view's private dim;
        # generator truth 0) over the mean shared weight, max over
        # views. Measured 0.0016 on the committed artifact; flat
        # relevance = 1.0.
        "ard_cross_private_ratio": ("<=", 0.05),
        # calibration (round-4 verdict item 7): err^2 / mean predictive
        # variance, measured 1.06 on the refreshed artifact
        "calibration_ratio": [(">=", 0.2), ("<=", 5.0)],
    },
    # calibrated on the 2026-08-17 NGD run: elbo +10075
    "c4_dp_mocap": {
        "elbo": (">=", 7000.0),
    },
    # calibrated on the 2026-08-17 NGD run under the clean protocol
    # (train-only standardization, strided interpolation holdout):
    # mse 0.0017, pll/dim +0.635
    "c5_dp_missing": {
        "imputation_mse": ("<=", 0.01),
        "predictive_loglik_per_dim": (">=", 0.3),
        # calibration: measured 0.038 — the interpolation holdout is far
        # easier than the learned noise implies (honest underconfidence);
        # the gate exists to catch c9-style OVERconfidence (17.8)
        "calibration_ratio": [(">=", 0.005), ("<=", 5.0)],
    },
    # calibrated on the 2026-08-17 NGD run: mse 0.095, pll/dim -0.076
    # (16 of 32 keypoint dims imputed on the FK pose surrogate)
    "c5_pose_missing": {
        "imputation_mse": ("<=", 0.15),
        "predictive_loglik_per_dim": (">=", -0.2),
        # calibration: measured 1.37
        "calibration_ratio": [(">=", 0.2), ("<=", 5.0)],
    },
    # calibrated on the 2026-08-17 TPU run: mse 0.025, pll -0.49,
    # 328k rows/s through the tunneled chip (per-chunk dispatch latency
    # through the relay varies session to session — the throughput gate
    # is a conservative floor; quality gates are the strict ones)
    "c6_svi_bigN": {
        "imputation_mse": ("<=", 0.05),
        "predictive_loglik_per_dim": (">=", -0.8),
        "rows_per_sec": (">=", 150000.0),
        # optimization-quality anchor (VERDICT r2 weak item 7): the
        # full-data uncollapsed ELBO at the trained params. Calibrated
        # on the 2026-08-17 run (-5.41e6); an optimizer regression that
        # imputation happens to survive trips this first.
        "elbo": (">=", -6.0e6),
        # calibration: measured 0.074 (same honest-underconfidence regime
        # as c5 — noise dominates the predictive variance)
        "calibration_ratio": [(">=", 0.01), ("<=", 5.0)],
    },
    # calibrated on the 2026-08-17 TPU runs of the 3-phase split-init
    # recipe (elbo -4.32e6, purity_min 0.75, 4/4 distinct atoms,
    # 143k rows/s): all four planted groups recovered on DISTINCT
    # atoms at 128x the reference's data scale — the flagship gate.
    "c7_dp_svi": {
        "elbo": (">=", -5.0e6),
        "group_purity_min": (">=", 0.6),
        "distinct_atoms_for_groups": (">=", 4.0),
        "rows_per_sec": (">=", 100000.0),
        # tightened from the round-5 refreshed artifact (pll -0.844,
        # calib 0.639; the round-3 mixture predictive emitted NaN PLL
        # and nothing gated it)
        "predictive_loglik_per_dim": (">=", -1.15),
        "calibration_ratio": [(">=", 0.1), ("<=", 5.0)],
    },
    # conservative first-run floors (amortization restricts the
    # variational family, so elbo/mse sit below/above the c6 values by
    # construction); tighten after the first committed TPU artifact
    # calibrated from the first gate-passing TPU artifact (round 4:
    # mse 0.0079, pll +0.153, f64 elbo -1.15e6, 573k rows/s) with
    # headroom beyond calibrate_checks' 1.4x on mse for seed noise
    "c8_amortized_svi": {
        "imputation_mse": ("<=", 0.02),
        "predictive_loglik_per_dim": (">=", -0.15),
        "rows_per_sec": (">=", 280000.0),
        # two-sided: the round-3 divergent run reported +4.56e8, which is
        # above the analytic cap (noise_floor 1e-3 bounds the per-point
        # Gaussian LL at ~2.9 nats; N*d = 4.2e6 points -> any valid bound
        # is <= ~1.2e7) yet would have passed a lower-bound-only gate.
        "elbo": [(">=", -1.35e6), ("<=", 1.2e7)],
        # calibration: measured 0.073
        "calibration_ratio": [(">=", 0.01), ("<=", 5.0)],
    },
    # calibrated from the first gate-passing TPU artifact (2026-08-20,
    # staged structure-then-recalibrate recipe): mse_ratio 0.429,
    # pll -0.889, calib 1.33, sig 0.161, 341k rows/s, elbo -1.87e6
    # (calibrate_checks headroom; throughput floor at ~half measured)
    "c9_mrd_svi_bigN": {
        "elbo": (">=", -2.15e6),
        "cross_view_mse_ratio": ("<=", 0.56),
        "cross_view_pll_per_dim": (">=", -1.19),
        "rows_per_sec": (">=", 170000.0),
        # structure gate (round-4 verdict weak-2): measured 0.161; flat
        # relevance = 1.0, the hypers-only staged run stalled at 0.70
        "ard_cross_private_ratio": ("<=", 0.3),
        # calibration gate (round-4 verdict item 7): err^2 over mean
        # predictive variance; the overconfident hot run sat at 17.8
        # and the collapse was visible here long before PLL caught it
        "calibration_ratio": [(">=", 0.2), ("<=", 5.0)],
    },
}

_OPS = {
    ">=": lambda v, t: v >= t,
    "<=": lambda v, t: v <= t,
}


def _walk_numeric(obj, path, out):
    if isinstance(obj, bool):
        return
    if isinstance(obj, (int, float)):
        out.append((path, float(obj)))
    elif isinstance(obj, dict):
        for k, v in obj.items():
            _walk_numeric(v, f"{path}.{k}" if path else str(k), out)
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _walk_numeric(v, f"{path}[{i}]", out)


def evaluate_checks(name: str, result: dict) -> list[str]:
    """Return a list of human-readable failures (empty = all gates pass).

    Finiteness-by-default (round-3 verdict weak-4a): EVERY numeric leaf in
    result must be finite, gated or not — a NaN predictive log-likelihood
    or an overflowed ELBO fails the check even when no named gate covers
    that metric.
    """
    failures = []
    numerics: list[tuple[str, float]] = []
    _walk_numeric(result, "", numerics)
    for path, value in numerics:
        if math.isnan(value) or math.isinf(value):
            failures.append(f"{path}: non-finite value {value}")
    for metric, gates in CHECKS.get(name, {}).items():
        if metric not in result or result[metric] is None:
            failures.append(f"{metric}: MISSING from result")
            continue
        value = result[metric]
        # a gate is (op, threshold) or a list of them (e.g. a two-sided
        # range gate — round-3's impossible +4.56e8 c8 ELBO passed a
        # lower-bound-only gate)
        if isinstance(gates, tuple):
            gates = [gates]
        for op, threshold in gates:
            if not _OPS[op](value, threshold):
                failures.append(
                    f"{metric}: {value:.6g} not {op} {threshold:.6g}"
                )
    return failures
