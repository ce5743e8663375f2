"""Training: one fused jit-compiled ELBO + gradient + update step.

Replaces the reference's `sess.run(train_op)` loop (SURVEY.md call stack
3.1): the whole loop body — psi statistics, Cholesky factorizations, bound,
backward pass, optax update — is a single XLA program; multi-step training
uses `lax.scan` so even the Python-loop overhead disappears for benchmark
runs. Works for any model module exposing `loss(params, data, config)`.
"""
from __future__ import annotations

import functools
import time
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


# Kernel hyperparameters and stick posteriors destabilize f32 training when
# they move as fast as the variational params (ARD collapse drives K_uu
# toward rank deficiency; see core/types.JitterPolicy). The production
# recipe: hypers at lr/10, clip, skip non-finite steps.
HYPER_PARAM_NAMES = frozenset(
    {"raw_variance", "raw_ard", "raw_noise", "raw_gamma1", "raw_gamma2",
     "raw_alpha"}
)


def ngd_precondition() -> optax.GradientTransformation:
    """Inverse-Fisher preconditioner for the diag-Gaussian q(X) params.

    For q(X) = N(m, diag(s)) the Fisher information is block-diagonal
    diag(1/s, 1/(2 s^2)); in the raw (inverse-softplus) parameterization
    of s the metric picks up the bijector Jacobian sigmoid(raw)^2, so

        natgrad_m   = s * g_m
        natgrad_raw = 2 s^2 / sigmoid(raw)^2 * g_raw.

    Exact and elementwise — no extra state, no linear solves. The
    classic effect (GPflow natural-gradient practice: NGD on variational
    params, Adam elsewhere) is removing the pathological curvature of
    the variance directions, whose plain gradients vanish as s -> 0.
    Chain with optax.scale(-lr) / scale_by_schedule for the step size.
    Expects the labeled subtree to contain "qx_mean" and "raw_qx_var".
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ngd_precondition requires params")
        from dp_gp_lvm_tpu.core.transforms import positive_variational_var

        raw = params["raw_qx_var"]
        s = positive_variational_var(raw)
        sig = jax.nn.sigmoid(raw)
        new = dict(updates)
        new["qx_mean"] = updates["qx_mean"] * s
        new["raw_qx_var"] = (
            updates["raw_qx_var"] * 2.0 * s * s / (sig * sig + 1e-12)
        )
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


def gp_optimizer(
    params,
    lr: float = 1e-2,
    hyper_lr: float | None = None,
    clip: float = 100.0,
    skip_nonfinite: int = 100_000,
    decay_steps: int | None = None,
    ngd_lr: float | None = None,
    ard_lr: float | None = None,
    ard_warmup: int | None = None,
    hyper_warmup: int | None = None,
    freeze: frozenset = frozenset(),
    slow: frozenset = frozenset(),
) -> optax.GradientTransformation:
    """Stability-tuned optimizer for the GP-LVM family.

    Validated on the DP-GP-LVM mocap config: equal learning rates spike
    and NaN in f32 around the ARD-collapse regime; a 10x slower rate on
    kernel hypers descends smoothly (see commit history / PARITY.md).
    decay_steps adds a cosine decay to lr/20 over that horizon — full-
    batch Adam oscillates at a constant rate once near an optimum.

    skip_nonfinite is deliberately huge: optax.apply_if_finite APPLIES the
    non-finite update once max_consecutive_errors is reached — a
    persistent failure (e.g. a Cholesky that keeps failing at frozen
    params) would poison the run at a small threshold. With the
    escalating-jitter Cholesky (JitterPolicy max_tries > 0, the default)
    failures self-repair, so the counter never accumulates.
    """
    hyper_lr = lr / 10.0 if hyper_lr is None else hyper_lr
    # ard_lr: optional hot rate for raw_ard ALONE. Minibatch-SVI ARD
    # separation at big N needs ~30x the calm hyper rate, but heating
    # ALL hypers collapses the kernel variance (c9_long: sigma_f^2
    # 0.40 -> 0.068) into a degenerate high-likelihood regime where
    # whitened q(u) means carry the O(1) signal and predictive
    # uncertainty is capped at sigma_f^2 — cross-view PLL craters to -8
    # (results/c9_diag.json). Heating only the ARD weights separates the
    # shared/private signature while sigma_f^2/noise stay calibrated.
    ngd_sched = None
    if decay_steps:
        if ngd_lr is not None:
            ngd_sched = optax.cosine_decay_schedule(
                ngd_lr, decay_steps, alpha=0.05
            )
        lr = optax.cosine_decay_schedule(lr, decay_steps, alpha=0.05)
        if hyper_warmup:
            # hot-hyper phases (mrd_recipe phase A) ramp the hyper rate
            # from 0: the full-scale c9 staged run at a cold-started hot
            # rate went non-finite by step ~750 (aborted run, 2026-08-20)
            hyper_lr = optax.warmup_cosine_decay_schedule(
                0.0, hyper_lr, hyper_warmup, decay_steps,
                end_value=0.05 * hyper_lr,
            )
        else:
            hyper_lr = optax.cosine_decay_schedule(
                hyper_lr, decay_steps, alpha=0.05
            )
        if ard_lr is not None:
            # warmup matters here: a hot ARD rate from a COLD start
            # (q(u), q(X) uninformed) NaNs within 250 steps at c9 scale
            # and never recovers (elbo -6e12 by step 249, ard_lr=0.03 +
            # NGD rho=1.0). Proxy-scale evidence for the ramped dial
            # (results/c9_structure.json): at peak 3e-2/short ramp the
            # run separates (0.35/0.14) but logs 6/20 transient
            # non-finite chunks that apply_if_finite skips; at peak
            # 1.5e-2 with a 600-step ramp it separates (0.44/0.16) with
            # ZERO bad chunks (warmup_ard_gentle row) — prefer the
            # gentle setting. The PRODUCTION structure path for c9
            # remains the staged recipe (train/mrd_recipe.py).
            warm = (ard_warmup if ard_warmup is not None
                    else min(2000, decay_steps // 10))
            ard_lr = optax.warmup_cosine_decay_schedule(
                0.0, ard_lr, warm, decay_steps, end_value=0.05 * ard_lr,
            )
    else:
        if ngd_lr is not None:
            ngd_sched = lambda _: ngd_lr
        if ard_lr is not None:
            # no decay horizon given: still warm up (linear ramp to the
            # configured peak, then constant). A constant hot rate from
            # step 0 is the exact cold-start mode documented above —
            # direct gp_optimizer callers must not get it silently.
            peak = ard_lr
            warm = 2000 if ard_warmup is None else ard_warmup
            ard_lr = optax.linear_schedule(0.0, peak, max(warm, 1))

    NGD_NAMES = frozenset({"qx_mean", "raw_qx_var"})

    def label(k):
        if k in freeze:
            # staged recipes pin leaves exactly (e.g. DP-SVI stage 2b
            # clusters dims at a FIXED manifold: only noise / q(u|t) /
            # phi move, so per-atom residual levels stay static while
            # assignments form)
            return "frozen"
        if ard_lr is not None and k == "raw_ard":
            return "ard"
        if k in HYPER_PARAM_NAMES or k in slow:
            # `slow`: extra leaves at the hyper rate — e.g. "z" in
            # amortized big-N SVI, where full-rate inducing points
            # cluster (zmin 1.2 -> 0.16 measured) and drive
            # cond(K_uu) past the f32 whitening limit
            return "hyper"
        if ngd_lr is not None and k in NGD_NAMES:
            return "ngd"
        return "var"

    labels = {k: label(k) for k in params}
    if isinstance(params, dict) and "views" in params:
        labels["views"] = [
            {kk: label(kk) for kk in vp} for vp in params["views"]
        ]
    transforms = {"hyper": optax.adam(hyper_lr), "var": optax.adam(lr),
                  "frozen": optax.set_to_zero()}
    if ard_lr is not None:
        transforms["ard"] = optax.adam(ard_lr)
    if ngd_lr is not None and "ngd" not in jax.tree_util.tree_leaves(labels):
        # amortized q(X) (models/amortized.py) has no qx table leaves;
        # the inverse-Fisher preconditioner would otherwise receive
        # MaskedNodes from optax.multi_transform and crash
        ngd_lr = None
        ngd_sched = None
    if ngd_lr is not None:
        transforms["ngd"] = optax.chain(
            ngd_precondition(),
            optax.scale_by_schedule(lambda c: -ngd_sched(c)),
        )
    opt = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.multi_transform(transforms, labels),
    )
    if skip_nonfinite:
        opt = optax.apply_if_finite(opt, skip_nonfinite)
    return opt


class NonFiniteGuard:
    """K-consecutive-non-finite-chunks abort for chunked training loops.

    The round-4 c9_ardlr run NaN'd at ~step 1,500 and kept dispatching
    30,500 useless NaN steps (~12 min of TPU time): optax.apply_if_finite
    skips bad UPDATES but nothing halted the LOOP once the params
    themselves were poisoned. Feed each chunk's fetched losses to
    `update`; when `k` consecutive chunks contain any non-finite value it
    returns True — the loop must stop, mark the run failed, and exit
    nonzero (experiments/run.py exits 3). One finite chunk resets the
    counter, so a transient skip-and-recover does not kill a run.
    """

    def __init__(self, k: int = 3):
        self.k = k
        self.consecutive = 0
        self.first_bad_step: int | None = None

    def update(self, losses, step: int) -> bool:
        import numpy as np

        if bool(np.all(np.isfinite(np.asarray(losses)))):
            self.consecutive = 0
            self.first_bad_step = None
            return False
        if self.consecutive == 0:
            self.first_bad_step = step
        self.consecutive += 1
        return self.consecutive >= self.k


def make_step_fn(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    donate: bool = True,
):
    """Return jitted `step(state, *data) -> (state, metrics)`.

    The optimizer is used as given — init the TrainState with the *same*
    transformation. For non-finite-step skipping (the training-loop arm of
    the numerical sanitizers, SURVEY.md section 5), build the optimizer
    with `gp_optimizer(...)` (it wraps in `optax.apply_if_finite`) or wrap
    explicitly before calling this.
    """

    def step(state: TrainState, *data):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *data)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "elbo": -loss, "grad_norm": gnorm}
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.asarray(0))


def make_multi_step_fn(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    num_inner: int,
):
    """`multi_step(state, *data)` runs num_inner optimizer steps in one XLA
    program via lax.scan — the benchmark configuration."""

    def one(state, *data):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *data)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def multi_step(state: TrainState, *data):
        def body(s, _):
            return one(s, *data)

        state, losses = jax.lax.scan(body, state, None, length=num_inner)
        return state, losses

    return jax.jit(multi_step, donate_argnums=(0,))


def make_streaming_scan_fn(step_fn):
    """One XLA program running a whole host-fed scan-chunk of streaming
    minibatch steps: `scan_chunk(state, rngs, idx, y) -> (state,
    losses)` with rngs (chunk, 2), idx (chunk, B) int32, y (chunk, B, D)
    — exactly what data/stream.ChunkStream.next_chunk() produces.
    step_fn must be a streaming step (e.g. dp_svi.make_dp_svi_step(...,
    streaming=True)), whose data argument is the (idx, y_b) pair. The
    state is donated; the (idx, y) chunk buffers are NOT (the stream
    reuses them host-side two chunks later)."""

    def scan_chunk(state: TrainState, rngs, idx, y):
        def one(st, x):
            r, i, yb = x
            st, metrics = step_fn(st, r, (i, yb))
            return st, metrics["loss"]

        return jax.lax.scan(one, state, (rngs, idx, y))

    return jax.jit(scan_chunk, donate_argnums=(0,))


def fit_lbfgs(
    loss_fn: Callable,
    params,
    data: tuple,
    num_steps: int = 100,
    memory_size: int = 15,
):
    """L-BFGS training — the reference's ScipyOptimizerInterface analogue
    (SURVEY.md section 2a 'Optimizer wiring'), as one jitted lax.scan with
    optax.lbfgs + zoom line search. Best for the smooth full-batch
    hyperparameter problems (GP regression, SGPR); Adam remains the
    default for the latent-variable models.

    Returns (params, losses (num_steps,)).
    """
    import functools

    opt = optax.lbfgs(memory_size=memory_size)
    fun = lambda p: loss_fn(p, *data)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry, _):
        p, state = carry
        value, grad = value_and_grad(p, state=state)
        updates, state = opt.update(
            grad, state, p, value=value, grad=grad, value_fn=fun
        )
        p = optax.apply_updates(p, updates)
        return (p, state), value

    @jax.jit
    def run(p):
        state = opt.init(p)
        (p, _), losses = jax.lax.scan(
            step, (p, state), None, length=num_steps
        )
        return p, losses

    return run(params)


def fit(
    loss_fn: Callable,
    params,
    data: tuple,
    num_steps: int,
    lr: float = 1e-2,
    log_every: int = 0,
    callback: Callable | None = None,
):
    """Convenience trainer. Returns (params, history dict of arrays).

    For production runs prefer make_multi_step_fn + checkpointing
    (train/checkpoint.py); this helper is for tests and experiments.
    """
    optimizer = optax.adam(lr)
    step = make_step_fn(loss_fn, optimizer, donate=False)
    state = init_state(params, optimizer)
    elbos = []
    for i in range(num_steps):
        state, metrics = step(state, *data)
        if log_every and (i % log_every == 0 or i == num_steps - 1):
            e = float(metrics["elbo"])
            elbos.append(e)
            if callback is not None:
                callback(i, e, metrics)
    return state.params, {"elbo": elbos}


def time_steps(step_fn, state, data: tuple, num_steps: int, warmup: int = 2):
    """Wall-clock seconds per step, excluding compile (BASELINE metric)."""
    for _ in range(warmup):
        state, m = step_fn(state, *data)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(num_steps):
        state, m = step_fn(state, *data)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / num_steps, state
