"""Staged training schedules (SURVEY.md sections 3.5, 2a 'Optimizer
wiring'): the reference trains in stages — e.g. freeze kernel
hyperparameters while q(X) and the inducing inputs settle, then optimize
jointly. Reproducing the schedule matters for matching ELBO trajectories
from a common init.

Implementation: optax.masked over the flat param pytree; each stage is a
(num_steps, predicate) pair where predicate(param_name) says whether that
top-level parameter trains in the stage. Every stage's step function is
its own single jitted program (masks are static).
"""
from __future__ import annotations

from typing import Callable, Sequence

import optax

from dp_gp_lvm_tpu.train.loop import init_state, make_step_fn


def masked_optimizer(
    lr: float, params, trainable: Callable[[str], bool],
    clip: float = 1e3,
) -> optax.GradientTransformation:
    """Adam over the subset of top-level params selected by `trainable`."""
    def build_mask(fn):
        mask = {k: fn(k) for k in params}
        if isinstance(params, dict) and "views" in params:
            # MRD: per-view sub-dicts get per-key decisions
            mask["views"] = [
                {kk: fn(kk) for kk in vp} for vp in params["views"]
            ]
        return mask

    # optax.masked passes untransformed updates through for masked-out
    # leaves — the frozen subset must be explicitly zeroed.
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.masked(optax.adam(lr), build_mask(trainable)),
        optax.masked(
            optax.set_to_zero(), build_mask(lambda k: not trainable(k))
        ),
    )


# Conventional stage predicates for this model family ---------------------

def variational_only(name: str) -> bool:
    """Stage 1: q(X) (table or recognition net), inducing inputs,
    assignments; hypers frozen."""
    return (
        name in ("qx_mean", "raw_qx_var", "z", "phi_logits")
        or name.startswith("enc_")
    )


def everything(name: str) -> bool:
    return True


def staged_fit(
    loss_fn: Callable,
    params,
    data: tuple,
    stages: Sequence[tuple[int, Callable[[str], bool]]] = None,
    lr: float = 1e-2,
    callback: Callable | None = None,
):
    """Run a stage schedule; returns (params, per-stage final ELBOs).

    Default schedule mirrors the reference: a short variational-only
    warmup, then joint optimization.
    """
    if stages is None:
        stages = [(200, variational_only), (1000, everything)]
    elbos = []
    for num_steps, pred in stages:
        optimizer = masked_optimizer(lr, params, pred)
        step = make_step_fn(loss_fn, optimizer, donate=False)
        state = init_state(params, optimizer)
        metrics = None
        for i in range(num_steps):
            state, metrics = step(state, *data)
            if callback is not None:
                callback(i, metrics)
        params = state.params
        elbos.append(float(metrics["elbo"]) if metrics else None)
    return params, elbos
