"""Learning-rate schedules stepped per batch.

Parity: reference code/train.py:437-472 — torch LinearLR warmup chained via
SequentialLR into {constant, exponential, multistep}:

- warmup (t < W):      lr * (1/(W+1) + (1 - 1/(W+1)) * t / W)
- exponential (t >= W): lr * gamma^(t - W), gamma = rate^(1/steps)
- multistep  (t >= W):  lr * gamma^#{milestones <= t - W}

The reference steps the scheduler once per *batch* (train.py:152); here the
schedule is a function of the optax update count, which advances once per
batch as well.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def build_lr_schedule(
    base_lr: float,
    main_scheduler: str,
    lr_warmup_n_steps: int = 0,
    exp_gamma_after_n_steps: Optional[float] = None,
    exp_n_steps: Optional[float] = None,
    multistep_milestones: Optional[Sequence[int]] = None,
    multistep_gamma: float = 0.1,
    milestone_shift: int = 0,
) -> Callable:
    """Returns schedule(step) -> lr. ``milestone_shift`` implements the
    sequential-view-increment milestone offset (reference train.py:452-453)."""
    W = int(lr_warmup_n_steps)

    if main_scheduler == "constant":
        def main(t):
            return jnp.ones_like(t, dtype=jnp.float32)
    elif main_scheduler == "exponential":
        assert exp_gamma_after_n_steps is not None and exp_n_steps is not None
        gamma = float(exp_gamma_after_n_steps) ** (1.0 / float(exp_n_steps))

        def main(t):
            return jnp.asarray(gamma, dtype=jnp.float32) ** t
    elif main_scheduler == "multistep":
        assert multistep_milestones is not None
        milestones = jnp.asarray(
            [m + milestone_shift for m in multistep_milestones], dtype=jnp.float32
        )
        gamma = float(multistep_gamma)

        def main(t):
            # torch MultiStepLR decays when the step count reaches each
            # milestone; with 1-based epoch semantics the factor after t
            # steps is gamma^#{m : m <= t}.
            n_passed = jnp.sum(t[..., None] >= milestones, axis=-1).astype(jnp.float32)
            return jnp.asarray(gamma, dtype=jnp.float32) ** n_passed
    else:
        raise NotImplementedError(f"Unknown LR scheduler: {main_scheduler}")

    def schedule(step):
        t = jnp.asarray(step, dtype=jnp.float32)
        if W > 0:
            start = 1.0 / (W + 1)
            warm_factor = start + (1.0 - start) * jnp.minimum(t, W) / W
        else:
            warm_factor = jnp.ones_like(t)
        main_factor = main(jnp.maximum(t - W, 0.0))
        factor = jnp.where(t < W, warm_factor, main_factor)
        return base_lr * factor

    return schedule


def schedule_from_conf(conf, milestone_shift: int = 0) -> Callable:
    """Parity: reference train.py:434-472 config plumbing."""
    return build_lr_schedule(
        base_lr=conf.get_float("train.lr"),
        main_scheduler=conf.get_string("train.lr_schedule.main_scheduler"),
        lr_warmup_n_steps=conf.get_int("train.lr_schedule.lr_warmup_n_steps", default=0),
        exp_gamma_after_n_steps=conf.get_float("train.lr_schedule.exp_gamma_after_n_steps", default=None),
        exp_n_steps=conf.get_float("train.lr_schedule.exp_n_steps", default=None),
        multistep_milestones=conf.get_list("train.lr_schedule.multistep_milestones", default=None),
        multistep_gamma=conf.get_float("train.lr_schedule.multistep_gamma", default=0.1),
        milestone_shift=milestone_shift,
    )
