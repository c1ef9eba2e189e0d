"""Optimizer/schedule construction shared by the PG and RWR trainers.

The reference hardcodes a constant learning rate into adamw/adafactor
(pipeline/policy_gradient.py:130-150, pipeline/finetune.py:95-109). This
module keeps that default and adds standard production schedules (linear
warmup + constant/linear/cosine decay) behind config knobs:

    lr_schedule: "constant" | "linear" | "cosine"
    lr_warmup_steps: int (0 disables warmup)
    lr_total_steps: horizon for the decaying schedules; REQUIRED for
        linear/cosine (there is no safe default: the PG step count depends
        on epochs x batches x timesteps x accumulation).

Schedules are per OPTIMIZER step (after gradient accumulation), matching
optax semantics — `state.step` only advances when the update fires.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def build_lr_schedule(args) -> optax.Schedule:
    kind = getattr(args, "lr_schedule", "constant") or "constant"
    base = args.learning_rate
    warmup = int(getattr(args, "lr_warmup_steps", 0) or 0)
    total = getattr(args, "lr_total_steps", None)

    if kind == "constant":
        sched = optax.constant_schedule(base)
        if warmup:
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0, base, warmup), sched], [warmup]
            )
        return sched

    assert total is not None, (
        f"lr_schedule={kind!r} needs --lr_total_steps (the decay horizon in "
        "optimizer steps; it cannot be inferred safely)"
    )
    decay = int(total) - warmup
    assert decay > 0, f"lr_total_steps {total} <= lr_warmup_steps {warmup}"
    if kind == "linear":
        main = optax.linear_schedule(base, 0.0, decay)
    elif kind == "cosine":
        main = optax.cosine_decay_schedule(base, decay)
    else:
        raise ValueError(f"unknown lr_schedule {kind!r}")
    if warmup:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base, warmup), main], [warmup]
        )
    return main


def build_optimizer(args) -> optax.GradientTransformation:
    """Global-norm clip + adamw (bf16 mu) | adafactor, on the schedule."""
    schedule = build_lr_schedule(args)
    optim = {
        "adamw": lambda: optax.adamw(
            learning_rate=schedule, b1=args.beta1, b2=args.beta2,
            eps=args.epsilon, weight_decay=args.weight_decay,
            mu_dtype=jnp.bfloat16,
        ),
        "adafactor": lambda: optax.adafactor(
            learning_rate=schedule, weight_decay_rate=args.weight_decay
        ),
    }[getattr(args, "optimizer", "adamw")]()
    return optax.chain(optax.clip_by_global_norm(args.max_grad_norm), optim)
