"""Schedule/optimizer construction (ddpo_tpu/training/optim.py).

The reference hardcodes a constant LR; these pin the added schedule knobs:
warmup ramp, linear/cosine decay horizons, the required-total-steps guard,
and that both trainers' optimizer factories share this path.
"""

import numpy as np
import pytest

from ddpo_tpu.training.optim import build_lr_schedule, build_optimizer


class _Args:
    learning_rate = 1e-3
    lr_schedule = "constant"
    lr_warmup_steps = 0
    lr_total_steps = None
    beta1, beta2, epsilon, weight_decay = 0.9, 0.999, 1e-8, 1e-4
    max_grad_norm = 1.0
    optimizer = "adamw"


def _args(**kw):
    a = _Args()
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def test_constant_is_reference_default():
    sched = build_lr_schedule(_args())
    assert float(sched(0)) == float(sched(10_000)) == pytest.approx(1e-3)


def test_warmup_ramps_to_base():
    sched = build_lr_schedule(_args(lr_warmup_steps=100))
    assert float(sched(0)) == 0.0
    assert float(sched(50)) == pytest.approx(5e-4)
    assert float(sched(100)) == pytest.approx(1e-3)
    assert float(sched(10_000)) == pytest.approx(1e-3)


def test_linear_decays_to_zero():
    sched = build_lr_schedule(_args(lr_schedule="linear", lr_total_steps=200))
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(5e-4)
    assert float(sched(200)) == pytest.approx(0.0, abs=1e-12)


def test_cosine_with_warmup():
    sched = build_lr_schedule(
        _args(lr_schedule="cosine", lr_warmup_steps=50, lr_total_steps=250)
    )
    assert float(sched(0)) == 0.0
    assert float(sched(50)) == pytest.approx(1e-3)
    # midpoint of the 200-step cosine decay = base/2
    assert float(sched(150)) == pytest.approx(5e-4, rel=1e-3)
    assert float(sched(250)) == pytest.approx(0.0, abs=1e-9)


def test_decay_requires_total_steps():
    with pytest.raises(AssertionError, match="lr_total_steps"):
        build_lr_schedule(_args(lr_schedule="cosine"))


def test_build_optimizer_applies_schedule():
    import jax.numpy as jnp

    opt = build_optimizer(_args(lr_schedule="linear", lr_total_steps=2))
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    grads = {"w": jnp.ones(4)}
    updates, state = opt.update(grads, state, params)
    step0 = float(np.abs(np.asarray(updates["w"])).mean())
    updates, state = opt.update(grads, state, params)
    step1 = float(np.abs(np.asarray(updates["w"])).mean())
    assert step0 > step1 > 0  # decaying LR shrinks the update
