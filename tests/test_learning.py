"""The PPO machinery optimizes a reward end-to-end (Gaussian-bandit policy).

Isolates the full learning path — scheduler sample mode -> stored log-probs
-> score mode under updated params -> clipped surrogate -> gradient ->
optimizer — with a policy whose only parameter is a constant eps prediction.
The DDIM posterior mean is an affine function of eps, so PPO must steer the
mean of p(x_{t-1} | x_t) onto a target value. This is the smallest system
where "does DDPO actually learn?" has a crisp, high-SNR answer (full-UNet
random-init testbeds are chaotic / dimension-noise-limited; real learning
curves need real SD weights — see ROADMAP.md).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddpo_tpu.core import DDIMScheduler
from ddpo_tpu.training.policy_gradient import AccumulatingTrainState, train_step


def test_ppo_bandit_converges_to_target():
    sched = DDIMScheduler(set_alpha_to_one=False, steps_offset=1)
    state_s = sched.set_timesteps(sched.create_state(), 2)  # grid [501, 1]
    t_used = 501
    batch_size = 256
    x_t = jnp.ones((batch_size, 1, 1, 1)) * 0.5
    target = 2.0

    def apply_fn(params, latents, t, context):
        return jnp.broadcast_to(params["theta"], latents.shape)

    state = AccumulatingTrainState.create(
        apply_fn=apply_fn,
        params={"theta": jnp.zeros((1, 1, 1, 1))},
        tx=optax.adam(0.05),
    )
    step = jax.jit(
        functools.partial(
            train_step, scheduler=sched, train_cfg=False, guidance_scale=1.0,
            eta=1.0, clip_range=0.2, do_opt_update=True,
        )
    )

    rng = jax.random.PRNGKey(0)
    first_reward = None
    for epoch in range(60):
        rng, key = jax.random.split(rng)
        eps = apply_fn(state.params, x_t, None, None)
        prev, logp = sched.step(
            state_s, eps, jnp.full((batch_size,), t_used), x_t, key=key, eta=1.0
        )
        rewards = -jnp.mean((prev - target) ** 2, axis=(1, 2, 3))
        if first_reward is None:
            first_reward = float(rewards.mean())
        advantages = (rewards - rewards.mean()) / (rewards.std() + 1e-8)
        batch = {
            "latents": x_t,
            "next_latents": prev,
            "ts": jnp.full((batch_size,), t_used),
            "log_probs": logp,
            "advantages": advantages,
            "prompt_embeds": jnp.zeros((batch_size, 1, 1)),
            "uncond_embeds": jnp.zeros((batch_size, 1, 1)),
        }
        state, info = step(state, batch, state_s)
        assert np.isfinite(float(info["loss"]))

    mean, _ = sched.step_mean_std(
        state_s, apply_fn(state.params, x_t, None, None),
        jnp.full((batch_size,), t_used), x_t, 1.0,
    )
    final_mean = float(mean.mean())
    assert first_reward < -1.0  # started far from the target
    assert abs(final_mean - target) < 0.15, final_mean
    assert float(rewards.mean()) > -0.05, float(rewards.mean())
