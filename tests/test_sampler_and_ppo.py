"""End-to-end core-slice tests: sampler trajectories + PPO training step.

These pin the invariant the whole method rests on: log-probs recorded during
sampling are exactly reproduced by the training step's score mode at the
sampling parameters (ratio == 1), and the PPO update then behaves like the
reference (pipeline/policy_gradient.py + training/policy_gradient.py).

A tiny UNet keeps this CPU-fast; the math is identical at SD scale.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ddpo_tpu.core import DDIMScheduler
from ddpo_tpu.models import UNet2DCondition, UNetConfig
from ddpo_tpu.sampling import SamplerConfig, sample_trajectories
from ddpo_tpu.training.policy_gradient import (
    AccumulatingTrainState,
    train_step,
    train_step_fused,
)

TINY = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    attention_heads=2,
    cross_attention_dim=32,
    down_block_has_attn=(True, False),
)

T_STEPS = 5
BATCH = 4


@pytest.fixture(scope="module")
def setup():
    model = UNet2DCondition(TINY)
    x = jnp.zeros((1, 4, 8, 8))
    ctx = jnp.zeros((1, 7, 32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.array([0]), ctx)["params"]

    def unet_apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    scheduler = DDIMScheduler(set_alpha_to_one=False, steps_offset=1)
    sched_state = scheduler.create_state()

    prompt_embeds = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 7, 32))
    uncond_embeds = jnp.zeros((BATCH, 7, 32))
    config = SamplerConfig(
        num_inference_steps=T_STEPS, guidance_scale=5.0, eta=1.0,
        height=64, width=64,
    )

    traj = jax.jit(
        functools.partial(
            sample_trajectories, unet_apply, scheduler=scheduler, config=config
        ),
        static_argnames=(),
    )(
        params,
        scheduler_state=sched_state,
        prompt_embeds=prompt_embeds,
        uncond_embeds=uncond_embeds,
        key=jax.random.PRNGKey(42),
    )
    return dict(
        model=model, params=params, unet_apply=unet_apply, scheduler=scheduler,
        sched_state=sched_state, prompt_embeds=prompt_embeds,
        uncond_embeds=uncond_embeds, config=config, traj=traj,
    )


def test_trajectory_shapes(setup):
    traj = setup["traj"]
    assert traj["final_latents"].shape == (BATCH, 4, 8, 8)
    assert traj["latents"].shape == (BATCH, T_STEPS, 4, 8, 8)
    assert traj["next_latents"].shape == (BATCH, T_STEPS, 4, 8, 8)
    assert traj["log_probs"].shape == (BATCH, T_STEPS)
    assert traj["ts"].shape == (BATCH, T_STEPS)
    # descending stride grid with offset 1
    np.testing.assert_array_equal(
        np.asarray(traj["ts"][0]), np.array([801, 601, 401, 201, 1])
    )


def test_trajectory_chain_consistency(setup):
    """next_latents[t] == latents[t+1]; final == next_latents[-1]."""
    traj = setup["traj"]
    np.testing.assert_allclose(
        np.asarray(traj["next_latents"][:, :-1]),
        np.asarray(traj["latents"][:, 1:]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(traj["next_latents"][:, -1]),
        np.asarray(traj["final_latents"]),
        rtol=1e-5,
    )


def _make_state(setup, accum_like=True):
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(1e-5)
    )
    return AccumulatingTrainState.create(
        apply_fn=setup["unet_apply"], params=setup["params"], tx=optimizer
    )


def _batch_at_t(setup, j):
    traj = setup["traj"]
    return {
        "latents": traj["latents"][:, j],
        "next_latents": traj["next_latents"][:, j],
        "ts": traj["ts"][:, j],
        "log_probs": traj["log_probs"][:, j],
        "advantages": jnp.ones((BATCH,)),
        "prompt_embeds": setup["prompt_embeds"],
        "uncond_embeds": setup["uncond_embeds"],
    }


def test_ratio_is_one_at_sampling_params(setup):
    """Re-scoring under the sampling parameters: KL ~ 0, clipfrac 0,
    loss == -mean(clipped advantages). The load-bearing DDPO invariant."""
    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    state = _make_state(setup)

    step = jax.jit(
        functools.partial(
            train_step,
            scheduler=scheduler,
            train_cfg=True,
            guidance_scale=5.0,
            eta=1.0,
            clip_range=1e-4,
            do_opt_update=True,
        )
    )
    for j in [0, T_STEPS - 1]:  # first and last timestep (edge cases)
        _, info = step(state, _batch_at_t(setup, j), sched_state)
        assert float(info["approx_kl"]) < 1e-8, f"t index {j}"
        assert float(info["clipfrac"]) == 0.0
        np.testing.assert_allclose(float(info["loss"]), -1.0, rtol=1e-4)


@pytest.mark.slow
def test_grad_accumulation_matches_large_batch(setup):
    """Two accumulated half-batches == one full batch update."""
    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    batch = _batch_at_t(setup, 1)
    # perturb stored log_probs so there is a real gradient
    batch = dict(batch, log_probs=batch["log_probs"] - 0.1)

    kwargs = dict(
        scheduler=scheduler, train_cfg=False, guidance_scale=5.0,
        eta=1.0, clip_range=10.0,
    )

    state_full = _make_state(setup)
    state_full, _ = train_step(
        state_full, batch, sched_state, do_opt_update=True, **kwargs
    )

    half = lambda tree, s: jax.tree_util.tree_map(lambda x: x[s], tree)
    state_acc = _make_state(setup)
    state_acc, _ = train_step(
        state_acc, half(batch, slice(0, 2)), sched_state, do_opt_update=False,
        **kwargs,
    )
    assert int(state_acc.n_acc) == 1 and int(state_acc.step) == 0
    state_acc, _ = train_step(
        state_acc, half(batch, slice(2, 4)), sched_state, do_opt_update=True,
        **kwargs,
    )
    assert int(state_acc.n_acc) == 0 and int(state_acc.step) == 1

    for a, b in zip(
        jax.tree_util.tree_leaves(state_full.params),
        jax.tree_util.tree_leaves(state_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6)


def test_fused_step_matches_sequential(setup):
    """train_step_fused over T timesteps == T accumulated train_steps."""
    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    traj = setup["traj"]

    kwargs = dict(
        scheduler=scheduler, train_cfg=False, guidance_scale=5.0,
        eta=1.0, clip_range=10.0,
    )
    shifted_lp = traj["log_probs"] - 0.05  # nonzero gradient

    # sequential: accumulate all T timesteps, update at the last
    state_seq = _make_state(setup)
    for j in range(T_STEPS):
        batch = dict(_batch_at_t(setup, j), log_probs=shifted_lp[:, j])
        state_seq, info_seq = train_step(
            state_seq, batch, sched_state,
            do_opt_update=(j == T_STEPS - 1), **kwargs,
        )

    # fused: one call with a leading timestep axis
    fused_batch = {
        "latents": jnp.moveaxis(traj["latents"], 1, 0),
        "next_latents": jnp.moveaxis(traj["next_latents"], 1, 0),
        "ts": jnp.moveaxis(traj["ts"], 1, 0),
        "log_probs": jnp.moveaxis(shifted_lp, 1, 0),
        "advantages": jnp.ones((BATCH,)),
        "prompt_embeds": setup["prompt_embeds"],
        "uncond_embeds": setup["uncond_embeds"],
    }
    state_fused = _make_state(setup)
    state_fused, info_fused = train_step_fused(
        state_fused, fused_batch, sched_state, do_opt_update=True, **kwargs
    )

    assert int(state_fused.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(state_seq.params),
        jax.tree_util.tree_leaves(state_fused.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_policy_gradient_improves_objective(setup):
    """A few PPO steps on a fixed batch should increase advantage-weighted
    log-prob (the surrogate decreases)."""
    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    state = _make_state(setup)
    optimizer = optax.adam(1e-3)
    state = AccumulatingTrainState.create(
        apply_fn=setup["unet_apply"], params=setup["params"], tx=optimizer
    )
    batch = _batch_at_t(setup, 2)

    kwargs = dict(
        scheduler=scheduler, train_cfg=False, guidance_scale=5.0,
        eta=1.0, clip_range=1e4,  # effectively unclipped
    )
    step = jax.jit(
        functools.partial(train_step, do_opt_update=True, **kwargs)
    )
    losses = []
    for _ in range(5):
        state, info = step(state, batch, sched_state)
        losses.append(float(info["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_resident_inner_epoch(setup):
    """The one-program inner epoch runs, updates n_batches times, and its
    per-minibatch info matches the semantics of the host-loop path (ratio 1
    => kl ~ 0 on-policy)."""
    from ddpo_tpu.training.policy_gradient import inner_epoch_resident

    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    traj = setup["traj"]
    state = _make_state(setup)

    samples = {
        "latents": traj["latents"],
        "next_latents": traj["next_latents"],
        "ts": traj["ts"],
        "log_probs": traj["log_probs"],
        "advantages": jnp.ones((BATCH,)),
        "embeds": setup["prompt_embeds"],
        "uncond_embeds": setup["uncond_embeds"],
    }
    run = jax.jit(
        functools.partial(
            inner_epoch_resident,
            scheduler=scheduler,
            train_batch_size=2,
            num_train_ts=T_STEPS,
            train_cfg=True,
            guidance_scale=5.0,
            eta=1.0,
            clip_range=1e-4,
        )
    )
    new_state, infos = run(state, samples, sched_state, jax.random.PRNGKey(0))
    assert int(new_state.step) == BATCH // 2  # one optimizer update per minibatch
    assert infos["loss"].shape == (BATCH // 2,)
    # on-policy: the shuffled/rebatched log-probs must still reproduce
    assert float(jnp.max(infos["approx_kl"])) < 1e-6
    np.testing.assert_allclose(np.asarray(infos["loss"]), -1.0, rtol=1e-3)


@pytest.mark.slow
def test_resident_accumulation_matches_larger_batch(setup):
    """resident(bs=2, accumulation=2) == resident(bs=4, accumulation=1):
    averaging two accumulated minibatch gradients then updating once is the
    same computation as one update over the combined batch (the shuffle and
    timestep permutations are identical under the same rng)."""
    from ddpo_tpu.training.policy_gradient import inner_epoch_resident

    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    traj = setup["traj"]
    samples = {
        "latents": traj["latents"],
        "next_latents": traj["next_latents"],
        "ts": traj["ts"],
        "log_probs": traj["log_probs"],
        "advantages": jnp.linspace(-1.0, 1.0, BATCH),
        "embeds": setup["prompt_embeds"],
        "uncond_embeds": setup["uncond_embeds"],
    }
    common = dict(
        scheduler=scheduler, num_train_ts=T_STEPS, train_cfg=True,
        guidance_scale=5.0, eta=1.0, clip_range=1e-4,
    )
    rng = jax.random.PRNGKey(3)

    run_acc = jax.jit(functools.partial(
        inner_epoch_resident, train_batch_size=2, accumulation_steps=2,
        **common,
    ))
    state_acc, infos_acc = run_acc(_make_state(setup), samples, sched_state, rng)

    run_big = jax.jit(functools.partial(
        inner_epoch_resident, train_batch_size=4, accumulation_steps=1,
        **common,
    ))
    state_big, _ = run_big(_make_state(setup), samples, sched_state, rng)

    assert int(state_acc.step) == int(state_big.step) == 1
    assert infos_acc["loss"].shape == (2,)  # per-minibatch infos preserved
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        state_acc.params, state_big.params,
    )


def test_cfg_concat_matches_two_apply(setup):
    """ppo_loss(cfg_concat=True) == ppo_loss(cfg_concat=False): the 2B
    concat apply is the same math as the reference's two B-batch applies
    (all norm/attention statistics are per-sample)."""
    from ddpo_tpu.training.policy_gradient import ppo_loss

    scheduler = setup["scheduler"]
    sched_state = scheduler.set_timesteps(setup["sched_state"], T_STEPS)
    batch = _batch_at_t(setup, 1)

    def run(concat):
        return ppo_loss(
            setup["params"], setup["unet_apply"], batch, scheduler,
            sched_state, train_cfg=True, guidance_scale=5.0, eta=1.0,
            clip_range=1e-4, cfg_concat=concat,
        )

    loss_two, info_two = run(False)
    loss_cat, info_cat = run(True)
    np.testing.assert_allclose(
        float(loss_cat), float(loss_two), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(info_cat["approx_kl"]), float(info_two["approx_kl"]),
        rtol=1e-4, atol=1e-9,
    )


def test_traced_guidance_scale_matches_static(setup):
    """The traced guidance_scale override (the calibrate sweep's no-recompile
    path) produces bit-identical trajectories to baking the same value into
    SamplerConfig."""
    s = setup
    override = jax.jit(
        functools.partial(
            sample_trajectories, s["unet_apply"], scheduler=s["scheduler"],
            config=s["config"],  # config carries guidance_scale=5.0
        )
    )(
        s["params"],
        scheduler_state=s["sched_state"],
        prompt_embeds=s["prompt_embeds"],
        uncond_embeds=s["uncond_embeds"],
        key=jax.random.PRNGKey(42),
        guidance_scale=jnp.float32(5.0),
    )
    for key in ("final_latents", "log_probs"):
        np.testing.assert_array_equal(
            np.asarray(override[key]), np.asarray(s["traj"][key])
        )

    # and a DIFFERENT scale through the same compiled program changes output
    other = jax.jit(
        functools.partial(
            sample_trajectories, s["unet_apply"], scheduler=s["scheduler"],
            config=s["config"],
        )
    )(
        s["params"],
        scheduler_state=s["sched_state"],
        prompt_embeds=s["prompt_embeds"],
        uncond_embeds=s["uncond_embeds"],
        key=jax.random.PRNGKey(42),
        guidance_scale=jnp.float32(9.0),
    )
    assert not np.allclose(
        np.asarray(other["final_latents"]), np.asarray(s["traj"]["final_latents"])
    )


def test_sample_images_matches_trajectory_sampler(setup):
    """The lean generation path (no trajectory recording) is bit-identical
    to the trainer's sampler at the same key: same math, same RNG stream,
    just no per-step stacked outputs occupying HBM."""
    from ddpo_tpu.sampling import sample_images

    s = setup
    final = jax.jit(
        functools.partial(
            sample_images,
            s["unet_apply"], scheduler=s["scheduler"], config=s["config"],
        )
    )(
        s["params"],
        scheduler_state=s["sched_state"],
        prompt_embeds=s["prompt_embeds"],
        uncond_embeds=s["uncond_embeds"],
        key=jax.random.PRNGKey(42),
    )
    np.testing.assert_array_equal(
        np.asarray(final), np.asarray(s["traj"]["final_latents"])
    )
