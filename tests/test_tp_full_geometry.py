"""Tensor parallelism at real SD-1.4 attention/GroupNorm geometry.

Round-1 tp validation used a 32-channel toy; this exercises the actual
constraints that make SD-1.4 hard to shard: head_dim 40 (8 heads at C=320,
not divisible by 128 lanes), 32-group GroupNorm at every width, GEGLU
split-in-half MLPs, and cross-attention K/V at 768. tp=2 must match tp=1
numerically for forward AND a full PPO train step, and the
``place_train_state`` helper must give optimizer moments the same sharding
as their parameters.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ddpo_tpu.core import DDIMScheduler
from ddpo_tpu.models import UNet2DCondition, UNetConfig
from ddpo_tpu.parallel import MeshConfig, batch_sharding, create_mesh, replicated
from ddpo_tpu.parallel.sharding import param_specs, place_train_state
from ddpo_tpu.training.policy_gradient import AccumulatingTrainState, train_step
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def sd_geometry_setup():
    """UNet with SD-1.4 head geometry (heads=8 -> D=40 at C=320, D=80 at
    C=640), 32-group GroupNorm, 768-dim cross-attention; shrunk to one layer
    per block and 8x8 latents so the CPU mesh can run it."""
    config = UNetConfig(
        sample_size=8,
        block_out_channels=(320, 640),
        layers_per_block=1,
        attention_heads=8,
        cross_attention_dim=768,
        down_block_has_attn=(True, True),
    )
    model = UNet2DCondition(config)
    latents = jnp.zeros((4, 4, 8, 8))
    ts = jnp.zeros((4,), jnp.int32)
    ctx = jnp.zeros((4, 77, 768))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), latents, ts, ctx)["params"]

    def unet_apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    return model, params, unet_apply


@pytest.mark.slow
def test_tp2_forward_matches_tp1_at_sd_geometry(sd_geometry_setup):
    model, params, unet_apply = sd_geometry_setup
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 4, 8, 8))
    t = jnp.full((4,), 601)
    ctx = jax.random.normal(jax.random.PRNGKey(8), (4, 77, 768))

    ref = unet_apply(params, x, t, ctx)

    specs = param_specs(params)
    sharded_specs = [
        s for s in jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))
        if s != P()
    ]
    # every attention and GEGLU projection at every level must be sharded
    assert len(sharded_specs) >= 4 * 3 * 2 + 2 * 3  # q/k/v/out x blocks + ff

    mesh = create_mesh(MeshConfig(dp=4, tp=2))
    from ddpo_tpu.parallel.sharding import shard_params

    out = jax.jit(unet_apply)(
        shard_params(mesh, params),
        jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(t, batch_sharding(mesh)),
        jax.device_put(ctx, batch_sharding(mesh)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_tp2_train_step_matches_tp1_at_sd_geometry(sd_geometry_setup):
    model, params, unet_apply = sd_geometry_setup
    scheduler = DDIMScheduler()
    sched_state = scheduler.set_timesteps(scheduler.create_state(), 5)

    rs = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rs.randn(4, 4, 8, 8), jnp.float32),
        "next_latents": jnp.asarray(rs.randn(4, 4, 8, 8), jnp.float32),
        "ts": jnp.full((4,), 601, jnp.int32),
        "log_probs": jnp.zeros((4,)),
        "advantages": jnp.ones((4,)),
        "prompt_embeds": jnp.asarray(rs.randn(4, 77, 768), jnp.float32),
        "uncond_embeds": jnp.zeros((4, 77, 768)),
    }
    step_kwargs = dict(
        scheduler=scheduler, train_cfg=False, guidance_scale=5.0, eta=1.0,
        clip_range=1e-4, do_opt_update=True,
    )

    def make_state():
        return AccumulatingTrainState.create(
            apply_fn=unet_apply, params=params,
            tx=optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4)),
        )

    state0, info0 = train_step(make_state(), batch, sched_state, **step_kwargs)

    mesh = create_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    state_in = place_train_state(mesh, make_state())
    # optimizer moments must shard exactly like their params
    q_kernel_spec = (
        state_in.params["down_blocks_0"]["attentions_0"]
        ["transformer_blocks_0"]["attn1"]["to_q"]["kernel"].sharding.spec
    )
    assert q_kernel_spec == P(None, "tp")
    mu = state_in.opt_state[1][0].mu
    mu_spec = (
        mu["down_blocks_0"]["attentions_0"]["transformer_blocks_0"]
        ["attn1"]["to_q"]["kernel"].sharding.spec
    )
    assert mu_spec == P(None, "tp")

    step = jax.jit(functools.partial(train_step, **step_kwargs))
    state1, info1 = step(
        state_in,
        {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch.items()},
        jax.device_put(sched_state, replicated(mesh)),
    )
    np.testing.assert_allclose(
        float(info0["loss"]), float(info1["loss"]), rtol=1e-5, err_msg="tp=2 loss"
    )
    got = jax.device_get(
        state1.params["down_blocks_0"]["resnets_0"]["conv1"]["kernel"]
    )
    want = jax.device_get(
        state0.params["down_blocks_0"]["resnets_0"]["conv1"]["kernel"]
    )
    # tolerance: sharded reductions reassociate fp adds
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
