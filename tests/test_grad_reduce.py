"""Reduced-precision gradient all-reduce (train_step_fused grad_reduce_*).

The GSPMD default reduces gradients at the parameter dtype: fp32 masters
mean a 3.28 GB fp32 all-reduce per update at SD-1.4 scale (compile-measured,
bench_scaling_model.py). grad_reduce_dtype=bf16 runs the grad computation
inside a shard_map over 'dp', psums in bf16, and casts back — halving dp
traffic (the reference all-reduces fp32 via pmean,
/root/reference/ddpo/training/policy_gradient.py:141-142). Pins:

- fp32 shard_map reduce == GSPMD reduce (same math, different program);
- bf16 reduce matches to bf16 rounding tolerance (params AND infos);
- the pg driver runs end-to-end with --grad_reduce_dtype bfloat16 on the
  dp mesh and preserves the on-policy invariant (kl ~ 0 is computed in
  the forward, untouched by grad rounding).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from ddpo_tpu.core import DDIMScheduler
from ddpo_tpu.models import UNet2DCondition, UNetConfig
from ddpo_tpu.sampling import SamplerConfig, sample_trajectories
from ddpo_tpu.training.policy_gradient import (
    AccumulatingTrainState,
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
T_STEPS = 3
BATCH = 4


@pytest.fixture(scope="module")
def setup():
    model = UNet2DCondition(TINY)
    x = jnp.zeros((1, 4, 8, 8))
    ctx = jnp.zeros((1, 7, 32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.array([0]), ctx
    )["params"]

    def unet_apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    scheduler = DDIMScheduler(set_alpha_to_one=False, steps_offset=1)
    sched_state = scheduler.set_timesteps(scheduler.create_state(), T_STEPS)

    prompt_embeds = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 7, 32))
    uncond_embeds = jnp.zeros((BATCH, 7, 32))
    config = SamplerConfig(
        num_inference_steps=T_STEPS, guidance_scale=5.0, eta=1.0,
        height=64, width=64,
    )
    traj = jax.jit(
        functools.partial(
            sample_trajectories, unet_apply, scheduler=scheduler,
            config=config,
        )
    )(
        params,
        scheduler_state=scheduler.create_state(),
        prompt_embeds=prompt_embeds,
        uncond_embeds=uncond_embeds,
        key=jax.random.PRNGKey(42),
    )
    fused_batch = {
        "latents": jnp.moveaxis(traj["latents"], 1, 0),
        "next_latents": jnp.moveaxis(traj["next_latents"], 1, 0),
        "ts": jnp.moveaxis(traj["ts"], 1, 0),
        # shift so there is a real, nonzero gradient
        "log_probs": jnp.moveaxis(traj["log_probs"] - 0.05, 1, 0),
        "advantages": jnp.ones((BATCH,)),
        "prompt_embeds": prompt_embeds,
        "uncond_embeds": uncond_embeds,
    }
    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(4, 1, 1), ("dp", "sp", "tp")
    )
    return dict(
        unet_apply=unet_apply, params=params, scheduler=scheduler,
        sched_state=sched_state, batch=fused_batch, mesh=mesh,
    )


def _grads(setup, **grad_kwargs):
    """Run one fused step under SGD(lr=1) so p0 - p_new IS the reduced
    gradient tree — adam's first step is invariant to gradient SCALE
    (m_hat/sqrt(v_hat) cancels it), so an adam-based oracle cannot catch
    a missing /dp or a dropped shard; raw grads can. lr=100 amplifies the
    delta above fp32 cancellation noise on O(1) params; divided back out
    below."""
    state = AccumulatingTrainState.create(
        apply_fn=setup["unet_apply"],
        params=setup["params"],
        tx=optax.sgd(100.0),
    )
    state, info = jax.jit(
        functools.partial(
            train_step_fused,
            scheduler=setup["scheduler"],
            train_cfg=False,
            guidance_scale=5.0,
            eta=1.0,
            clip_range=10.0,
            do_opt_update=True,
            **grad_kwargs,
        )
    )(state, setup["batch"], setup["sched_state"])
    grads = jax.tree_util.tree_map(
        lambda p0, p1: (
            np.asarray(p0, np.float64) - np.asarray(p1, np.float64)
        ) / 100.0,
        setup["params"], state.params,
    )
    return grads, jax.tree_util.tree_map(np.asarray, info)


def _gmax(tree):
    return max(np.abs(g).max() for g in jax.tree_util.tree_leaves(tree))


def test_fp32_shardmap_reduce_matches_gspmd(setup):
    """Same dtype, different program: the shard_map dp-psum path must
    reproduce the GSPMD reduction up to summation-order noise (~1e-6
    relative on the grads). A reduction bug — missing /dp (4x), dropped
    shard (25% shift), double-count — moves every substantial leaf by
    O(1) of its own magnitude and fails the bound."""
    g_ref, info_ref = _grads(setup)
    g_sm, info_sm = _grads(
        setup,
        grad_reduce_mesh=setup["mesh"],
        grad_reduce_dtype=jnp.float32,
    )
    gmax = _gmax(g_ref)
    assert gmax > 1e-8  # a real gradient flowed
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sm)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * gmax)
    for key in info_ref:
        np.testing.assert_allclose(info_ref[key], info_sm[key], rtol=1e-5)


def test_bf16_reduce_matches_to_rounding(setup):
    """bf16-rounded grads track fp32 to bf16 precision. Per element the
    cast error is <=0.4% relative to the LOCAL shard grads, so after the
    psum the bound is relative to the leaf's magnitude (cross-shard
    cancellation can make individual global elements much smaller than
    the locals that produced them); the global norm must agree to ~1%."""
    g_ref, info_ref = _grads(setup)
    g_bf, info_bf = _grads(
        setup,
        grad_reduce_mesh=setup["mesh"],
        grad_reduce_dtype=jnp.bfloat16,
    )
    gmax = _gmax(g_ref)
    assert gmax > 1e-8
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_bf)
    ):
        leaf_scale = max(np.abs(a).max(), 1e-3 * gmax)
        diff = np.abs(a - b).max()
        assert diff <= 0.02 * leaf_scale, (leaf_scale, diff)
    norm_ref = np.sqrt(sum(
        (g**2).sum() for g in jax.tree_util.tree_leaves(g_ref)
    ))
    norm_bf = np.sqrt(sum(
        (g**2).sum() for g in jax.tree_util.tree_leaves(g_bf)
    ))
    assert abs(norm_ref - norm_bf) <= 0.01 * norm_ref, (norm_ref, norm_bf)
    # forward-pass stats are grad-independent
    for key in ("approx_kl", "clipfrac", "loss"):
        np.testing.assert_allclose(
            info_ref[key], info_bf[key], rtol=1e-4, atol=1e-8
        )


def test_policy_gradient_driver_grad_reduce_bf16(tmp_path, monkeypatch):
    """--grad_reduce_dtype bfloat16 end-to-end through the pg driver."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DDPO_BUCKET", "bucket")
    import importlib

    import ddpo_tpu.config.base as base
    import ddpo_tpu.config.user as user

    importlib.reload(user)
    importlib.reload(base)
    from ddpo_tpu.pipelines import policy_gradient

    rewards = policy_gradient.main(
        ["--dataset", "debug-animals", "--n_inference_steps", "2",
         "--resolution", "32", "--num_train_epochs", "1",
         "--sample_batch_size", "1", "--train_batch_size", "1",
         "--save_freq", "1000", "--grad_reduce_dtype", "bfloat16"]
    )
    assert len(rewards) == 1 and np.isfinite(rewards[0])

    logdir = (
        tmp_path / "logs" / "bucket" / "logs" / "debug-animals"
        / "models" / "pg"
    )
    infos = [
        np.load(f, allow_pickle=True).item()
        for f in sorted((logdir / "train_info").iterdir())
    ]
    kl = float(np.mean([i["approx_kl"].mean() for i in infos]))
    assert kl < 1e-6, f"grad_reduce broke the on-policy invariant: kl={kl}"
