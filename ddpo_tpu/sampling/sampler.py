"""Trajectory-recording DDIM sampler: one fused lax.scan on device.

Rebuilds the reference's patched Stable Diffusion pipeline
(/root/reference/ddpo/diffusers_patch/pipeline_flax_stable_diffusion.py:
163-270): classifier-free guidance via a concatenated 2B batch, a scan over
denoising steps whose carry is (latents, rng), and per-step outputs
(latents, next_latents, log_probs, ts) — the full on-policy trajectory the
PPO trainer consumes.

TPU-first differences:
  - plain jit-able function over a mesh (callers shard the batch dim over
    'dp' with NamedSharding) instead of pmap with per-device leading axes.
  - trajectories stay device-resident; the driver only pulls images (for the
    host-side reward models) off the device.
  - UNet activations run in bfloat16; scheduler math stays float32.

Returns a dict rather than a tuple so downstream rebatching can tree_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ddpo_tpu.core.scheduler import DDIMScheduler, DDIMState


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_inference_steps: int = 50
    guidance_scale: float = 5.0
    eta: float = 1.0
    height: int = 512
    width: int = 512
    vae_scale_factor: int = 8
    latent_channels: int = 4


def sample_trajectories(
    unet_apply: Callable,
    unet_params: Any,
    scheduler: DDIMScheduler,
    scheduler_state: DDIMState,
    prompt_embeds: jnp.ndarray,  # (B, 77, D)
    uncond_embeds: jnp.ndarray,  # (B, 77, D)
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    init_latents: Optional[jnp.ndarray] = None,
    guidance_scale: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Run the full denoising chain, recording the policy trajectory.

    unet_apply(params, latents_2B, timesteps_2B, context_2B) -> eps_2B.

    ``guidance_scale``, when given, overrides config.guidance_scale as a
    TRACED scalar: sweeping scales (pipelines/calibrate.py) reuses one
    compiled program instead of recompiling the 50-step scan per value.
    """
    cfg = config
    scale = cfg.guidance_scale if guidance_scale is None else guidance_scale
    batch = prompt_embeds.shape[0]
    latent_h = cfg.height // cfg.vae_scale_factor
    latent_w = cfg.width // cfg.vae_scale_factor

    state = scheduler.set_timesteps(scheduler_state, cfg.num_inference_steps)
    timesteps = state.timesteps  # (T,) descending

    # CFG context built once: [uncond; cond] along batch
    context = jnp.concatenate([uncond_embeds, prompt_embeds], axis=0)

    if init_latents is None:
        key, init_key = jax.random.split(key)
        init_latents = jax.random.normal(
            init_key,
            (batch, cfg.latent_channels, latent_h, latent_w),
            dtype=jnp.float32,
        )
    latents = init_latents * state.init_noise_sigma

    def loop_body(carry, t):
        old_latents, rng = carry
        latents_input = jnp.concatenate([old_latents] * 2)
        t_batch = jnp.broadcast_to(t, (latents_input.shape[0],))

        noise_pred = unet_apply(unet_params, latents_input, t_batch, context)
        eps_uncond, eps_text = jnp.split(noise_pred, 2, axis=0)
        noise_pred = eps_uncond + scale * (eps_text - eps_uncond)

        rng, step_key = jax.random.split(rng)
        new_latents, log_prob = scheduler.step(
            state, noise_pred, t, old_latents, key=step_key, eta=cfg.eta
        )
        return (new_latents, rng), (old_latents, new_latents, log_prob)

    (final_latents, _), (lat, next_lat, log_probs) = jax.lax.scan(
        loop_body, (latents, key), timesteps
    )

    # time-major -> batch-major
    return {
        "final_latents": final_latents,  # (B, 4, h, w)
        "latents": jnp.moveaxis(lat, 0, 1),  # (B, T, 4, h, w)
        "next_latents": jnp.moveaxis(next_lat, 0, 1),
        "log_probs": jnp.moveaxis(log_probs, 0, 1),  # (B, T)
        "ts": jnp.broadcast_to(timesteps, (batch, cfg.num_inference_steps)),
    }


def sample_images(
    unet_apply: Callable,
    unet_params: Any,
    scheduler: DDIMScheduler,
    scheduler_state: DDIMState,
    prompt_embeds: jnp.ndarray,
    uncond_embeds: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    guidance_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Generation-only denoising: final latents, NO trajectory recording.

    Identical math and RNG stream to sample_trajectories (bit-equal final
    latents at the same key — pinned by test), but the scan carries only
    (latents, rng) and stacks nothing: the (B, T, 4, h, w) x2 trajectory
    tensors (SURVEY.md section 7 "memory geometry" hard part) never exist,
    so inference serving at large batch is not HBM-bound on bookkeeping
    the trainer needs and the sampler-as-a-policy records.
    """
    # (calling sample_trajectories and dropping outputs would not help:
    # the stacked tensors are returned from the compiled program, so XLA
    # cannot dead-code-eliminate them)
    cfg = config
    scale = cfg.guidance_scale if guidance_scale is None else guidance_scale
    batch = prompt_embeds.shape[0]
    latent_h = cfg.height // cfg.vae_scale_factor
    latent_w = cfg.width // cfg.vae_scale_factor

    state = scheduler.set_timesteps(scheduler_state, cfg.num_inference_steps)
    context = jnp.concatenate([uncond_embeds, prompt_embeds], axis=0)

    key, init_key = jax.random.split(key)
    init_latents = jax.random.normal(
        init_key,
        (batch, cfg.latent_channels, latent_h, latent_w),
        dtype=jnp.float32,
    )
    latents = init_latents * state.init_noise_sigma

    def loop_body(carry, t):
        old_latents, rng = carry
        latents_input = jnp.concatenate([old_latents] * 2)
        t_batch = jnp.broadcast_to(t, (latents_input.shape[0],))
        noise_pred = unet_apply(unet_params, latents_input, t_batch, context)
        eps_uncond, eps_text = jnp.split(noise_pred, 2, axis=0)
        noise_pred = eps_uncond + scale * (eps_text - eps_uncond)
        rng, step_key = jax.random.split(rng)
        new_latents, _ = scheduler.step(
            state, noise_pred, t, old_latents, key=step_key, eta=cfg.eta
        )
        return (new_latents, rng), None

    (final_latents, _), _ = jax.lax.scan(
        loop_body, (latents, key), state.timesteps
    )
    return final_latents


def sample_images_ode(
    unet_apply: Callable,
    unet_params: Any,
    scheduler,  # core.scheduler.DPMSolverPlusPlus
    scheduler_state,
    prompt_embeds: jnp.ndarray,
    uncond_embeds: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    guidance_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic few-step generation via DPM-Solver++(2M).

    Same CFG batching / init-noise RNG stream as sample_images, but the
    scan carries the multistep solver state (latents, previous x0 estimate)
    and runs ``num_inference_steps`` model calls of a second-order ODE
    solver. Measured on v5e at 512px/bs8 (bench_dpm.py, round 4): 20-step
    DPM++ is 2.38x the 50-step DDIM throughput (2.74 vs 1.15 img/s/chip)
    and lands CLOSER to the DDIM-50 probability-flow endpoint than a
    same-cost DDIM-20 cut (rel latent err 0.138 vs 0.178 at matched seed).
    Training keeps the stochastic DDIM policy (the PPO log-probs need it);
    this path serves pipelines/generate.py. config.eta is ignored (the
    solver is the eta=0 probability-flow ODE).
    """
    cfg = config
    scale = cfg.guidance_scale if guidance_scale is None else guidance_scale
    batch = prompt_embeds.shape[0]
    latent_h = cfg.height // cfg.vae_scale_factor
    latent_w = cfg.width // cfg.vae_scale_factor

    state = scheduler.set_timesteps(scheduler_state, cfg.num_inference_steps)
    context = jnp.concatenate([uncond_embeds, prompt_embeds], axis=0)

    key, init_key = jax.random.split(key)
    latents = (
        jax.random.normal(
            init_key,
            (batch, cfg.latent_channels, latent_h, latent_w),
            dtype=jnp.float32,
        )
        * state.init_noise_sigma
    )

    def loop_body(carry, i):
        old_latents, prev_x0 = carry
        t = state.timesteps[i]
        latents_input = jnp.concatenate([old_latents] * 2)
        t_batch = jnp.broadcast_to(t, (latents_input.shape[0],))
        noise_pred = unet_apply(unet_params, latents_input, t_batch, context)
        eps_uncond, eps_text = jnp.split(noise_pred, 2, axis=0)
        noise_pred = eps_uncond + scale * (eps_text - eps_uncond)
        new_latents, x0 = scheduler.step(state, noise_pred, i, old_latents, prev_x0)
        return (new_latents, x0), None

    (final_latents, _), _ = jax.lax.scan(
        loop_body,
        (latents, jnp.zeros_like(latents)),
        jnp.arange(cfg.num_inference_steps),
    )
    return final_latents


def vae_decode(vae_model, vae_params, latents: jnp.ndarray, scaling_factor: float = 0.18215):
    """Latents (B, 4, h, w) -> images (B, H, W, 3) in [0, 1].

    Mirrors the reference's pmapped vae_decode
    (pipeline/policy_gradient.py:174-182): unscale, decode, [0,1]-clip, NHWC.
    """
    latents = latents / scaling_factor
    images = vae_model.apply({"params": vae_params}, latents, method=vae_model.decode)
    return jnp.clip(images / 2 + 0.5, 0.0, 1.0).transpose(0, 2, 3, 1)


def sample_trajectories_sharded(
    mesh,
    unet_apply: Callable,
    unet_params: Any,
    scheduler: DDIMScheduler,
    scheduler_state: DDIMState,
    prompt_embeds: jnp.ndarray,
    uncond_embeds: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    guidance_scale: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Data-parallel sampler via shard_map over the mesh's 'dp' axis.

    Each dp shard runs the full scan on its local batch slice — the exact
    semantics of the reference's pmap'd _p_generate (pipeline_flax_stable_
    diffusion.py:372-401), with the RNG key folded with the shard index so
    shards draw independent noise (the reference passes per-device keys).

    This is the multi-chip path of choice: Pallas kernels inside see local
    shards directly (GSPMD cannot automatically partition pallas_call), and
    no collectives are needed — sampling is embarrassingly batch-parallel.
    Requires replicated params (tp=1).
    """
    from jax.sharding import PartitionSpec as P

    from ddpo_tpu.parallel.mesh import shard_map_compat

    def local_sample(params, sched_state, local_prompts, local_uncond, key, scale):
        local_key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return sample_trajectories(
            unet_apply, params, scheduler, sched_state,
            local_prompts, local_uncond, local_key, config,
            guidance_scale=scale,
        )

    sharded = shard_map_compat(
        local_sample,
        mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P(), P()),
        out_specs=P("dp"),
    )
    if guidance_scale is None:
        guidance_scale = jnp.float32(config.guidance_scale)
    return sharded(
        unet_params, scheduler_state, prompt_embeds, uncond_embeds, key,
        jnp.asarray(guidance_scale, jnp.float32),
    )


def sample_images_sharded(
    mesh,
    unet_apply: Callable,
    unet_params: Any,
    scheduler,
    scheduler_state,
    prompt_embeds: jnp.ndarray,
    uncond_embeds: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig = SamplerConfig(),
    guidance_scale: Optional[jnp.ndarray] = None,
    sample_fn: Callable = sample_images,
) -> jnp.ndarray:
    """Data-parallel trajectory-free sampling via shard_map over 'dp'.

    The image-only twin of sample_trajectories_sharded, for collectors that
    never consume the denoising chain (RWR data collection keeps only the
    decoded images + rewards — reference pipeline/sample.py:106-126 stores
    no trajectories either). ``sample_fn`` picks the integrator:
    sample_images (stochastic DDIM) or sample_images_ode (DPM-Solver++(2M),
    measured 2.38x DDIM-50 throughput at matched-seed endpoint quality —
    bench_dpm.py). Communication-free like all dp sampling here: each shard
    scans its local batch slice with an index-folded key.
    """
    from jax.sharding import PartitionSpec as P

    from ddpo_tpu.parallel.mesh import shard_map_compat

    def local_sample(params, sched_state, local_prompts, local_uncond, key, scale):
        local_key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return sample_fn(
            unet_apply, params, scheduler, sched_state,
            local_prompts, local_uncond, local_key, config,
            guidance_scale=scale,
        )

    sharded = shard_map_compat(
        local_sample,
        mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P(), P()),
        out_specs=P("dp"),
    )
    if guidance_scale is None:
        guidance_scale = jnp.float32(config.guidance_scale)
    return sharded(
        unet_params, scheduler_state, prompt_embeds, uncond_embeds, key,
        jnp.asarray(guidance_scale, jnp.float32),
    )
