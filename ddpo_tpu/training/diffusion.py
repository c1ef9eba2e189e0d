"""RWR: weighted/filtered supervised finetuning on sampled data.

Re-implements the reference's diffusion train step
(/root/reference/ddpo/training/diffusion.py:6-102):

  - batch["vae"] holds the stored VAE posterior moments (channel-last,
    (B, h, w, 8)); sample the posterior, transpose to NCHW, scale 0.18215
    (ref :19-23),
  - draw a uniform random timestep per sample, add forward-process noise
    (ref :26-44),
  - text-encode inside the step (ref :47-51), optional CFG recombination at
    train time (ref :62-79),
  - epsilon-MSE loss, optionally weighted per sample (softmax RWR weights,
    ref :83-91).

No pmean: jit with the batch sharded over 'dp'. The weighted branch sums
(weights are normalized to an expected batch sum of 1 by the caller, see
pipeline/finetune.py:172-179 in the reference).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax.training.train_state import TrainState

from ddpo_tpu.core.scheduler import DDIMState, DDPMScheduler
from ddpo_tpu.models.vae import DiagonalGaussian


def train_step(
    state: TrainState,
    text_encoder_apply: Callable,
    text_encoder_params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    scheduler_state: DDIMState,
    scheduler: DDPMScheduler,
    train_cfg: bool,
    guidance_scale: float,
    weights: Optional[jnp.ndarray] = None,
    scaling_factor: float = 0.18215,
    cfg_concat: bool = False,
    frozen: Any = None,
) -> Tuple[TrainState, jnp.ndarray, jax.Array]:
    """One supervised finetune step. Jit with scheduler/train_cfg static.

    cfg_concat runs the CFG recombination as one 2B-batch UNet apply
    instead of the reference's two B-batch applies (identical math — see
    ddpo_tpu/training/policy_gradient.ppo_loss; 1.29x for the bf16 PPO
    step on v5e, same structure here).

    ``frozen``: optional non-trainable tree (LoRA base UNet) forwarded as
    ``state.apply_fn(frozen, params, ...)`` — a runtime argument, because a
    closure over concrete device arrays embeds ~1.7GB of bf16 HLO constants
    at SD scale (see policy_gradient._bind_frozen).
    """
    from ddpo_tpu.training.policy_gradient import _bind_frozen

    apply_fn = _bind_frozen(state.apply_fn, frozen)
    sample_rng, noise_rng, timestep_rng, new_rng = jax.random.split(rng, 4)

    def compute_loss(params):
        # stored channel-last moments -> latents (NCHW), SD scaling
        latents = DiagonalGaussian(batch["vae"], axis=-1).sample(sample_rng)
        latents = jnp.transpose(latents, (0, 3, 1, 2)) * scaling_factor

        noise = jax.random.normal(noise_rng, latents.shape)
        bsz = latents.shape[0]
        timesteps = jax.random.randint(
            timestep_rng, (bsz,), 0, scheduler.num_train_timesteps
        )
        noisy = scheduler.add_noise(scheduler_state, latents, noise, timesteps)

        context = text_encoder_apply(text_encoder_params, batch["input_ids"])

        if train_cfg and cfg_concat:
            uncond_context = text_encoder_apply(
                text_encoder_params, batch["uncond_text"]
            )
            eps = apply_fn(
                params,
                jnp.concatenate([noisy, noisy]),
                jnp.concatenate([timesteps, timesteps]),
                jnp.concatenate([uncond_context, context]),
            )
            eps_uncond, eps_text = jnp.split(eps, 2)
            noise_pred = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        elif train_cfg:
            eps_text = apply_fn(params, noisy, timesteps, context)
            uncond_context = text_encoder_apply(
                text_encoder_params, batch["uncond_text"]
            )
            eps_uncond = apply_fn(params, noisy, timesteps, uncond_context)
            noise_pred = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        else:
            noise_pred = apply_fn(params, noisy, timesteps, context)

        loss = ((noise - noise_pred) ** 2).mean(
            axis=tuple(range(1, noise.ndim))
        )
        if weights is None:
            return loss.mean()
        return (loss * weights).sum()

    loss, grads = jax.value_and_grad(compute_loss)(state.params)
    new_state = state.apply_gradients(grads=grads)
    return new_state, loss, new_rng
