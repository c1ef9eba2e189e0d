"""Guidance-scale calibration sweep: reward vs CFG scale, argmax to metadata.

The reference CONSUMES a calibrated guidance scale but never produces one
in-repo: ``pipeline/sample.py:48-49`` resolves ``--guidance_scale auto`` by
reading ``metadata.json`` from the model dir (``load_guidance_scale``,
``ddpo/utils/serialization.py:431-436``) and ``plot_calibration``
(:402-428) renders a reward-vs-scale curve — the sweep that writes these
lived outside the repo. This driver completes the loop:

  for each scale in the sweep:
      sample n_eval_batches batches (SAME prompts + SAME noise across
      scales — a paired comparison, so reward differences are pure
      guidance effect, not prompt/noise variance)
      score them with the dataset's filter_field reward
  write calibration.json ({scale: mean/std/sem}), calibration.png
  (plot_calibration), and metadata.json {"guidance_scale": argmax} into
  the model dir, where `sample --guidance_scale auto` finds it.

TPU notes: the guidance scale rides through the jitted sampler as a TRACED
scalar (sampling/sampler.py), so the whole sweep reuses ONE compiled
50-step scan — no per-scale recompilation.

Run: python -m ddpo_tpu.pipelines.calibrate --dataset compressed-animals \
         --guidance_scales "[1,2,3,5,8,12]"
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ddpo_tpu import training
from ddpo_tpu.models.tokenizer import make_uncond_ids
from ddpo_tpu.parallel import MeshConfig, batch_sharding, create_mesh, replicated, shard_batch
from ddpo_tpu.parallel.mesh import maybe_initialize_distributed
from ddpo_tpu.sampling import SamplerConfig, sample_trajectories, vae_decode
from ddpo_tpu.utils import Timer, fs
from ddpo_tpu.utils.images import plot_calibration
from ddpo_tpu.utils.metrics import MetricsLogger
from ddpo_tpu.utils.parser import Parser as BaseParser
from ddpo_tpu.utils.serialization import load_unet

DEFAULT_SCALES = [1.0, 2.0, 3.0, 5.0, 8.0, 12.0]


class Parser(BaseParser):
    config: str = "ddpo_tpu.config.base"
    dataset: str = "compressed_animals"


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def main(argv=None):
    maybe_initialize_distributed()
    # clear any attention-sharding context left by a previous driver
    # main() in this process (e.g. a tp/sp policy-gradient run in the
    # test suite) before any model trace
    from ddpo_tpu.ops import set_attention_sharding as _reset_attn

    _reset_attn(None)
    args = Parser().parse_args("calibrate", argv)
    mesh = create_mesh(MeshConfig(tp=1))
    dp = mesh.shape["dp"]
    batch_size = args.n_samples_per_device * dp
    scales = [float(s) for s in (args.guidance_scales or DEFAULT_SCALES)]
    print(f"[ calibrate ] mesh dp={dp} | batch {batch_size} | scales {scales}")

    loadpath = None if args.iteration == 0 else args.loadpath
    models, params = load_unet(
        loadpath,
        epoch=args.load_epoch,
        pretrained_model=args.pretrained_model,
        activation_dtype=_dtype(getattr(args, "dtype", "bfloat16")),
        cache=args.cache,
        seed=args.seed,
        model_preset=getattr(args, "model_preset", "sd14"),
    )
    scheduler = models.scheduler
    sched_state = jax.device_put(scheduler.create_state(), replicated(mesh))
    act_dtype = _dtype(getattr(args, "dtype", "bfloat16"))
    unet_params = jax.device_put(
        jax.tree_util.tree_map(lambda x: x.astype(act_dtype), params["unet"]),
        replicated(mesh),
    )
    vae_params = jax.device_put(params["vae"], replicated(mesh))
    text_params = jax.device_put(params["text_encoder"], replicated(mesh))

    def unet_apply(p, latents, t, context):
        return models.unet.apply({"params": p}, latents, t, context)

    vae_scale = 2 ** (len(models.vae.config.block_out_channels) - 1)
    sampler_config = SamplerConfig(
        num_inference_steps=args.n_inference_steps,
        eta=args.eta,
        height=args.resolution,
        width=args.resolution,
        vae_scale_factor=vae_scale,
        latent_channels=models.vae.config.latent_channels,
    )
    if dp > 1:
        from ddpo_tpu.sampling.sampler import sample_trajectories_sharded

        sample_fn = jax.jit(
            lambda params, scheduler_state, prompt_embeds, uncond_embeds, key,
            guidance_scale: sample_trajectories_sharded(
                mesh, unet_apply, params, scheduler, scheduler_state,
                prompt_embeds, uncond_embeds, key, sampler_config,
                guidance_scale=guidance_scale,
            )
        )
    else:
        sample_fn = jax.jit(
            functools.partial(
                sample_trajectories, unet_apply, scheduler=scheduler,
                config=sampler_config,
            )
        )
    decode_fn = jax.jit(functools.partial(vae_decode, models.vae))
    _text_encode = jax.jit(
        lambda p, ids: models.text_encoder.apply({"params": p}, ids)
    )

    callback_fns = {
        args.filter_field: training.callback_fns[args.filter_field](
            vae=models.vae, vae_params=vae_params, cache=args.cache
        )
    }

    uncond_ids = make_uncond_ids(models.tokenizer, batch_size)
    uncond_embeds = shard_batch(
        mesh, jnp.asarray(_text_encode(text_params, jnp.asarray(uncond_ids)))
    )

    from ddpo_tpu.utils.metrics import run_dir

    metrics = MetricsLogger(run_dir(args.savepath), enabled=jax.process_index() == 0)

    rng = jax.random.PRNGKey(args.seed or 0)
    timer = Timer()
    per_scale = {scale: [] for scale in scales}
    for batch_idx in range(args.n_eval_batches):
        # one prompt draw + one noise key per batch, shared by EVERY scale
        rng, seed = jax.random.split(rng)
        inference_prompts, training_prompts, prompt_metadata = training.make_prompts(
            args.prompt_fn, batch_size, args.identical_batch,
            evaluate=args.evaluate, **args.prompt_kwargs,
        )
        prompt_ids = models.tokenizer(inference_prompts)
        prompt_embeds = jax.device_put(
            _text_encode(text_params, jnp.asarray(prompt_ids)),
            batch_sharding(mesh),
        )

        for scale in scales:
            traj = sample_fn(
                unet_params,
                scheduler_state=sched_state,
                prompt_embeds=prompt_embeds,
                uncond_embeds=uncond_embeds,
                key=seed,
                guidance_scale=jnp.float32(scale),
            )
            images = np.asarray(
                jax.device_get(decode_fn(vae_params, traj["final_latents"]))
            ).astype(np.float32)
            infos = training.evaluate_callbacks(
                callback_fns, images, training_prompts, prompt_metadata
            )
            rewards = np.asarray(infos[args.filter_field][0], dtype=np.float64)
            per_scale[scale].append(rewards)
            print(
                f"[ calibrate ] batch {batch_idx} scale {scale:g}: "
                f"reward {rewards.mean():.4f} ({timer():.2f}s)"
            )

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        per_scale = {
            s: [
                np.asarray(multihost_utils.process_allgather(r, tiled=True))
                for r in rs
            ]
            for s, rs in per_scale.items()
        }

    curve = {}
    for scale, reward_batches in per_scale.items():
        rewards = np.concatenate(reward_batches)
        curve[scale] = {
            "mean": float(rewards.mean()),
            "std": float(rewards.std()),
            "sem": float(rewards.std() / np.sqrt(len(rewards))),
            "n": int(len(rewards)),
        }
    best = max(curve, key=lambda s: curve[s]["mean"])
    print(f"[ calibrate ] best guidance scale: {best:g} "
          f"(reward {curve[best]['mean']:.4f})")

    for scale, stats in sorted(curve.items()):
        metrics.log(0, phase="calibrate", guidance_scale=scale, **stats)

    if jax.process_index() == 0:
        fs.save_json(
            os.path.join(args.savepath, "calibration.json"),
            {"filter_field": args.filter_field, "curve": curve, "best": best},
        )
        # the artifact pipeline/sample.py --guidance_scale auto consumes
        fs.save_json(
            os.path.join(args.savepath, "metadata.json"),
            {"guidance_scale": best, "filter_field": args.filter_field},
        )
        plot_calibration(
            os.path.join(args.savepath, "calibration.png"),
            {s: v["mean"] for s, v in curve.items()},
            ylabel=args.filter_field,
        )
    return best, curve


if __name__ == "__main__":
    main()
