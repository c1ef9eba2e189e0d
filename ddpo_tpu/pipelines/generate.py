"""Generation-only inference driver: text -> images from any checkpoint.

The reference has no standalone generation entry point — it previews
samples only inside the training loops (pipeline/policy_gradient.py:300-305
saves one png per sampling batch) and its RWR sampler writes trajectories
to HDF5 datasets. A user with a finetuned checkpoint (unet_{epoch}.pkl or
an Orbax dir) needs a way to just make images from prompts.

TPU-first details:
  - the lean sampler (sampling/sampler.py::sample_images) runs the same
    scan as the trainer's trajectory sampler — bit-identical images at the
    same seed — but carries no per-step outputs, so no (B, T, 4, h, w)
    trajectory tensors occupy HBM at inference batch sizes.
  - guidance_scale is a traced scalar: --guidance_scale sweeps/auto reuse
    one compiled program (see pipelines/calibrate.py).
  - --guidance_scale auto resolves the calibrated scale from the model
    dir's metadata.json (reference pipeline/sample.py:48-49 semantics).

Run: python -m ddpo_tpu.pipelines.generate --dataset compressed-animals \
         --prompts "['a dog', 'a cheetah']" --n_samples 8
"""

from __future__ import annotations

import functools
import sys
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ddpo_tpu import training
from ddpo_tpu.models.tokenizer import make_uncond_ids
from ddpo_tpu.parallel import MeshConfig, batch_sharding, create_mesh, replicated, shard_batch
from ddpo_tpu.parallel.mesh import maybe_initialize_distributed
from ddpo_tpu.sampling import SamplerConfig, sample_images, sample_images_ode, vae_decode
from ddpo_tpu.utils import Timer
from ddpo_tpu.utils.images import save_image, save_images
from ddpo_tpu.utils.metrics import MetricsLogger, run_dir
from ddpo_tpu.utils.parser import Parser as BaseParser
from ddpo_tpu.utils.serialization import load_unet


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
    args = Parser().parse_args("generate", argv)
    mesh = create_mesh(MeshConfig(tp=1))
    dp = mesh.shape["dp"]
    batch_size = args.n_samples_per_device * dp

    if args.guidance_scale == "auto":
        from ddpo_tpu.utils.loaders import load_guidance_scale

        args.set("guidance_scale", load_guidance_scale(args.loadpath))
        print(f"[ generate ] calibrated guidance scale: {args.guidance_scale:g}")

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
    if getattr(args, "quant", "none") == "int8":
        # W8A8 int8 resnet convs on the 2x-rate MXU path (ops/quant.py);
        # same param tree, compute path only — valid for inference drivers
        models = models._replace(unet=models.unet.clone(quant=True))
        print(f"[ generate ] quant=int8: W8A8 resnet convs in the sampling UNet")
    scheduler_kind = getattr(args, "scheduler", "ddim")
    if scheduler_kind == "dpm++":
        raw_argv = argv if argv is not None else sys.argv[1:]
        if "--eta" in raw_argv and float(getattr(args, "eta", 1.0)) != 0.0:
            print(
                "[ generate ] warning: --eta has no effect with "
                "--scheduler dpm++ (deterministic ODE solver, eta=0)"
            )
        # deterministic few-step ODE solver for inference; same noise
        # schedule as the checkpoint's DDIM config
        from ddpo_tpu.core.scheduler import DPMSolverPlusPlus

        d = models.scheduler
        scheduler = DPMSolverPlusPlus(
            num_train_timesteps=d.num_train_timesteps,
            beta_start=d.beta_start,
            beta_end=d.beta_end,
            beta_schedule=d.beta_schedule,
            prediction_type=d.prediction_type,
        )
        sample_fn = sample_images_ode
    elif scheduler_kind == "ddim":
        scheduler = models.scheduler
        sample_fn = sample_images
    else:
        raise ValueError(f"unknown scheduler {scheduler_kind!r} (ddim|dpm++)")
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
        guidance_scale=float(args.guidance_scale),
        eta=args.eta,
        height=args.resolution,
        width=args.resolution,
        vae_scale_factor=vae_scale,
        latent_channels=models.vae.config.latent_channels,
    )
    generate_fn = jax.jit(
        functools.partial(
            sample_fn, unet_apply, scheduler=scheduler, config=sampler_config
        )
    )
    decode_fn = jax.jit(functools.partial(vae_decode, models.vae))
    _text_encode = jax.jit(
        lambda p, ids: models.text_encoder.apply({"params": p}, ids)
    )

    uncond_ids = make_uncond_ids(models.tokenizer, batch_size)
    uncond_embeds = shard_batch(
        mesh, jnp.asarray(_text_encode(text_params, jnp.asarray(uncond_ids)))
    )

    outdir = run_dir(args.savepath)
    os.makedirs(outdir, exist_ok=True)
    metrics = MetricsLogger(outdir, enabled=jax.process_index() == 0)

    fixed_prompts = list(args.prompts) if args.prompts else None
    rng = jax.random.PRNGKey(args.seed or 0)
    timer = Timer()
    all_prompts, generated = [], 0
    batch_idx = 0
    while generated < args.n_samples:
        if fixed_prompts:
            prompts = [
                fixed_prompts[(generated + i) % len(fixed_prompts)]
                for i in range(batch_size)
            ]
        else:
            prompts, _, _ = training.make_prompts(
                args.prompt_fn, batch_size, args.identical_batch,
                evaluate=args.evaluate, **args.prompt_kwargs,
            )
        prompt_ids = models.tokenizer(list(prompts))
        prompt_embeds = jax.device_put(
            _text_encode(text_params, jnp.asarray(prompt_ids)),
            batch_sharding(mesh),
        )
        rng, seed = jax.random.split(rng)
        latents = generate_fn(
            unet_params,
            scheduler_state=sched_state,
            prompt_embeds=prompt_embeds,
            uncond_embeds=uncond_embeds,
            key=seed,
        )
        images = np.asarray(jax.device_get(decode_fn(vae_params, latents)))
        elapsed = timer()

        n_keep = min(batch_size, args.n_samples - generated)
        for i in range(n_keep):
            save_image(
                os.path.join(outdir, f"{generated + i:05d}.png"), images[i]
            )
        if args.grid:
            save_images(
                images[:n_keep], os.path.join(outdir, f"grid_{batch_idx}.png")
            )
        all_prompts.extend(prompts[:n_keep])
        generated += n_keep
        print(
            f"[ generate ] batch {batch_idx}: {n_keep} images in "
            f"{elapsed:.2f}s ({batch_size / elapsed:.3f}/s) -> {outdir}"
        )
        metrics.log(
            batch_idx, phase="generate", n_images=int(n_keep),
            images_per_sec=float(batch_size / elapsed),
        )
        batch_idx += 1

    if jax.process_index() == 0:
        with open(os.path.join(outdir, "prompts.json"), "w") as f:
            json.dump(
                {
                    "prompts": all_prompts,
                    "guidance_scale": float(args.guidance_scale),
                    "n_inference_steps": args.n_inference_steps,
                    "scheduler": scheduler_kind,
                    "seed": args.seed,
                },
                f, indent=2,
            )
    return outdir, all_prompts


if __name__ == "__main__":
    main()
