"""Benchmark: W8A8 int8 sampling UNet vs bf16 on the chip.

End-to-end generate.py path (sampler scan + VAE decode) at SD-1.4 512px
geometry, batch 8, measuring the quant=int8 UNet (ops/quant.py: dynamic
per-sample activation scales, int8 MXU resnet convs, fp32 rescale) against
the shipped bf16 UNet. Random-init weights (zero-egress env) — the kernel
mix and conv shapes are weight-independent, so the speed transfers; the
quality PROXY (latent endpoint distance at matched seed between int8 and
bf16 at the same step count) is weight-dependent and random-init is noted
in the output.

Also measures the stacked config — int8 + DPM++(2M) 20 steps — the fastest
shipped inference path.

Per-conv upper bound from bench_int8_probe.py: the full quantized pattern
runs 1.27x (64px Cin=320) to 3.1x (8px Cin=1280) the bf16 conv; the
end-to-end gain here is diluted by attention/FF/GN (which stay bf16).

Ref workload: the reference's only inference path is the bf16/fp32 DDIM-50
scan (ddpo/diffusers_patch/pipeline_flax_stable_diffusion.py:204-255); it
has no quantized inference.

Env: QUANT_BENCH_BS (default 8), QUANT_BENCH_RES (default 512).
"""

from __future__ import annotations

import functools
import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")

    from ddpo_tpu.core.scheduler import DDIMScheduler, DPMSolverPlusPlus
    from ddpo_tpu.models import UNet2DCondition, AutoencoderKL
    from ddpo_tpu.sampling import (
        SamplerConfig,
        sample_images,
        sample_images_ode,
        vae_decode,
    )

    bs = int(os.environ.get("QUANT_BENCH_BS", "8"))
    res = int(os.environ.get("QUANT_BENCH_RES", "512"))
    latent = res // 8

    unet = UNet2DCondition(dtype=jnp.bfloat16)
    unet_q = unet.clone(quant=True)
    params = jax.jit(unet.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    vae = AutoencoderKL()
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0)
    )["params"]

    key = jax.random.PRNGKey(42)
    prompt_embeds = jax.random.normal(key, (bs, 77, 768), jnp.float32)
    uncond_embeds = jnp.zeros((bs, 77, 768), jnp.float32)

    ddim = DDIMScheduler()
    dpm = DPMSolverPlusPlus()

    def build(module, scheduler, fn, steps, eta):
        def unet_apply(p, latents, t, context):
            return module.apply({"params": p}, latents, t, context)

        cfg = SamplerConfig(
            num_inference_steps=steps, guidance_scale=5.0, eta=eta,
            height=res, width=res,
        )
        state = scheduler.set_timesteps(scheduler.create_state(), steps)
        sample = jax.jit(
            functools.partial(fn, unet_apply, scheduler=scheduler, config=cfg)
        )
        decode = jax.jit(functools.partial(vae_decode, vae))

        def run(seed):
            lat = sample(
                params, scheduler_state=state, prompt_embeds=prompt_embeds,
                uncond_embeds=uncond_embeds, key=seed,
            )
            return lat, decode(vae_params, lat)

        return run

    def timed(run):
        lat, img = run(key)  # compile
        np.asarray(jax.device_get(img[0, 0, 0, 0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lat, img = run(key)
            np.asarray(jax.device_get(img[0, 0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best, np.asarray(jax.device_get(lat), np.float32)

    # speed at the production sampler settings (DDIM eta=1)
    t_bf50, _ = timed(build(unet, ddim, sample_images, 50, 1.0))
    t_q50, _ = timed(build(unet_q, ddim, sample_images, 50, 1.0))
    t_q_dpm20, _ = timed(build(unet_q, dpm, sample_images_ode, 20, 0.0))

    # quality proxy: deterministic (eta=0) endpoint agreement, int8 vs bf16
    # at the SAME step grid/seed — isolates the quantization error; measured
    # on both shipped inference schedulers (DDIM-50 and DPM++-20)
    _, ref_bf = timed(build(unet, ddim, sample_images, 50, 0.0))
    _, q50 = timed(build(unet_q, ddim, sample_images, 50, 0.0))
    _, ref_dpm = timed(build(unet, dpm, sample_images_ode, 20, 0.0))
    _, q_dpm = timed(build(unet_q, dpm, sample_images_ode, 20, 0.0))

    rel = float(np.linalg.norm(q50 - ref_bf) / np.linalg.norm(ref_bf))
    rel_dpm = float(
        np.linalg.norm(q_dpm - ref_dpm) / np.linalg.norm(ref_dpm)
    )

    line = {
        "metric": f"int8 DDIM-50 images/sec/chip at {res}px bs{bs}",
        "value": round(bs / t_q50, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(t_bf50 / t_q50, 3),
        "bf16_ddim50_images_per_sec": round(bs / t_bf50, 3),
        "int8_dpm20_images_per_sec": round(bs / t_q_dpm20, 3),
        "int8_dpm20_vs_bf16_ddim50": round(t_bf50 / t_q_dpm20, 3),
        "rel_latent_err_int8_vs_bf16_ddim50_eta0": round(rel, 4),
        "rel_latent_err_int8_vs_bf16_dpm20": round(rel_dpm, 4),
        "weights": "random-init (zero-egress env)",
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(line))
    with open("bench_quant_results.json", "w") as f:
        json.dump(line, f, indent=2)
    return line


if __name__ == "__main__":
    main()
