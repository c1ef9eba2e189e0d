"""Benchmark: RWR finetune step time (the other trainer's update latency).

Compares the reference-style RWR update (float32, two B-batch CFG applies —
the shape of /root/reference/ddpo/training/diffusion.py:62-79 under
pipeline/finetune.py's pmapped loop) against this framework's shipped bf16
cfg_concat variant (one 2B-batch apply; pipelines/finetune.py sets
cfg_concat when dtype=bfloat16). Both include the in-step CLIP text encode,
VAE posterior sample, forward noising, and the adamw update — the full
per-batch work of the finetune loop minus host data loading.

Prints one JSON line. Env: RWR_BENCH_BS (default 4 — the reference's
compressed_animals train_batch_size), RWR_BENCH_RES (default 512),
BENCH_REMEASURE.
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
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")

    from flax.training.train_state import TrainState

    from ddpo_tpu.core.scheduler import DDPMScheduler
    from ddpo_tpu.models import CLIPTextModel, UNet2DCondition
    from ddpo_tpu.training.diffusion import train_step

    bs = int(os.environ.get("RWR_BENCH_BS", "4"))
    res = int(os.environ.get("RWR_BENCH_RES", "512"))
    latent = res // 8

    text_model = CLIPTextModel()

    def text_apply(p, ids):
        return text_model.apply({"params": p}, ids)

    def make_apply(dtype):
        model = UNet2DCondition(dtype=dtype)

        @jax.checkpoint
        def apply_fn(p, latents, t, context):
            return model.apply({"params": p}, latents, t, context)

        return model, apply_fn

    model32, apply32 = make_apply(jnp.float32)
    _, apply16 = make_apply(jnp.bfloat16)

    params = jax.jit(model32.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    text_params = jax.jit(text_model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32)
    )["params"]

    scheduler = DDPMScheduler()
    sched_state = scheduler.create_state()

    key = jax.random.PRNGKey(2)
    batch = {
        # stored VAE posterior moments, channel-last (B, h, w, 8)
        "vae": jax.random.normal(key, (bs, latent, latent, 8)),
        "input_ids": jnp.ones((bs, 77), jnp.int32),
        "uncond_text": jnp.ones((bs, 77), jnp.int32),
    }

    def make_state(apply_fn):
        p = jax.tree_util.tree_map(jnp.asarray, params)
        return TrainState.create(
            apply_fn=apply_fn, params=p,
            tx=optax.chain(optax.clip_by_global_norm(1.0), optax.adafactor(1e-5)),
        )

    def sync(state):
        jax.device_get(np.asarray(state.step))

    def time_variant(apply_fn, cfg_concat):
        step = jax.jit(
            functools.partial(
                train_step,
                text_encoder_apply=text_apply,
                scheduler=scheduler,
                train_cfg=True,
                guidance_scale=5.0,
                cfg_concat=cfg_concat,
            ),
            donate_argnums=(0,),
        )
        state = make_state(apply_fn)
        rng = jax.random.PRNGKey(3)
        state, _, rng = step(
            state, text_encoder_params=text_params, batch=batch, rng=rng,
            scheduler_state=sched_state,
        )
        sync(state)  # compiled + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, _, rng = step(
                state, text_encoder_params=text_params, batch=batch, rng=rng,
                scheduler_state=sched_state,
            )
            sync(state)
            best = min(best, time.perf_counter() - t0)
        return best

    device_kind = jax.devices()[0].device_kind
    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    baselines = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
    cache_key = f"rwr|{device_kind}|{bs}|{res}"

    cached = (
        baselines.get(cache_key, {}).get("seconds")
        if not os.environ.get("BENCH_REMEASURE")
        else None
    )
    if cached is not None:
        t_ref = float(cached)
        print(f"# reference-style fp32 RWR baseline from cache: {t_ref}", flush=True)
    else:
        print("# measuring reference-style fp32 two-apply RWR step", flush=True)
        try:
            t_ref = time_variant(apply32, cfg_concat=False)
        except Exception as e:
            print(f"# fp32 variant failed: {type(e).__name__}")
            t_ref = None
        if t_ref is not None:
            baselines[cache_key] = {
                "seconds": t_ref,
                "config": "float32, two-apply CFG, remat (reference form)",
            }
            with open(baseline_path, "w") as f:
                json.dump(baselines, f, indent=2)

    import gc

    gc.collect()
    jax.clear_caches()

    print("# measuring shipped bf16 cfg_concat RWR step", flush=True)
    t_opt = time_variant(apply16, cfg_concat=True)

    line = {
        "metric": f"RWR finetune step ({res}px, bs={bs}, CFG train)",
        "value": round(t_opt * 1e3, 3),
        "unit": "ms/step",
        "vs_baseline": round(t_ref / t_opt, 3) if t_ref else None,
        "baseline_ms": round(t_ref * 1e3, 3) if t_ref else None,
        "device": device_kind,
    }
    print(json.dumps(line))
    return line


if __name__ == "__main__":
    main()
