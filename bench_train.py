"""Benchmark: DDPO PPO update time (BASELINE.md metric #2).

Compares the reference-style update (one jitted dispatch per (batch,
timestep) slice, float32, CFG double-forward — the shape of
pipeline/policy_gradient.py:431-441) against this framework's fused update
(one dispatch scans all trained timesteps; bf16 activations optional).

Prints one JSON line with per-(sample, timestep) update latency.
Env: TRAIN_BENCH_BS (default 2), TRAIN_BENCH_T (default 10), TRAIN_BENCH_RES.
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

    from ddpo_tpu.core import DDIMScheduler
    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.training.policy_gradient import (
        AccumulatingTrainState,
        train_step,
        train_step_fused,
    )

    bs = int(os.environ.get("TRAIN_BENCH_BS", "2"))
    num_t = int(os.environ.get("TRAIN_BENCH_T", "10"))
    res = int(os.environ.get("TRAIN_BENCH_RES", "512"))
    latent = res // 8

    def make_apply(dtype):
        model = UNet2DCondition(dtype=dtype)

        # full fwd+bwd of the 860M UNet at 512px does not fit one 16GB v5e
        # without rematerialization (the reference trained on 32GB v4 chips)
        @jax.checkpoint
        def apply_fn(p, latents, t, context):
            return model.apply({"params": p}, latents, t, context)

        return model, apply_fn

    model32, apply32 = make_apply(jnp.float32)
    _, apply16 = make_apply(jnp.bfloat16)

    init = jax.jit(model32.init)
    params = init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    # keep the master copy on host: each variant gets a fresh device copy,
    # so donation in one variant cannot invalidate the other's inputs and
    # no stale device buffers survive between variants
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))

    scheduler = DDIMScheduler()
    sched_state = scheduler.set_timesteps(scheduler.create_state(), 50)

    def make_state(apply_fn, dtype=jnp.float32, accumulate=False):
        # adafactor (a reference config option) keeps optimizer state tiny:
        # fp32 params + grad_acc + adamw moments exceed 16GB HBM on a v5e.
        # accumulate=False: no 3.4GB grad-accumulation buffer (the default
        # train_accumulation_steps=1 never uses it — driver does the same)
        p = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=dtype), params)
        return AccumulatingTrainState.create(
            apply_fn=apply_fn, params=p,
            tx=optax.chain(
                optax.clip_by_global_norm(1.0), optax.adafactor(1e-5)
            ),
            accumulate=accumulate,
        )

    key = jax.random.PRNGKey(1)
    batch_t = {
        "latents": jax.random.normal(key, (num_t, bs, 4, latent, latent)),
        "next_latents": jax.random.normal(key, (num_t, bs, 4, latent, latent)),
        "ts": jnp.tile(jnp.arange(1, 982, 980 // max(1, num_t - 1))[:num_t, None], (1, bs)),
        "log_probs": jnp.zeros((num_t, bs)),
        "advantages": jnp.ones((bs,)),
        "prompt_embeds": jax.random.normal(key, (bs, 77, 768)),
        "uncond_embeds": jnp.zeros((bs, 77, 768)),
    }
    kwargs = dict(
        scheduler=scheduler, train_cfg=True, guidance_scale=5.0, eta=1.0,
        clip_range=1e-4,
    )
    # reference semantics: two B-batch CFG applies at train time
    # (reference training/policy_gradient.py:86-107); ours: one 2B concat
    # apply (identical math, bigger matmuls — see ppo_loss docstring)

    def sync(state):
        jax.device_get(np.asarray(state.step))

    def time_variant(step_fn, state, run_once):
        state = run_once(state)  # compile (donated: keep the new state)
        sync(state)
        t0 = time.perf_counter()
        state = run_once(state)
        sync(state)
        return time.perf_counter() - t0

    # reference-style: one dispatch per timestep slice, fp32
    ref_step = jax.jit(
        functools.partial(train_step, cfg_concat=False, **kwargs),
        static_argnames=("do_opt_update",),
        donate_argnums=(0,),
    )

    def run_ref(state):
        for j in range(num_t):
            slice_j = {
                k: (batch_t[k][j] if k in ("latents", "next_latents", "ts", "log_probs") else batch_t[k])
                for k in batch_t
            }
            state, _ = ref_step(
                state, slice_j, sched_state, do_opt_update=(j == num_t - 1)
            )
        return state

    import gc

    def measure_ref():
        try:
            # the reference style accumulates grads across the timestep loop
            return time_variant(
                train_step, make_state(apply32, accumulate=True), run_ref
            )
        except Exception as e:  # the fp32 reference config may not fit 16GB
            print(f"# reference-style fp32 variant failed: {type(e).__name__}")
            return None

    # the fp32 reference-style variant is the *baseline*: cache it per
    # (device, geometry) in bench_baseline.json like bench.py does for the
    # sampler, so routine runs (and bench.py's composite) only time the
    # optimized path. Delete the entry or set BENCH_REMEASURE=1 to re-measure.
    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    baselines = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
    device_kind = jax.devices()[0].device_kind
    cache_key = f"train|{device_kind}|{bs}|{num_t}|{res}"

    cached = (
        baselines.get(cache_key, {}).get("seconds")
        if not os.environ.get("BENCH_REMEASURE")
        else None
    )
    if cached is not None:  # a null entry means a past failure: re-measure
        t_ref = float(cached)
        print(f"# reference-style fp32 baseline from cache: {t_ref}", flush=True)
    else:
        print("# measuring reference-style fp32 variant", flush=True)
        t_ref = measure_ref()
        if t_ref is not None:  # never cache a failure as authoritative
            baselines[cache_key] = {
                "seconds": t_ref,
                "config": "float32, one dispatch per timestep slice, two-apply CFG",
            }
            with open(baseline_path, "w") as f:
                json.dump(baselines, f, indent=2)
    # drop any buffers the failed/finished fp32 variant still references
    gc.collect()
    jax.clear_caches()

    # fused: one dispatch for all timesteps, bf16 activations
    fused_step = jax.jit(
        functools.partial(
            train_step_fused, do_opt_update=True, cfg_concat=True, **kwargs
        ),
        donate_argnums=(0,),
    )

    def run_fused(state):
        state, _ = fused_step(state, batch_t, sched_state)
        return state

    print("# measuring fused bf16-compute variant (fp32 master params — the "
          "shipped pg default config)", flush=True)
    master_dtype = jnp.float32
    if os.environ.get("TRAIN_BENCH_BF16_MASTER"):
        master_dtype = jnp.bfloat16  # round-2 comparison variant
    t_fused = time_variant(
        train_step_fused, make_state(apply16, master_dtype), run_fused
    )

    per_fused = t_fused / (bs * num_t)
    result = {
        "metric": f"PG update time per (sample, timestep) at {res}px, CFG train",
        "value": round(per_fused * 1e3, 3),
        "unit": "ms",
        "batch": bs,
        "timesteps": num_t,
        "device": jax.devices()[0].device_kind,
    }
    if t_ref is not None:
        per_ref = t_ref / (bs * num_t)
        result["vs_baseline"] = round(per_ref / per_fused, 3)
        result["baseline_ms"] = round(per_ref * 1e3, 3)
    else:
        result["vs_baseline"] = None
        result["baseline_note"] = "reference-style fp32 per-timestep variant OOMs on 16GB"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
