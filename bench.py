"""Benchmark: images/sec/chip for 50-step 512px DDIM sampling (headline).

Prints ONE JSON line:
  {"metric": "images/sec/chip (50-step 512px DDIM, CFG)", "value": N,
   "unit": "images/sec/chip", "vs_baseline": N, ...}

Baseline semantics: the reference publishes no numbers (BASELINE.md), so the
baseline is a faithful reference-style configuration measured on the same
chip — float32 activations and XLA-only ops, matching the reference's
defaults (config/base.py dtype "float32", diffusers XLA attention). The
optimized path runs bfloat16 with the Pallas flash-attention/GroupNorm
kernels. The baseline number is cached per device kind in
bench_baseline.json (committed) so routine runs only time the optimized
path; delete the file or set BENCH_REMEASURE=1 to re-measure both.

Env overrides: BENCH_BATCH, BENCH_STEPS, BENCH_RES, BENCH_REPEATS.
Weights are random at the exact SD-1.4 architecture (zero-egress: systems
throughput is architecture-dependent, not weight-dependent).
"""

from __future__ import annotations

import functools
import json
import os
import time


def _setup_jax():
    import jax

    cache_dir = os.environ.get("BENCH_COMPILE_CACHE", "/tmp/ddpo_tpu_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    return jax


def build_sampler(dtype_name: str, steps: int, res: int, batch: int):
    import jax
    import jax.numpy as jnp

    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.sampling import SamplerConfig, sample_trajectories
    from ddpo_tpu.utils.serialization import sd_scheduler

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    model = UNet2DCondition(dtype=dtype)

    # proper random init on device (constant weights blow up activations)
    init = jax.jit(model.init, static_argnames=())
    params = init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, res // 8, res // 8)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    # store params in the compute dtype: batch-1 sampling is HBM-bandwidth
    # bound on weight reads, so bf16 params halve the traffic (casting
    # per-op inside the kernel would still read fp32 from HBM)
    params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)

    def unet_apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    scheduler = sd_scheduler()
    sched_state = scheduler.create_state()
    config = SamplerConfig(
        num_inference_steps=steps, guidance_scale=5.0, eta=1.0,
        height=res, width=res,
    )

    fn = jax.jit(
        functools.partial(
            sample_trajectories, unet_apply, scheduler=scheduler, config=config
        )
    )

    prompt_embeds = jnp.zeros((batch, 77, 768))
    uncond_embeds = jnp.zeros((batch, 77, 768))

    def run(key):
        out = fn(
            params,
            scheduler_state=sched_state,
            prompt_embeds=prompt_embeds,
            uncond_embeds=uncond_embeds,
            key=key,
        )
        # device_get of a small output is the sync barrier: on the axon
        # remote backend block_until_ready can return before execution
        # completes, a device->host read cannot.
        return jax.device_get(out["log_probs"])

    return run


def time_sampler(dtype_name: str, steps: int, res: int, batch: int, repeats: int):
    import jax

    run = build_sampler(dtype_name, steps, res, batch)
    run(jax.random.PRNGKey(0))  # compile + warm up
    times = []
    for i in range(repeats):
        start = time.perf_counter()
        run(jax.random.PRNGKey(i + 1))
        times.append(time.perf_counter() - start)
    best = min(times)
    return batch / best, best


def main():
    jax = _setup_jax()
    device = jax.devices()[0]
    device_kind = getattr(device, "device_kind", str(device))

    # 8 = the reference's default per-device sample batch (config/base.py:77)
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    res = int(os.environ.get("BENCH_RES", "512"))
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    baselines = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baselines = json.load(f)
    key = f"{device_kind}|{steps}|{res}|{batch}"

    if key not in baselines or os.environ.get("BENCH_REMEASURE"):
        ips_ref, t_ref = time_sampler("float32", steps, res, batch, repeats)
        baselines[key] = {"images_per_sec_chip": ips_ref, "batch_time_s": t_ref,
                          "config": "float32 + XLA ops (reference-style)"}
        with open(baseline_path, "w") as f:
            json.dump(baselines, f, indent=2)

    ips, t_best = time_sampler("bfloat16", steps, res, batch, repeats)
    ref = baselines[key]["images_per_sec_chip"]

    print(
        json.dumps(
            {
                "metric": f"images/sec/chip ({steps}-step {res}px DDIM, CFG)",
                "value": round(ips, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / ref, 3),
                "baseline_images_per_sec_chip": round(ref, 4),
                "batch": batch,
                "batch_time_s": round(t_best, 3),
                "device": device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
