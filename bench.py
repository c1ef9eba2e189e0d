"""Benchmark: DDPO epoch throughput/chip — the reference's headline workload.

Prints ONE JSON line (always the LAST stdout line):
  {"metric": "DDPO samples/sec/chip (50-step 512px sample + PPO epoch)",
   "value": N, "unit": "samples/sec/chip", "vs_baseline": N, ...}

A DDPO epoch is sample-then-train (reference pipeline/policy_gradient.py's
outer loop): B trajectories of 50 DDIM steps with CFG, then one PPO inner
epoch training every (sample, timestep) pair. At the reference's defaults
(B=8, 50 steps, train_timestep_ratio 1.0) the TRAIN side dominates: ~69s
of the fp32 epoch's ~77s compute. This bench therefore measures both
phases and composes the epoch:

  T_epoch = B / sampler_imgs_per_sec + B * steps * per_sample_timestep_s

Host-side reward scoring and advantage statistics are excluded — they are
identical work in both configurations (and this framework's native-libjpeg
scorer is faster besides). Sampling is timed in-process (phase logic
unchanged from rounds 1-2 — `sampler_*` keys remain comparable to
BENCH_r01/r02); the PPO-update phase runs bench_train.py in a subprocess
for memory isolation and parses its JSON line. If the train phase cannot
run (set BENCH_SAMPLER_ONLY=1, or subprocess failure/timeout
BENCH_TRAIN_TIMEOUT, default 2400s), falls back to the round-1/2
sampler-only metric.

Baseline semantics: the reference publishes no numbers (BASELINE.md), so
the baseline is a faithful reference-style configuration measured on the
same chip — float32 activations, XLA-only ops, one dispatch per (batch,
timestep) train slice, two-apply CFG, matching the reference's defaults
(config/base.py dtype "float32", diffusers XLA attention, the
training/policy_gradient.py:86-118 update shape). The optimized path is
this framework's SHIPPED DEFAULT config: bfloat16 compute with Pallas
flash attention forward+backward, fused timestep scan, one-concat CFG.
Baseline numbers are cached per device kind in bench_baseline.json
(committed) so routine runs only time the optimized path; set
BENCH_REMEASURE=1 to re-measure.

Env overrides: BENCH_BATCH, BENCH_STEPS, BENCH_RES, BENCH_REPEATS,
TRAIN_BENCH_BS, TRAIN_BENCH_T, BENCH_SAMPLER_ONLY, BENCH_TRAIN_TIMEOUT.
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


def measure_sampling():
    """Phase 1: sampler img/s, optimized (bf16+Pallas) vs cached fp32 baseline."""
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
    return {
        "batch": batch, "steps": steps, "res": res,
        "ips": ips, "ips_ref": ref, "batch_time_s": t_best,
        "device": device_kind,
    }


def measure_training(res: int):
    """Phase 2: PPO update per (sample, timestep), via bench_train.py.

    Subprocess for memory isolation (the fp32 reference variant and the
    fused bf16 variant each want most of the 16GB chip). Returns the parsed
    JSON dict, or None if the phase failed/timed out/was disabled.
    """
    import subprocess
    import sys

    if os.environ.get("BENCH_SAMPLER_ONLY"):
        return None
    timeout = float(os.environ.get("BENCH_TRAIN_TIMEOUT", "2400"))
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_train.py")
    env = dict(os.environ)
    env.setdefault("TRAIN_BENCH_RES", str(res))
    try:
        proc = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        print("# train phase timed out; falling back to sampler-only metric")
        return None
    if proc.returncode != 0:
        print(f"# train phase failed (rc={proc.returncode}); sampler-only fallback")
        print("\n".join(proc.stderr.splitlines()[-5:]))
        return None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print("# train phase printed no JSON; sampler-only fallback")
    return None


def _run_phase_json(script_name: str, res: int, timeout_env: str):
    """Run a sibling bench script, return its final JSON line (or None)."""
    import subprocess
    import sys

    timeout = float(os.environ.get(timeout_env, "2400"))
    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), script_name
    )
    env = dict(os.environ)
    env.setdefault("TRAIN_BENCH_RES", str(res))
    try:
        proc = subprocess.run(
            [sys.executable, script],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        print(f"# {script_name} timed out; skipping")
        return None
    if proc.returncode != 0:
        print(f"# {script_name} failed (rc={proc.returncode}); skipping")
        print("\n".join(proc.stderr.splitlines()[-5:]))
        return None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def main():
    s = measure_sampling()
    sampler_line = {
        "metric": f"images/sec/chip ({s['steps']}-step {s['res']}px DDIM, CFG)",
        "value": round(s["ips"], 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(s["ips"] / s["ips_ref"], 3),
        "baseline_images_per_sec_chip": round(s["ips_ref"], 4),
        "batch": s["batch"],
        "batch_time_s": round(s["batch_time_s"], 3),
        "device": s["device"],
    }

    t = measure_training(s["res"])
    if t is None or t.get("vs_baseline") is None or t.get("baseline_ms") is None:
        print(json.dumps(sampler_line))
        return

    # compose the DDPO epoch (see module docstring): per-sample-timestep
    # train cost scaled by the reference's defaults (every timestep of
    # every sample trained once per epoch, num_inner_epochs=1)
    b, steps = s["batch"], s["steps"]
    t_epoch_ref = b / s["ips_ref"] + b * steps * t["baseline_ms"] / 1e3
    t_epoch_opt = b / s["ips"] + b * steps * t["value"] / 1e3
    sps_ref = b / t_epoch_ref
    sps_opt = b / t_epoch_opt

    line = {
        "metric": (
            f"DDPO samples/sec/chip ({steps}-step {s['res']}px "
            "sample + PPO epoch)"
        ),
        "value": round(sps_opt, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps_opt / sps_ref, 3),
        "baseline_samples_per_sec_chip": round(sps_ref, 4),
        "epoch_s": round(t_epoch_opt, 2),
        "baseline_epoch_s": round(t_epoch_ref, 2),
        # round-1/2-comparable sampler phase
        "sampler_images_per_sec_chip": sampler_line["value"],
        "sampler_vs_baseline": sampler_line["vs_baseline"],
        # train phase (bench_train.py, default shipped config)
        "train_ms_per_sample_timestep": t["value"],
        "train_vs_baseline": t["vs_baseline"],
        "batch": b,
        "device": s["device"],
    }

    # second headline row: the measured-best shipped recipe
    # (`--dataset compressed-animals-lora`, r=8 @ lr 1e-3 — learns PAST
    # full finetune on the flagship task, BENCHLOG round 4). Same epoch
    # composition with the LoRA step time from bench_lora.py.
    if not os.environ.get("BENCH_NO_FAST_PRESET"):
        lora = _run_phase_json("bench_lora.py", s["res"], "BENCH_TRAIN_TIMEOUT")
        if lora is not None and lora.get("value"):
            t_epoch_fast = b / s["ips"] + b * steps * lora["value"] / 1e3
            sps_fast = b / t_epoch_fast
            line.update({
                "fast_preset": "compressed-animals-lora (r=8, lr 1e-3)",
                "fast_preset_samples_per_sec_chip": round(sps_fast, 4),
                "fast_preset_vs_baseline": round(sps_fast / sps_ref, 3),
                "fast_preset_epoch_s": round(t_epoch_fast, 2),
                "lora_ms_per_sample_timestep": lora["value"],
            })

    print(json.dumps(line))


if __name__ == "__main__":
    main()
