"""Benchmark: resident inner loop vs host loop at production PG geometry.

SURVEY §7.3's flagship design claim — keep the whole PPO inner epoch
device-resident (one dispatch: shuffle + rebatch + minibatch scan) instead
of the reference's host round-trip (numpy shuffle + one dispatch per
minibatch, pipeline/policy_gradient.py:385-441) — shipped in round 2 as
``resident_inner_loop`` but was never measured on hardware. This times
both paths end to end at the shipped default geometry (sample_bs 8, T=50,
512px, train_batch_size 2 -> 4 fused minibatch steps per inner epoch),
starting from trajectories ON DEVICE exactly as the sampler leaves them:

  host path:     device_get trajectories -> np shuffle + per-sample t-perm
                 + rebatch -> 4x jit(train_step_fused) dispatches -> infos
  resident path: 1x jit(inner_epoch_resident) dispatch -> infos

Both run the SHIPPED step config (bf16 compute, fused timestep scan,
cfg_concat, fp32 master + adamw(bf16 mu)). The result decides the
``resident_inner_loop`` default in config/base.py (VERDICT r3 item #4).

Env: RES_BENCH_BS (default 8), RES_BENCH_T (default 50), RES_BENCH_RES
(default 512), RES_BENCH_TRAIN_BS (default 2).
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
        inner_epoch_resident,
        train_step_fused,
    )

    bs = int(os.environ.get("RES_BENCH_BS", "8"))
    num_t = int(os.environ.get("RES_BENCH_T", "50"))
    res = int(os.environ.get("RES_BENCH_RES", "512"))
    train_bs = int(os.environ.get("RES_BENCH_TRAIN_BS", "2"))
    latent = res // 8
    n_batches = bs // train_bs

    model = UNet2DCondition(dtype=jnp.bfloat16)
    params = jax.jit(UNet2DCondition(dtype=jnp.float32).init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    # keep the master tree on HOST: both phases donate their state, and a
    # device-resident master would either be deleted by the first donation
    # (INVALID_ARGUMENT on reuse) or, if copied on device, double the 3.28GB
    # param footprint and OOM the 16GB chip next to the optimizer state.
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), params
    )

    @jax.checkpoint
    def apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    def make_state():
        # adafactor, matching bench_train.py and the real-chip learning runs:
        # fp32 master + adamw moments exceed 16GB HBM at SD scale (measured:
        # the adamw variant of this bench OOMs at 16.24G vs 15.75G), so
        # adafactor is the only optimizer that fits BOTH loops on one v5e
        # chip at this geometry — the measurement is adafactor-specific.
        # (config/base.py pg keeps optimizer=adamw as the reference-parity
        # default; its resident_inner_loop comment notes this caveat.)
        return AccumulatingTrainState.create(
            apply_fn=apply,
            params=jax.tree_util.tree_map(jnp.asarray, params),
            tx=optax.chain(
                optax.clip_by_global_norm(1.0), optax.adafactor(1e-5)
            ),
            accumulate=False,
        )

    scheduler = DDIMScheduler()
    sched_state = scheduler.set_timesteps(scheduler.create_state(), num_t)

    key = jax.random.PRNGKey(1)
    ts_grid = jnp.tile(
        jnp.arange(1, 981, 980 // num_t)[:num_t][::-1][None], (bs, 1)
    )
    # trajectories exactly as the sampler leaves them on device: (B, T, ...)
    device_samples = {
        "latents": jax.random.normal(key, (bs, num_t, 4, latent, latent)),
        "next_latents": jax.random.normal(key, (bs, num_t, 4, latent, latent)),
        "ts": ts_grid.astype(jnp.int32),
        "log_probs": jnp.zeros((bs, num_t)),
        "advantages": jnp.ones((bs,)),
        "embeds": jax.random.normal(key, (bs, 77, 768)),
        "uncond_embeds": jnp.zeros((bs, 77, 768)),
    }
    jax.block_until_ready(device_samples)
    kwargs = dict(
        scheduler=scheduler, train_cfg=True, guidance_scale=5.0, eta=1.0,
        clip_range=2e-4, cfg_concat=True,
    )

    def sync(x):
        jax.device_get(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    def mem_peak():
        try:
            st = jax.devices()[0].memory_stats()
            return round(st.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            return None

    # ------------------------- resident path ------------------------- #
    jit_inner = jax.jit(
        functools.partial(
            inner_epoch_resident, train_batch_size=train_bs, num_train_ts=num_t,
            **kwargs,
        ),
        donate_argnums=(0,),
    )

    def run_resident(state, rng):
        state, infos = jit_inner(state, device_samples, sched_state, rng)
        infos = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), infos
        )
        return state, infos

    state = make_state()
    rng = jax.random.PRNGKey(2)
    print("# compiling resident inner epoch", flush=True)
    state, _ = run_resident(state, rng)
    sync(state.step)
    t_resident = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        state, infos_r = run_resident(state, jax.random.fold_in(rng, i))
        sync(state.step)
        t_resident = min(t_resident, time.perf_counter() - t0)
    mem_resident = mem_peak()
    del state
    import gc

    gc.collect()
    jax.clear_caches()

    # --------------------------- host path --------------------------- #
    jit_step = jax.jit(
        functools.partial(train_step_fused, do_opt_update=True, **kwargs),
        donate_argnums=(0,),
    )

    def run_host(state, host_samples):
        # the driver's exact inner-epoch host work (policy_gradient.py:700-747)
        total_bs, T = host_samples["log_probs"].shape
        perm = np.random.permutation(total_bs)
        keys = ["embeds", "latents", "next_latents", "log_probs", "ts", "advantages"]
        shuffled = {k: host_samples[k][perm] for k in keys}
        perms = np.stack([np.random.permutation(T) for _ in range(total_bs)])
        row = np.arange(total_bs)[:, None]
        for k in ("latents", "next_latents", "log_probs", "ts"):
            shuffled[k] = shuffled[k][row, perms]
        batched = {
            k: v.reshape(n_batches, train_bs, *v.shape[1:])
            for k, v in shuffled.items()
        }
        infos = []
        for i in range(n_batches):
            batch = dict(
                latents=batched["latents"][i].swapaxes(0, 1),
                next_latents=batched["next_latents"][i].swapaxes(0, 1),
                log_probs=batched["log_probs"][i].swapaxes(0, 1),
                ts=batched["ts"][i].swapaxes(0, 1),
                prompt_embeds=batched["embeds"][i],
                uncond_embeds=np.asarray(host_samples["uncond_embeds"][:train_bs]),
                advantages=batched["advantages"][i],
            )
            state, info = jit_step(state, batch, sched_state)
            infos.append(info)
        infos = jax.tree_util.tree_map(
            lambda *xs: np.asarray(jax.device_get(jnp.stack(xs))), *infos
        )
        return state, infos

    state = make_state()
    np.random.seed(0)
    print("# compiling host-loop step", flush=True)
    # host path starts with the driver's post-sampling device_get; time it
    # inside the epoch on the first measured repeat below
    host_samples0 = {
        k: np.asarray(jax.device_get(v)) for k, v in device_samples.items()
    }
    state, _ = run_host(state, host_samples0)
    sync(state.step)
    t_host = float("inf")
    t_fetch = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        host_samples = {
            k: np.asarray(jax.device_get(v)) for k, v in device_samples.items()
        }
        t_fetch = min(t_fetch, time.perf_counter() - t0)
        state, infos_h = run_host(state, host_samples)
        sync(state.step)
        t_host = min(t_host, time.perf_counter() - t0)
    mem_host = mem_peak()

    traj_mb = sum(
        v.size * v.dtype.itemsize for v in device_samples.values()
    ) / 2**20
    line = {
        "metric": (
            f"PPO inner epoch at bs{bs} T{num_t} {res}px train_bs{train_bs}"
        ),
        "value": round(t_resident, 3),
        "unit": "s (resident, one dispatch)",
        "vs_baseline": round(t_host / t_resident, 3),
        "host_loop_s": round(t_host, 3),
        "host_fetch_s": round(t_fetch, 3),
        "resident_s": round(t_resident, 3),
        "n_dispatches_host": n_batches,
        "trajectory_mb": round(traj_mb, 1),
        "peak_hbm_gb_resident": mem_resident,
        "peak_hbm_gb_host": mem_host,
        "loss_resident": round(float(np.mean(infos_r["loss"])), 6),
        "loss_host": round(float(np.mean(infos_h["loss"])), 6),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(line))
    with open("bench_resident_results.json", "w") as f:
        json.dump(line, f, indent=2)
    return line


if __name__ == "__main__":
    main()
