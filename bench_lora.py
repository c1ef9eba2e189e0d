"""Benchmark: LoRA vs full-finetune PPO update at production geometry.

Both variants run the SHIPPED fast path (fused timestep scan, bf16
compute, cfg_concat). The full-finetune variant is the pg-driver default
state: fp32 master params + adafactor (adamw's 2x fp32 moments do not fit
a 16GB v5e next to the 3.4GB master copy — the reference's own config
offers adafactor for this reason). The LoRA variant is `--lora_rank 8`:
bf16 FROZEN base params (no fp32 master needed for weights that never
update) + fp32 rank-8 adapters with full adamw.

Reports step latency, trainable-state bytes, and the total optimizer+param
state each keeps in HBM. The latency claim to check: merge-at-apply adds
only rank-r matmuls, so the LoRA step should be ~= the full step minus the
860M-param optimizer update.

Env: TRAIN_BENCH_BS (default 2), TRAIN_BENCH_T (default 10),
LORA_BENCH_RANK (default 8), TRAIN_BENCH_RES.
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
    from ddpo_tpu.models.lora import init_lora, merge_lora, n_lora_params
    from ddpo_tpu.training.policy_gradient import (
        AccumulatingTrainState,
        train_step_fused,
    )

    bs = int(os.environ.get("TRAIN_BENCH_BS", "2"))
    num_t = int(os.environ.get("TRAIN_BENCH_T", "10"))
    res = int(os.environ.get("TRAIN_BENCH_RES", "512"))
    rank = int(os.environ.get("LORA_BENCH_RANK", "8"))
    latent = res // 8

    model = UNet2DCondition(dtype=jnp.bfloat16)

    params = jax.jit(UNet2DCondition(dtype=jnp.float32).init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))

    scheduler = DDIMScheduler()
    sched_state = scheduler.set_timesteps(scheduler.create_state(), 50)

    key = jax.random.PRNGKey(1)
    batch_t = {
        "latents": jax.random.normal(key, (num_t, bs, 4, latent, latent)),
        "next_latents": jax.random.normal(key, (num_t, bs, 4, latent, latent)),
        "ts": jnp.tile(
            jnp.arange(1, 982, 980 // max(1, num_t - 1))[:num_t, None], (1, bs)
        ),
        "log_probs": jnp.zeros((num_t, bs)),
        "advantages": jnp.ones((bs,)),
        "prompt_embeds": jax.random.normal(key, (bs, 77, 768)),
        "uncond_embeds": jnp.zeros((bs, 77, 768)),
    }
    kwargs = dict(
        scheduler=scheduler, train_cfg=True, guidance_scale=5.0, eta=1.0,
        clip_range=2e-4, do_opt_update=True, cfg_concat=True,
    )

    def sync(x):
        jax.device_get(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
        )

    def time_steps(step, state):
        state, _ = step(state, batch_t, sched_state)  # compile
        sync(state.step)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, _ = step(state, batch_t, sched_state)
            sync(state.step)
            best = min(best, time.perf_counter() - t0)
        return best, state

    # ---- full finetune (shipped default state: fp32 master + adafactor) ----
    @jax.checkpoint
    def apply_full(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    state_full = AccumulatingTrainState.create(
        apply_fn=apply_full,
        params=jax.tree_util.tree_map(jnp.asarray, params),
        tx=optax.chain(optax.clip_by_global_norm(1.0), optax.adafactor(1e-5)),
        accumulate=False,
    )
    full_step = jax.jit(
        functools.partial(train_step_fused, **kwargs), donate_argnums=(0,)
    )
    full_trainable = nbytes(state_full.params)
    print("# measuring full-finetune fused bf16 step", flush=True)
    t_full, state_full = time_steps(full_step, state_full)
    full_state_bytes = nbytes(state_full)
    del state_full
    import gc

    gc.collect()
    jax.clear_caches()

    # ---- lora: bf16 frozen base + fp32 rank-r adapters with full adamw ----
    base16 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), params
    )
    lora0 = init_lora(base16, rank, jax.random.PRNGKey(2))

    # remat only the UNet body; the frozen base rides in as the step's
    # `frozen` RUNTIME kwarg (as in the drivers). A closure over the
    # concrete base tree embeds ~1.7GB of bf16 HLO constants — lowering
    # alone took >15 min and the multi-GB program crashed the XLA compile
    # service twice (round 4).
    @jax.checkpoint
    def _unet_body(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    def apply_lora(base, lp, latents, t, context):
        return _unet_body(merge_lora(base, lp), latents, t, context)

    state_lora = AccumulatingTrainState.create(
        apply_fn=apply_lora,
        params=lora0,
        tx=optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(1e-4, weight_decay=1e-4)
        ),
        accumulate=False,
    )
    lora_step = jax.jit(
        functools.partial(train_step_fused, **kwargs), donate_argnums=(0,)
    )
    print("# measuring lora fused bf16 step", flush=True)
    t_lora, state_lora = time_steps(
        functools.partial(lora_step, frozen=base16), state_lora
    )

    per = lambda t: round(t / (bs * num_t) * 1e3, 3)
    line = {
        "metric": f"LoRA r={rank} PG update per (sample, timestep) at {res}px",
        "value": per(t_lora),
        "unit": "ms",
        "vs_baseline": round(t_full / t_lora, 3),
        "full_ms": per(t_full),
        "trainable_params_lora": n_lora_params(lora0),
        "trainable_mb_lora": round(nbytes(lora0) / 2**20, 1),
        "trainable_mb_full": round(full_trainable / 2**20, 1),
        "state_mb_lora": round(nbytes(state_lora) / 2**20, 1),
        "state_mb_full": round(full_state_bytes / 2**20, 1),
        # total resident weights+optimizer HBM: lora keeps the frozen base
        # in bf16 (no fp32 master for weights that never update)
        "total_mb_lora": round((nbytes(state_lora) + nbytes(base16)) / 2**20, 1),
        "total_mb_full": round(full_state_bytes / 2**20, 1),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(line))
    return line


if __name__ == "__main__":
    main()
