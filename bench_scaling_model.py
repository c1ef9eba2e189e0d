"""Compile-measured inputs for the projected v5e-8 scaling model.

Single-chip hardware cannot time an 8-chip epoch, but the two quantities
the projection needs are knowable today:

  1. the sampler is communication-free under dp (shard_map over 'dp', no
     cross-shard ops) — verified here by compiling the sharded sampler on a
     virtual dp=8 mesh and counting ZERO collective bytes in its HLO;
  2. the train step's dp traffic: compile the shipped fused train step
     (bf16 compute, T-step scan, cfg_concat, fp32 master + adamw) on the
     same mesh at SD geometry and sum all-reduce bytes from the optimized
     HLO — this pins BOTH the bytes per update and WHERE XLA puts the
     all-reduce (once on the scan-summed gradient vs per scan iteration).

BASELINE.md's "projected multi-chip" section consumes these numbers; a
future real-pod run confirms or refutes them. Ref: SURVEY §2.12 comm
backend row; the reference's own dp story is pmap+psum
(/root/reference/pipeline/policy_gradient.py:223-464).

Run: python bench_scaling_model.py   (forces the virtual CPU mesh)
"""

from __future__ import annotations

import json
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from bench_sp_comms import collective_bytes  # same HLO-parsing methodology


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddpo_tpu.core import DDIMScheduler
    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.sampling import SamplerConfig, sample_trajectories_sharded
    from ddpo_tpu.parallel import MeshConfig, create_mesh
    from ddpo_tpu.training.policy_gradient import (
        AccumulatingTrainState,
        train_step_fused,
    )

    res = int(os.environ.get("SCALE_BENCH_RES", "512"))
    train_bs = int(os.environ.get("SCALE_BENCH_TRAIN_BS", "2"))
    num_t = int(os.environ.get("SCALE_BENCH_T", "10"))
    latent = res // 8
    mesh = create_mesh(MeshConfig(dp=8))
    dp = mesh.shape["dp"]

    model = UNet2DCondition(dtype=jnp.bfloat16)
    params_shape = jax.eval_shape(
        UNet2DCondition(dtype=jnp.float32).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]

    def repl(tree):
        sh = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh), tree
        )

    def dp_sharded(shape, dtype):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, P("dp"))
        )

    out = {"mesh": f"dp={dp}", "res": res}

    # ---- 1. sampler: shard_map over dp must be communication-free ---- #
    scheduler = DDIMScheduler()
    sched_state = scheduler.set_timesteps(scheduler.create_state(), 50)
    cfg = SamplerConfig(num_inference_steps=50, guidance_scale=5.0, eta=1.0,
                        height=res, width=res)

    def unet_apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    def sampler(p, ss, pe, ue, key):
        return sample_trajectories_sharded(
            mesh, unet_apply, p, scheduler, ss, pe, ue, key, cfg
        )

    with mesh:
        compiled = jax.jit(sampler).lower(
            repl(params_shape),
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=NamedSharding(mesh, P())),
                sched_state,
            ),
            dp_sharded((dp, 77, 768), jnp.bfloat16),
            dp_sharded((dp, 77, 768), jnp.bfloat16),
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=NamedSharding(mesh, P())),
        ).compile()
    sampler_coll = collective_bytes(compiled.as_text())
    out["sampler_collective_MB"] = round(
        sum(v["bytes"] for v in sampler_coll.values()) / 2**20, 3
    )
    out["sampler_collective_detail"] = {
        k: v["count"] for k, v in sampler_coll.items()
    }
    print(f"[ sampler dp8 ] collective MB: {out['sampler_collective_MB']}", flush=True)

    # ---- 2. fused train step: dp all-reduce bytes + placement ---- #
    @jax.checkpoint
    def apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    state_shape = jax.eval_shape(
        lambda p: AccumulatingTrainState.create(
            apply_fn=apply, params=p,
            tx=optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.adamw(1e-5, mu_dtype=jnp.bfloat16),
            ),
            accumulate=False,
        ),
        params_shape,
    )
    state_abs = repl(state_shape)
    b = train_bs * dp  # global batch; per-chip stays at the measured bs
    batch_abs = {
        "latents": dp_sharded((num_t, b, 4, latent, latent), jnp.float32),
        "next_latents": dp_sharded((num_t, b, 4, latent, latent), jnp.float32),
        "ts": dp_sharded((num_t, b), jnp.int32),
        "log_probs": dp_sharded((num_t, b), jnp.float32),
        "advantages": dp_sharded((b,), jnp.float32),
        "prompt_embeds": dp_sharded((b, 77, 768), jnp.float32),
        "uncond_embeds": dp_sharded((b, 77, 768), jnp.float32),
    }
    # batch axis is dim 1 under the leading timestep axis
    for k in ("latents", "next_latents", "ts", "log_probs"):
        batch_abs[k] = jax.ShapeDtypeStruct(
            batch_abs[k].shape, batch_abs[k].dtype,
            sharding=NamedSharding(mesh, P(None, "dp")),
        )
    step = functools.partial(
        train_step_fused, scheduler=scheduler, train_cfg=True,
        guidance_scale=5.0, eta=1.0, clip_range=2e-4, do_opt_update=True,
        cfg_concat=True,
    )
    with mesh:
        compiled = (
            jax.jit(step, donate_argnums=(0,))
            .lower(state_abs, batch_abs, repl(
                jax.eval_shape(lambda: scheduler.set_timesteps(
                    scheduler.create_state(), 50))
            ))
            .compile()
        )
    train_coll = collective_bytes(compiled.as_text())
    total_mb = sum(v["bytes"] for v in train_coll.values()) / 2**20
    ar_mb = sum(
        v["ops"].get("all-reduce", 0) + v["ops"].get("all-reduce-start", 0)
        for v in train_coll.values()
    ) / 2**20
    # placement check: grads for 859.5M params; fp32 sum = 3279 MB. If the
    # all-reduce bytes ~= one param tree, XLA reduced ONCE on the scan-summed
    # gradient; ~= num_t trees would mean per-iteration reduction.
    param_mb = sum(
        x.size * 4 for x in jax.tree_util.tree_leaves(params_shape)
    ) / 2**20
    out["train_T"] = num_t
    out["train_collective_MB"] = round(total_mb, 1)
    out["train_allreduce_MB"] = round(ar_mb, 1)
    out["param_tree_fp32_MB"] = round(param_mb, 1)
    out["allreduce_over_param_tree"] = round(ar_mb / param_mb, 2)
    out["train_collective_detail"] = {
        k: {"MB": round(v["bytes"] / 2**20, 1), "count": v["count"]}
        for k, v in train_coll.items()
    }
    print(json.dumps(out))
    with open("bench_scaling_model_results.json", "w") as f:
        json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
