"""Compile-measured dp all-reduce bytes: fp32 (default) vs bf16 grad reduce.

The scaling model's one dp cost is the gradient all-reduce — ONE fp32 param
tree (3.28 GB at SD-1.4 scale) per update (bench_scaling_model.py). Casting
grads to bf16 BEFORE the reduce (train_step_fused grad_reduce_dtype, a
shard_map-over-dp psum) should halve that. Single-chip hardware can't time
the pod, but the wire bytes are a compile-time fact: AOT-compile the exact
shipped fused train step for a v5e-8 TPU TOPOLOGY (jax.experimental.
topologies — no chips needed, the real TPU backend optimizes the HLO) at SD
geometry in both modes and sum the optimized-HLO collective bytes (parsing
as in bench_sp_comms.py).

The TPU topology target matters: XLA:CPU rewrites every bf16 all-reduce to
convert->f32 all-reduce->convert (its gloo collectives run at f32), so a
virtual-CPU-mesh measurement shows 1.0x — a backend artifact, verified by
HLO inspection. XLA:TPU keeps the bf16 all-reduce (ICI reduces natively at
bf16). GRAD_REDUCE_BACKEND=cpu forces the old CPU path for comparison.

The learning-parity leg runs separately on the real chip (bf16-rounded
grads vs fp32 at the measured recipe); tests/test_grad_reduce.py pins the
per-step numerics.

Ref: the fp32 pmean being replaced,
/root/reference/ddpo/training/policy_gradient.py:141-142.

Run: python bench_grad_reduce.py   (on-TPU env: keep /root/.axon_site)
Env: SCALE_BENCH_RES (512), SCALE_BENCH_TRAIN_BS (2), SCALE_BENCH_T (10),
     GRAD_REDUCE_TOPO (v5e:2x4), GRAD_REDUCE_BACKEND (tpu|cpu).
"""

from __future__ import annotations

import json
import os

if os.environ.get("GRAD_REDUCE_BACKEND", "tpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

from bench_sp_comms import collective_bytes  # same HLO-parsing methodology


def _mesh_dp8():
    """dp=8 mesh: a v5e-8 AOT topology (preferred) or 8 virtual CPUs."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if os.environ.get("GRAD_REDUCE_BACKEND", "tpu") == "tpu":
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu",
            topology_name=os.environ.get("GRAD_REDUCE_TOPO", "v5e:2x4"),
        )
        devices = np.array(topo.devices)
        target = devices[0].device_kind
    else:
        devices = np.array(jax.devices())
        target = "virtual cpu (bf16 all-reduce promoted to f32 by XLA:CPU)"
    assert devices.size == 8, devices
    return Mesh(devices.reshape(8, 1, 1), ("dp", "sp", "tp")), target


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddpo_tpu.core import DDIMScheduler
    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.training.policy_gradient import (
        AccumulatingTrainState,
        train_step_fused,
    )

    from ddpo_tpu.ops import (
        set_conv_kernel_enabled,
        set_flash_enabled,
        set_gn_stats_kernel_enabled,
    )

    # AOT topology compile (no chips attached): Mosaic custom-calls can't be
    # auto-partitioned by GSPMD, so force the XLA paths for every Pallas op
    # (attention, conv3x3, GN stats). The grad pytree — and therefore the
    # all-reduce bytes being measured — is identical under either impl.
    set_flash_enabled(False)
    set_conv_kernel_enabled(False)
    set_gn_stats_kernel_enabled(False)

    res = int(os.environ.get("SCALE_BENCH_RES", "512"))
    train_bs = int(os.environ.get("SCALE_BENCH_TRAIN_BS", "2"))
    num_t = int(os.environ.get("SCALE_BENCH_T", "10"))
    latent = res // 8
    mesh, target = _mesh_dp8()
    print(f"[ bench_grad_reduce ] target: {target}", flush=True)
    dp = mesh.shape["dp"]
    scheduler = DDIMScheduler()

    model = UNet2DCondition(dtype=jnp.bfloat16)
    params_shape = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, latent, latent)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 768)),
        )
    )["params"]

    def repl(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(mesh, P())
            ),
            tree,
        )

    def dp_sharded(shape, dtype, axis=0):
        spec = [None] * len(shape)
        spec[axis] = "dp"
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, P(*spec))
        )

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
    b = train_bs * dp
    batch_abs = {
        "latents": dp_sharded((num_t, b, 4, latent, latent), jnp.float32, 1),
        "next_latents": dp_sharded(
            (num_t, b, 4, latent, latent), jnp.float32, 1
        ),
        "ts": dp_sharded((num_t, b), jnp.int32, 1),
        "log_probs": dp_sharded((num_t, b), jnp.float32, 1),
        "advantages": dp_sharded((b,), jnp.float32),
        "prompt_embeds": dp_sharded((b, 77, 768), jnp.float32),
        "uncond_embeds": dp_sharded((b, 77, 768), jnp.float32),
    }
    sched_abs = repl(
        jax.eval_shape(
            lambda: scheduler.set_timesteps(scheduler.create_state(), 50)
        )
    )
    param_mb = sum(
        x.size * 4 for x in jax.tree_util.tree_leaves(params_shape)
    ) / 2**20

    out = {
        "mesh": f"dp8 ({target})",
        "geometry": f"{res}px bs{train_bs}/chip T{num_t}",
        "param_tree_fp32_MB": round(param_mb, 1),
    }

    def measure(tag, **grad_kwargs):
        step = functools.partial(
            train_step_fused, scheduler=scheduler, train_cfg=True,
            guidance_scale=5.0, eta=1.0, clip_range=2e-4,
            do_opt_update=True, cfg_concat=True, **grad_kwargs,
        )
        with mesh:
            compiled = (
                jax.jit(step, donate_argnums=(0,))
                .lower(state_abs, batch_abs, sched_abs)
                .compile()
            )
        coll = collective_bytes(compiled.as_text())
        total_mb = sum(v["bytes"] for v in coll.values()) / 2**20
        ar_mb = sum(
            v["ops"].get("all-reduce", 0) + v["ops"].get("all-reduce-start", 0)
            for v in coll.values()
        ) / 2**20
        out[f"{tag}_collective_MB"] = round(total_mb, 1)
        out[f"{tag}_allreduce_MB"] = round(ar_mb, 1)
        out[f"{tag}_detail"] = {
            k: {"MB": round(v["bytes"] / 2**20, 1), "count": v["count"],
                "ops": {o: round(bb / 2**20, 1) for o, bb in v["ops"].items()}}
            for k, v in coll.items()
        }
        print(f"[ {tag} ] collective MB: {round(total_mb,1)} "
              f"(all-reduce {round(ar_mb,1)})", flush=True)
        return total_mb

    fp32_mb = measure("fp32_default")
    bf16_mb = measure(
        "bf16_reduce", grad_reduce_mesh=mesh, grad_reduce_dtype=jnp.bfloat16
    )

    out["bf16_traffic_ratio"] = round(fp32_mb / max(bf16_mb, 1e-9), 2)
    line = {
        "metric": "dp grad all-reduce traffic, bf16 vs fp32 (compile-measured)",
        "value": out["bf16_traffic_ratio"],
        "unit": "x less collective MB per update",
        "vs_baseline": out["bf16_traffic_ratio"],
    }
    print(json.dumps(line))
    with open("bench_grad_reduce_results.json", "w") as f:
        json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()


