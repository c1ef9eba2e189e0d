"""Measure sp-axis collective traffic: sp_mode=attention vs spatial.

Single-chip hardware can't time a real sp mesh, but the communication
volume each mode puts on the wire is a compile-time fact: lower the exact
driver programs (one CFG UNet forward = the sampler-scan body, and one
grad step = the train-scan body) on a virtual dp=4 x sp=2 mesh at full
SD-1.4 512px geometry, with abstract ShapeDtypeStruct inputs so nothing
ever executes, then sum the bytes of every collective in the OPTIMIZED
post-SPMD HLO, classified by replica group:

  - size-2 groups  -> sp-axis collectives (the quantity under test)
  - size-4 groups  -> dp-axis (identical role in both modes: grad psum)
  - size-8 groups  -> whole-mesh

The claim under test is parallel/spatial.py:1-32: the spatial (halo) mode
moves ~32x less sp-axis traffic than the attention mode, whose convs run
on GSPMD-gathered full feature maps. Whichever wins sets the
`sp_mode` default in config/base.py.

Methodology notes: bytes are the HLO result-shape bytes of each collective
op (all-gather counts the gathered output, i.e. n/(n-1) x the per-device
wire bytes; collective-permute counts the permuted tensor). Both modes are
counted identically, so the ratio is meaningful even if the absolute wire
bytes differ by the constant factor. The dp-axis numbers double as a check
that the two programs are otherwise equivalent.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python bench_sp_comms.py
Ref workload: the sampler/train bodies these programs mirror are
pipelines/policy_gradient.py:124-153 and training/policy_gradient.py.
"""

from __future__ import annotations

import json
import os
import re
import time

# compile-only measurement: force the virtual CPU mesh even when a real
# TPU backend is configured in the ambient environment
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4,
    "u16": 2, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLLECTIVES = (
    "all-gather", "all-reduce", "collective-permute", "reduce-scatter",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    """Sum bytes over every 'dtype[dims]' in an HLO result type (incl tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str, n_devices: int) -> int:
    """Infer the replica-group size of a collective HLO line."""
    m = re.search(r"replica_groups=\{\{([^}]*)\}", line)
    if m:
        return len(m.group(1).split(","))
    # iota format: replica_groups=[4,2]<=[2,4]T(1,0) -> groups of size 2
    m = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
    if m:
        return int(m.group(2))
    return n_devices


def collective_bytes(hlo_text: str, n_devices: int = 8):
    """Bytes of collective results in optimized HLO, keyed by group size."""
    out = {}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\([^)]*\)|[\w\[\],{}: ]+?) ([\w\-]+)\(", line)
        if not m:
            continue
        op = m.group(2)
        if op.rstrip("-start") not in _COLLECTIVES and op not in _COLLECTIVES:
            continue
        size = _group_size(line, n_devices)
        b = _shape_bytes(m.group(1))
        key = f"group{size}"
        d = out.setdefault(key, {"bytes": 0, "count": 0, "ops": {}})
        d["bytes"] += b
        d["count"] += 1
        d["ops"][op] = d["ops"].get(op, 0) + b
    return out


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.ops import set_attention_sharding
    from ddpo_tpu.parallel import MeshConfig, create_mesh
    from ddpo_tpu.parallel.spatial import make_spatial_unet_apply

    res = int(os.environ.get("SP_BENCH_RES", "512"))
    per_dev_bs = int(os.environ.get("SP_BENCH_BS", "1"))
    latent = res // 8
    mesh = create_mesh(MeshConfig(dp=4, sp=2))
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    bs = per_dev_bs * dp  # global batch; CFG doubles it inside the forward

    model = UNet2DCondition(dtype=jnp.bfloat16)
    params_shape = jax.eval_shape(
        UNet2DCondition(dtype=jnp.float32).init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, latent, latent)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)),
    )["params"]

    def abstract(tree, spec):
        sh = NamedSharding(mesh, spec)
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh), tree
        )

    # CFG forward: the sampler-scan body (2B batch: cond + uncond halves)
    x = jax.ShapeDtypeStruct(
        (2 * bs, 4, latent, latent), jnp.bfloat16,
        sharding=NamedSharding(mesh, P("dp")),
    )
    x_sp = jax.ShapeDtypeStruct(
        (2 * bs, 4, latent, latent), jnp.bfloat16,
        sharding=NamedSharding(mesh, P("dp", None, "sp")),
    )
    t = jax.ShapeDtypeStruct(
        (2 * bs,), jnp.int32, sharding=NamedSharding(mesh, P("dp"))
    )
    ctx = jax.ShapeDtypeStruct(
        (2 * bs, 77, 768), jnp.bfloat16, sharding=NamedSharding(mesh, P("dp"))
    )
    p_repl = abstract(params_shape, P())

    results = {}
    for mode in ("attention", "spatial"):
        with mesh:
            if mode == "attention":
                set_attention_sharding(mesh, batch_axis="dp", seq_axis="sp")
                apply = lambda p, a, b, c: model.apply({"params": p}, a, b, c)
                xs = x
            else:
                set_attention_sharding(None)
                apply = make_spatial_unet_apply(mesh, model)
                xs = x_sp

            def fwd(p, a, b, c):
                return apply(p, a, b, c)

            body = jax.checkpoint(apply)

            def train(p, a, b, c):
                # grad of the PPO recompute body: same UNet fwd+bwd per
                # (sample, timestep) as train_step_fused's scan body
                def loss(q):
                    return jnp.mean(body(q, a, b, c).astype(jnp.float32) ** 2)

                return jax.grad(loss)(p)

            entry = {}
            for name, fn, args in (
                ("sampler_fwd", fwd, (p_repl, xs, t, ctx)),
                ("train_grad", train, (p_repl, xs, t, ctx)),
            ):
                t0 = time.time()
                compiled = jax.jit(fn).lower(*args).compile()
                text = "\n".join(
                    m.to_string() for m in compiled.runtime_executable().hlo_modules()
                ) if hasattr(compiled, "runtime_executable") else compiled.as_text()
                by_group = collective_bytes(text)
                entry[name] = {
                    "compile_s": round(time.time() - t0, 1),
                    "by_group": {
                        k: {
                            "MB": round(v["bytes"] / 2**20, 2),
                            "count": v["count"],
                            "ops_MB": {
                                o: round(b / 2**20, 2)
                                for o, b in v["ops"].items()
                            },
                        }
                        for k, v in sorted(by_group.items())
                    },
                    "sp_MB": round(
                        by_group.get(f"group{sp}", {"bytes": 0})["bytes"] / 2**20, 2
                    ),
                }
                print(f"[ {mode}/{name} ] {json.dumps(entry[name])}", flush=True)
            set_attention_sharding(None)
            results[mode] = entry

    ratio = {
        k: round(
            results["attention"][k]["sp_MB"]
            / max(results["spatial"][k]["sp_MB"], 1e-9),
            1,
        )
        for k in ("sampler_fwd", "train_grad")
    }
    line = {
        "metric": f"sp-axis collective MB per UNet call at {res}px (dp4xsp2)",
        "attention": {k: v["sp_MB"] for k, v in results["attention"].items()},
        "spatial": {k: v["sp_MB"] for k, v in results["spatial"].items()},
        "attention_over_spatial": ratio,
        "detail": results,
    }
    print(json.dumps(line))
    with open("bench_sp_comms_results.json", "w") as f:
        json.dump(line, f, indent=2)
    return line


if __name__ == "__main__":
    main()
