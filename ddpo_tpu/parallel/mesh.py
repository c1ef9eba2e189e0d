"""Device mesh and sharding helpers: jit + NamedSharding instead of pmap.

The reference parallelizes exclusively with jax.pmap + flax replicate +
reshape-based shard/unshard (SURVEY.md 2.12, utils/preprocessing.py:35-53).
Here a single jax.sharding.Mesh spans the pod:

  axes ('dp', 'sp', 'tp'):
    dp — data parallelism over ICI (and DCN for multi-slice: put the slower
         network on the outermost dimension of the device array).
    sp — sequence parallelism for the latent self-attention (query sequence
         split, K/V gathered per shard; ops/attention.set_attention_sharding
         and parallel/sequence.py).
    tp — tensor parallelism for the UNet (attention heads / conv channels),
         via GSPMD sharding constraints (see parallel/sharding.py).

Gradients all-reduce automatically: with batch inputs sharded over 'dp' and
parameters replicated (or tp-sharded), XLA inserts the psum on the backward
pass — the explicit jax.lax.pmean("batch") of the reference
(training/policy_gradient.py:141-142) disappears.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1  # -1: all remaining devices
    sp: int = 1  # sequence parallelism (latent self-attention query dim)
    tp: int = 1


def create_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build the ('dp', 'sp', 'tp') mesh over the given (default: all) devices.

    Uses mesh_utils to order devices along the physical ICI topology (tp/sp
    on the innermost/fastest links — their collectives run per attention
    call — dp across hosts/DCN on the outer dim); falls back to a plain
    reshape for explicit device lists and virtual CPU meshes.
    """
    n = len(devices) if devices is not None else len(jax.devices())
    tp, sp = config.tp, config.sp
    dp = config.dp if config.dp != -1 else n // (tp * sp)
    if dp * sp * tp != n:
        raise ValueError(f"mesh {dp}x{sp}x{tp} != {n} devices")

    if devices is None:
        try:
            from jax.experimental import mesh_utils

            mesh_devices = mesh_utils.create_device_mesh((dp, sp, tp))
            return Mesh(mesh_devices, ("dp", "sp", "tp"))
        except Exception:
            devices = jax.devices()
    devices = np.asarray(devices)
    return Mesh(devices.reshape(dp, sp, tp), ("dp", "sp", "tp"))


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_vma vs check_rep keyword).

    jax >= 0.8 exports jax.shard_map taking check_vma; some intermediate
    versions export jax.shard_map but still take check_rep (TypeError at
    call); older versions only have jax.experimental.shard_map. One shim,
    shared by every shard_map call site (sampler, sequence parallelism).
    """
    try:
        from jax import shard_map  # jax >= 0.8

        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except (ImportError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batched tensors."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a host pytree onto the mesh, batch dim split over dp.

    Replaces the reference's reshape-based shard() helper — data goes
    straight to its device slice, no (n_devices, B/n, ...) reshaping.

    CONTRACT (multi-host): the input is the PER-PROCESS LOCAL batch — each
    process passes its own samples/prompts (reference per-worker semantics,
    pipeline/policy_gradient.py:223-464) and the global array is assembled
    from the local shards (host_local_array_to_global_array). On a single
    process local == global and this is a plain device_put slice.

    batch_axis: which dim is the dp-sharded batch dim (0 for (B, ...)
    tensors, 1 for the fused trainer's (T, B, ...) layout).
    """
    spec = P(*([None] * batch_axis + ["dp"]))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec
            ),
            batch,
        )
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def local_shard(x) -> np.ndarray:
    """Fetch the process-local rows of a global batch-dp-sharded array.

    Inverse of shard_batch for host-side consumers (reward scoring, artifact
    dumps): multi-host processes cannot device_get non-addressable shards,
    so each takes its own contiguous dp slice (addressable shards, ordered
    by batch offset and deduplicated — replicated-over-sp/tp arrays carry
    one copy per local device). Single process: plain device_get.
    """
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(x))
    shards = [
        s for s in x.addressable_shards
    ]
    seen, parts = set(), []
    for s in sorted(shards, key=lambda s: s.index[0].start or 0):
        start = s.index[0].start or 0
        if start in seen:
            continue  # replicated copy over a non-batch mesh axis
        seen.add(start)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=0)


def jit_concat(xs, axis: int = 0):
    """Concatenate global (possibly non-addressable) arrays on device.

    Eager jnp.concatenate fails on multi-host global arrays; a jitted
    concat is a legal SPMD program. Pass-through for a single input.
    """
    if len(xs) == 1:
        return xs[0]
    return jax.jit(lambda *ys: jax.numpy.concatenate(ys, axis=axis))(*xs)


def local_batch_size(mesh: Mesh, per_device: int) -> int:
    """Per-process batch size for a given per-device size."""
    return per_device * mesh.local_mesh.devices.size


def global_batch_size(mesh: Mesh, per_device: int) -> int:
    return per_device * mesh.devices.size


def maybe_initialize_distributed() -> bool:
    """jax.distributed.initialize() when a multi-process env is detected.

    The reference calls initialize() unconditionally at import
    (pipeline/sample.py:4, pipeline/finetune.py:3), which only works on TPU
    pods. Here drivers call this guard: explicit coordinator env vars or a
    Cloud TPU pod environment trigger initialization; single-process runs
    skip it.
    """
    import os

    if jax.process_count() > 1:
        return True  # already initialized
    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    pod = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = "," in pod
    if explicit or multi_worker:
        jax.distributed.initialize()
        return True
    return False
