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


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree onto the mesh, batch dim split over dp.

    Replaces the reference's reshape-based shard() helper — data goes
    straight to its device slice, no (n_devices, B/n, ...) reshaping.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


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
