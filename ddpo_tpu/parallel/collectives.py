"""Cross-device/cross-host reductions and consistency checks.

TPU-native equivalents of the reference's pmap-based helpers:
  - worker_sum: utils/array.py:22-29 (pmapped psum of a host scalar)
  - distributed softmax: utils/array.py:44-55 (pmax/psum softmax)
  - sync assertion: multihost_utils.assert_equal at
    pipeline/policy_gradient.py:442

Here they are jit/NamedSharding-based and also work on a virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddpo_tpu.parallel.mesh import batch_sharding, replicated


def worker_sum(mesh: Mesh, value: float) -> float:
    """Global sum of one scalar per process (reference: worker_sum).

    Single-process fallback just returns the value; multi-process uses a
    psum over one device per process via multihost allgather.
    """
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(value))
    return float(np.sum(gathered))


def softmax_ref(x: np.ndarray, temperature: float = 1.0) -> np.ndarray:
    """Sequential oracle (reference: utils/array.py:32-41)."""
    assert x.ndim == 1
    x = x * temperature
    z = x - x.max()
    numer = np.exp(z)
    return numer / numer.sum()


def sharded_softmax(mesh: Mesh, x: jnp.ndarray, temperature: float = 1.0):
    """Softmax over a dp-sharded vector; max/sum reduce over the mesh.

    Replaces the pmapped pmax/psum softmax. Under jit with a sharded input,
    jnp.max/jnp.sum lower to XLA all-reduces across dp automatically.
    """

    @functools.partial(
        jax.jit,
        in_shardings=(batch_sharding(mesh),),
        out_shardings=batch_sharding(mesh),
    )
    def _softmax(x):
        z = x * temperature
        z = z - jnp.max(z)
        numer = jnp.exp(z)
        return numer / jnp.sum(numer)

    return _softmax(x)


def all_processes_equal(tree, name: str = "tree") -> None:
    """Divergence check across hosts (reference: assert_equal on train infos)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.assert_equal(tree, name)


def process_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes via the coordination service (no device work).

    Cross-process CPU collectives establish their gloo communicators lazily
    at a program's FIRST execution, under a hard 30s key-value rendezvous
    deadline inside the runtime. Hosts drift (compiles, per-host work:
    checkpoints, reward callbacks, metrics), and a host arriving >30s late
    at a new collective program kills the run. A coordination-service
    barrier costs one RPC, tolerates ``timeout_ms`` of skew, and brings
    every process to the phase boundary together — the drivers call it
    before each phase that first executes a new global-mesh program. The
    same pattern protects real pods where hosts compile/checkpoint at
    different speeds (megascale init has analogous deadlines). ``name``
    must be unique per use (the service rejects reused barrier ids).
    """
    if jax.process_count() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # processes launched without jax.distributed
        return
    client.wait_at_barrier(name, timeout_ms)


def warmup_collectives(mesh: Mesh) -> None:
    """Eagerly establish the cross-process communicator for ``mesh``.

    CPU multi-process collectives create their gloo context lazily at the
    first execution of a program over a new device clique, under a hard 30s
    rendezvous deadline — but contexts are cached PER CLIQUE, so one tiny
    all-reduce over the full mesh now (while hosts are seconds apart, right
    after distributed init) means every later program over this mesh —
    including the train step that first executes after minutes of
    host-skewed compilation — reuses the established context. Pairs with
    process_barrier (which bounds the skew at phase boundaries). No-op
    single-process, cheap always (one scalar-ish all-reduce).
    """
    if jax.process_count() == 1:
        return
    n = mesh.devices.size
    x = jax.device_put(
        np.ones((n,), np.float32), NamedSharding(mesh, P(mesh.axis_names))
    )
    # sum over a fully-sharded array -> one all-reduce across every device
    np.asarray(jax.jit(jnp.sum)(x))


def n_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def sync_state_across_devices(mesh: Mesh, state):
    """Broadcast one replica's pytree to all devices (reference
    utils/array.py:8-15's psum-select). Under NamedSharding this is just a
    replicated device_put of the host copy."""
    host_state = jax.device_get(state)
    return jax.device_put(host_state, replicated(mesh))
