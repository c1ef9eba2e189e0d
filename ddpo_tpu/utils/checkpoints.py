"""Full-train-state checkpointing (Orbax) + reference-compatible pickles.

The reference only saves UNet params (save_checkpoint_multiprocess of
state.params, pipeline/policy_gradient.py:457-464; unet_{epoch}.pkl for RWR,
utils/serialization.py:276-296) so a crashed run cannot truly resume. Here
the PG trainer checkpoints the complete state — params, optimizer state,
gradient-accumulation buffer, RNG key, epoch counter, per-prompt stat
buffers — with Orbax (async-friendly, multi-host aware), and also exposes
save_unet/load_unet_pickle for the RWR iteration chain's artifact format.
"""

from __future__ import annotations

import os
import pickle
import threading
from typing import Any, Optional

import jax
import numpy as np

from ddpo_tpu.utils import filesystem as fs


def _use_distributed_barriers() -> None:
    """Route Orbax's internal process syncs over the coordination service.

    Orbax brackets every save/restore with sync_global_processes; its
    default implementation is a DEVICE collective (process_allgather).
    The async checkpoint thread would then issue device collectives
    concurrently with the main thread's training collectives — the two
    processes' collective streams interleave differently and either cross
    data or deadlock (observed deterministically on the 2-process CPU
    harness: the epoch-1 train-infos allgather returned another tensor's
    bytes, and a later run deadlocked with the save thread parked inside
    process_allgather). The distributed barrier is a coordination-service
    RPC keyed by barrier name: thread-safe next to device collectives and
    timeout-bounded. Orbax gates it behind an absl flag.
    """
    import jax

    if jax.process_count() == 1:
        return
    from absl import flags

    f = flags.FLAGS
    if not f.is_parsed():
        f.mark_as_parsed()
    try:
        f.experimental_orbax_use_distributed_barrier = True
    except (AttributeError, flags.UnrecognizedFlagError):  # older orbax
        pass


def _checkpointer():
    import orbax.checkpoint as ocp

    _use_distributed_barriers()
    return ocp.PyTreeCheckpointer()


# in-flight async checkpoint writes (process-local); joined by
# wait_for_pending_saves() and before any restore
_PENDING: list = []
_PENDING_ERRORS: list = []


def wait_for_pending_saves() -> None:
    """Block until every async save_train_state write has landed on disk.

    Call before reading checkpoints back, syncing the savepath to a bucket
    at shutdown, or exiting the process. Re-raises the first error any
    background write hit — a silently-lost checkpoint must not look like a
    successful save.
    """
    while _PENDING:
        t = _PENDING.pop()
        t.join()
    if _PENDING_ERRORS:
        step, err = _PENDING_ERRORS.pop(0)
        _PENDING_ERRORS.clear()
        raise RuntimeError(f"async checkpoint write for step {step} failed") from err


def save_train_state(
    savepath: str, step: int, payload: Any, host_state: Any = None,
    all_workers: bool = False, block: bool = True,
) -> Optional[str]:
    """Write one full-state checkpoint under savepath/checkpoints/<step>.

    The train state is replicated across processes, so only process 0 writes
    (unless all_workers) — concurrent writers to the same path on a shared
    filesystem would collide. Reference parity: save_checkpoint_multiprocess
    at pipeline/policy_gradient.py:457-464 (also effectively process-gated
    for replicated params).

    host_state, if given, is pickled next to the Orbax dir
    (checkpoints/<step>_host.pkl): per-prompt stat buffers, reward-curve
    history, host RNG states — everything a true resume needs beyond the
    device state.

    block=False (SURVEY §5.4's "async write" target): the device->host
    transfer still happens synchronously — the caller's train step donates
    the state buffers, so they must be copied out before training resumes —
    but the serialization + disk write (the slow part at the 8.5GB SD-scale
    state) runs on a background thread. At most ONE write is in flight: a
    new async save joins the previous one first, bounding host memory to a
    single extra state copy. Write errors are re-raised at the next join
    (wait_for_pending_saves / the next save / any restore).
    """
    proc = jax.process_index()
    multiproc = jax.process_count() > 1
    if (
        proc != 0
        and not all_workers
        and host_state is None
        and not multiproc
    ):
        return None
    # at most one in-flight write; also surfaces any earlier write error
    wait_for_pending_saves()
    path = os.path.abspath(os.path.join(savepath, "checkpoints", str(step)))
    # Orbax's contract: in a multi-process runtime EVERY process calls
    # save() (it barriers internally and writes from the primary host
    # only) — a process-0-gated call desyncs its barrier sequence. The
    # replicated payload is host-materialized on every process.
    orbax_writer = proc == 0 or all_workers or multiproc
    if orbax_writer:
        payload = jax.tree_util.tree_map(np.asarray, jax.device_get(payload))
    # host_state is PER-PROCESS (np/python RNG states, local stat buffers):
    # every process persists its own file so a multi-host resume restores
    # each host's RNG stream exactly (process 0 keeps the unsuffixed name
    # for single-process back-compat)
    host_path = f"{path}_host.pkl" if proc == 0 else f"{path}_host_p{proc}.pkl"

    def _write():
        if orbax_writer:
            _checkpointer().save(path, payload, force=True)
        if host_state is not None:
            os.makedirs(os.path.dirname(host_path), exist_ok=True)
            with open(host_path, "wb") as f:
                pickle.dump(host_state, f)

    if block:
        _write()
        return path

    def _write_captured():
        try:
            _write()
        except Exception as e:  # re-raised at the next join
            _PENDING_ERRORS.append((step, e))

    t = threading.Thread(target=_write_captured, daemon=False, name=f"ckpt-{step}")
    t.start()
    _PENDING.append(t)
    return path


def latest_checkpoint_step(savepath: str) -> Optional[int]:
    wait_for_pending_saves()
    root = os.path.join(savepath, "checkpoints")
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


def prune_checkpoints(savepath: str, keep: int) -> int:
    """Delete all but the newest `keep` checkpoints; returns the count removed.

    The full train state is ~8.5GB at SD-1.4 scale (fp32 params + adamw
    moments); a long run with save_freq=10 would otherwise fill the disk.
    The reference never prunes (keep=1e6 at pipeline/policy_gradient.py:461).
    keep <= 0 disables pruning. Joins in-flight async writes first so a
    checkpoint still being written is never deleted from under its writer.
    """
    if keep <= 0:
        return 0
    wait_for_pending_saves()
    root = os.path.join(savepath, "checkpoints")
    if not os.path.isdir(root):
        return 0
    import shutil

    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    removed = 0
    import glob

    for step in steps[:-keep] if keep < len(steps) else []:
        shutil.rmtree(os.path.join(root, str(step)), ignore_errors=True)
        # every per-process host pickle; missing_ok guards the multi-host
        # shared-filesystem case where processes prune concurrently
        for host in glob.glob(os.path.join(root, f"{step}_host*.pkl")):
            try:
                os.remove(host)
            except FileNotFoundError:
                pass
        removed += 1
    return removed


def restore_train_state(savepath: str, step: Optional[int] = None, target: Any = None):
    """Restore the newest (or given) checkpoint; returns (None, None) if
    absent. If a <step>_host.pkl exists its contents are merged into the
    restored dict under the "host" key."""
    wait_for_pending_saves()
    if step is None:
        step = latest_checkpoint_step(savepath)
        if step is None:
            return None, None
    path = os.path.abspath(os.path.join(savepath, "checkpoints", str(step)))
    import orbax.checkpoint as ocp

    if target is not None:
        restored = _checkpointer().restore(
            path, args=ocp.args.PyTreeRestore(item=target)
        )
    else:
        restored = _checkpointer().restore(path)
    proc = jax.process_index()
    host_path = f"{path}_host.pkl" if proc == 0 else f"{path}_host_p{proc}.pkl"
    if proc != 0 and not os.path.exists(host_path):
        host_path = f"{path}_host.pkl"  # pre-round-4 checkpoints
    if os.path.exists(host_path):
        with open(host_path, "rb") as f:
            restored = dict(restored, host=pickle.load(f))
    return restored, step


# ---------------- reference-format UNet artifacts (RWR chain) ---------------- #


def save_unet(savepath: str, unet_params: Any, epoch: int = 0,
              all_workers: bool = False, cache: str = "logs"):
    """Pickle UNet params as unet_{epoch}.pkl (reference format)."""
    local_path = (
        os.path.join(cache, savepath.replace("gs://", ""))
        if fs.is_remote(savepath)
        else savepath
    )
    os.makedirs(local_path, exist_ok=True)
    fullpath = os.path.join(local_path, f"unet_{epoch}.pkl")

    params = jax.tree_util.tree_map(np.asarray, jax.device_get(unet_params))
    if jax.process_index() == 0 or all_workers:
        with open(fullpath, "wb") as f:
            pickle.dump(params, f)
        if fs.is_remote(savepath):
            with fs.open(os.path.join(savepath, f"unet_{epoch}.pkl"), mode="wb") as f:
                pickle.dump(params, f)
    return fullpath


def get_latest_epoch(loadpath: str) -> int:
    """Largest N among unet_N.pkl files under loadpath."""
    fnames = [f for f in fs.ls(loadpath) if f.startswith("unet_") and f.endswith(".pkl")]
    assert fnames, f"no unet_*.pkl under {loadpath}"
    return max(int(f.split("_")[-1].split(".pkl")[0]) for f in fnames)


def load_unet_pickle(loadpath: str, epoch="latest"):
    if epoch == "latest":
        epoch = get_latest_epoch(loadpath)
    fullpath = os.path.join(loadpath, f"unet_{epoch}.pkl")
    return fs.unpickle(fullpath)


def save_state(savepath: str, state) -> None:
    """Pickle a flax state dict (reference: utils/serialization.py:102-107)."""
    import flax.serialization

    fs.mkdir(savepath, fname=True)
    with open(savepath, "wb") as f:
        pickle.dump(flax.serialization.to_state_dict(jax.device_get(state)), f)


def load_state(loadpath: str, state):
    """Inverse of save_state (reference: utils/serialization.py:110-116)."""
    import flax.serialization

    with open(loadpath, "rb") as f:
        return flax.serialization.from_state_dict(state, pickle.load(f))
