"""Two-process preemption e2e: SIGTERM both hosts mid-epoch, resume bit-exact.

A pod preemption SIGTERMs every host at once. The single-process test
(test_resume_and_sync.py::test_sigterm_checkpoints_and_resumes) covers the
signal -> epoch-boundary checkpoint -> resume path in one process; this one
runs the REAL multi-host machinery end to end: the PG driver in two
jax.distributed processes (2 local CPU devices each, dp=4 across both),
a deterministic SIGTERM raised in BOTH processes during epoch 1, an
all-hosts Orbax checkpoint (Orbax's multi-process contract; it
primary-gates the actual write), then a two-process --resume whose reward
curve and train losses must match an uninterrupted two-process run
exactly — plus a cross-process consistency check that every process
restores an IDENTICAL tree from the newest checkpoint.

Reference gap: the reference's multi-process save
(pipeline/policy_gradient.py:457-464) checkpoints params only and has no
resume or preemption story at all.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
workdir, mode, epochs = sys.argv[3], sys.argv[4], sys.argv[5]
os.chdir(workdir)
assert jax.process_count() == 2 and len(jax.devices()) == 4

# Establish the Gloo CPU-collectives context NOW, while the processes are
# seconds apart: on a contended host the first cross-process collective can
# otherwise land after one process has spent >30s compiling (this box has 1
# core) and the peer's gloo context-init KV rendezvous times out. Real pods
# hit the same pattern when hosts compile at different speeds.
import numpy as np
from jax.experimental import multihost_utils

multihost_utils.process_allgather(np.ones(1), tiled=True)

if mode == "preempt":
    # deterministic pod preemption: BOTH processes SIGTERM themselves at
    # epoch 1's prompt generation (the same trigger the single-process
    # test uses), so the drivers hit the epoch boundary together
    import signal
    from ddpo_tpu import training

    real_make_prompts = training.make_prompts
    calls = {"n": 0}

    def sigterm_on_second_call(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return real_make_prompts(*a, **kw)

    training.make_prompts = sigterm_on_second_call

from ddpo_tpu.pipelines import policy_gradient

args = [
    "--dataset", "debug-animals",
    "--n_inference_steps", "2",
    "--resolution", "32",
    "--sample_batch_size", "2",
    "--train_batch_size", "1",
    "--save_freq", "1",
    "--per_prompt_stats_bufsize", "8",
    "--per_prompt_stats_min_count", "2",
    "--num_train_epochs", epochs,
]
if mode == "resume":
    args += ["--resume", "True"]
rewards = policy_gradient.main(args)
print(f"REWARDS_{jax.process_index()} " + json.dumps([float(r) for r in rewards]))

# cross-process checkpoint consistency (beyond the reference's
# multiprocess save, pipeline/policy_gradient.py:457-464): every process
# restores the newest checkpoint and the restored trees must be IDENTICAL
# across hosts — not just the reward curves
from ddpo_tpu.utils.checkpoints import restore_train_state
from ddpo_tpu.parallel.collectives import all_processes_equal

restored, step = restore_train_state("bucket/logs/debug-animals/models/pg")
assert restored is not None
all_processes_equal(restored["state"], f"restored train state (step {step})")
all_processes_equal(np.asarray(restored["rng"]), "restored rng")
print(f"CKPT_CONSISTENT_{jax.process_index()} step={step}")
"""


def _run_pair(tmp_path, workdir, mode, epochs):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "pg_worker.py"
    script.write_text(WORKER)
    os.makedirs(workdir, exist_ok=True)

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["DDPO_BUCKET"] = "bucket"
    # 2 local devices per process; share the suite's warm compile cache
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
    env.setdefault(
        "DDPO_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(i), str(workdir),
             mode, str(epochs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=600)
        outs.append(out)
        assert proc.returncode == 0, f"{mode} worker {i} failed:\n{out[-4000:]}"
    rewards = []
    for i, out in enumerate(outs):
        marker = [l for l in out.splitlines() if l.startswith(f"REWARDS_{i} ")]
        assert marker, f"{mode} worker {i} printed no rewards:\n{out[-2000:]}"
        rewards.append(json.loads(marker[0].split(" ", 1)[1]))
        assert any(
            l.startswith(f"CKPT_CONSISTENT_{i}") for l in out.splitlines()
        ), f"{mode} worker {i} checkpoint consistency check missing:\n{out[-2000:]}"
    return rewards


def _logdir(workdir):
    """Checkpoint root (the driver's savepath)."""
    root = workdir / "bucket" / "logs" / "debug-animals" / "models" / "pg"
    assert root.is_dir(), f"driver artifacts missing under {root}"
    return root


def _locallog(workdir):
    """Per-run artifact dir (the driver's localpath: train_info, curves)."""
    root = (
        workdir / "logs" / "bucket" / "logs" / "debug-animals" / "models" / "pg"
    )
    assert root.is_dir(), f"driver local artifacts missing under {root}"
    return root


def _train_losses(logdir):
    out = {}
    for f in sorted((logdir / "train_info").iterdir()):
        out[f.name] = np.load(f, allow_pickle=True).item()["loss"]
    return out


@pytest.mark.slow
def test_two_process_preemption_resume_matches_uninterrupted(tmp_path):
    # uninterrupted 2-process 3-epoch run
    full_dir = tmp_path / "run_full"
    rewards_full = _run_pair(tmp_path, full_dir, "full", 3)
    # both processes see the identical (allgathered) reward history
    assert rewards_full[0] == rewards_full[1]
    assert len(rewards_full[0]) == 3
    losses_full = _train_losses(_locallog(full_dir))
    curve_full = json.loads(
        (_locallog(full_dir) / "reward_curve.json").read_text()
    )

    # 2-process run preempted during epoch 1: both hosts SIGTERM, driver
    # checkpoints at the epoch boundary and exits cleanly on both
    pre_dir = tmp_path / "run_preempt"
    rewards_pre = _run_pair(tmp_path, pre_dir, "preempt", 3)
    assert rewards_pre[0] == rewards_pre[1]
    assert len(rewards_pre[0]) == 2  # stopped after epoch 1 of 3
    np.testing.assert_allclose(rewards_pre[0], rewards_full[0][:2], rtol=1e-6)
    ckpt = _logdir(pre_dir) / "checkpoints" / "1"
    assert ckpt.is_dir() and any(ckpt.iterdir())
    assert (_logdir(pre_dir) / "checkpoints" / "1_host.pkl").exists()

    # 2-process resume completes the run and matches the uninterrupted one
    rewards_res = _run_pair(tmp_path, pre_dir, "resume", 3)
    assert rewards_res[0] == rewards_res[1]
    np.testing.assert_allclose(rewards_res[0], rewards_full[0], rtol=1e-6)

    losses_res = _train_losses(_locallog(pre_dir))
    assert set(losses_res) == set(losses_full)
    for name in losses_full:
        np.testing.assert_allclose(
            losses_res[name], losses_full[name], rtol=1e-5,
            err_msg=f"train losses diverge after 2-process resume: {name}",
        )
    curve_res = json.loads((_locallog(pre_dir) / "reward_curve.json").read_text())
    assert len(curve_res["mean"]) == 3
    np.testing.assert_allclose(curve_res["mean"], curve_full["mean"], rtol=1e-6)
