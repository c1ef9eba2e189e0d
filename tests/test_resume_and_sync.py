"""Resume fidelity and remote-artifact durability for the DDPO driver.

1. A run killed at epoch k and resumed must produce the same reward curve,
   advantages, and train losses as an uninterrupted run: the checkpoint
   carries the full host state (per-prompt stat buffers, reward history,
   jax/python/numpy RNG states) in addition to the Orbax device state.
   (The reference checkpoints params only — pipeline/policy_gradient.py:
   457-464 — and cannot resume at all; this is the repo's flagship
   improvement, so it must actually hold bit-for-bit on the tiny preset.)
2. With a remote savepath every artifact (npy, png, reward curve, Orbax
   checkpoint) must land under the bucket (reference async_to_bucket,
   utils/serialization.py:383-399). Exercised against a fake-GCS root
   (DDPO_TPU_FAKE_GCS) so the full sync path runs without network.
"""

import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DDPO_BUCKET", "bucket")
    import importlib

    import ddpo_tpu.config.user as user
    import ddpo_tpu.config.base as base

    importlib.reload(user)
    importlib.reload(base)
    return tmp_path


COMMON = [
    "--dataset", "debug-animals",
    "--n_inference_steps", "2",
    "--resolution", "32",
    "--sample_batch_size", "2",
    "--train_batch_size", "1",
    "--save_freq", "1",
    # per-prompt stats ON so the tracker's buffers matter for advantages
    "--per_prompt_stats_bufsize", "8",
    "--per_prompt_stats_min_count", "2",
]


def _train_losses(logdir):
    out = {}
    for f in sorted((logdir / "train_info").iterdir()):
        out[f.name] = np.load(f, allow_pickle=True).item()["loss"]
    return out


@pytest.mark.slow
def test_resume_matches_uninterrupted(workdir):
    from ddpo_tpu.pipelines import policy_gradient

    logdir = (
        workdir / "logs" / "bucket" / "logs" / "debug-animals" / "models" / "pg"
    )

    # uninterrupted 3-epoch run
    rewards_full = policy_gradient.main(COMMON + ["--num_train_epochs", "3"])
    losses_full = _train_losses(logdir)
    curve_full = json.loads((logdir / "reward_curve.json").read_text())

    # wipe and rerun as 2 epochs + resume
    import shutil

    shutil.rmtree(workdir / "logs")
    shutil.rmtree(workdir / "bucket")
    rewards_a = policy_gradient.main(COMMON + ["--num_train_epochs", "2"])
    np.testing.assert_allclose(rewards_a, rewards_full[:2], rtol=1e-6)
    rewards_b = policy_gradient.main(
        COMMON + ["--num_train_epochs", "3", "--resume", "True"]
    )
    # driver returns the full history (restored + new epochs)
    np.testing.assert_allclose(rewards_b, rewards_full, rtol=1e-6)

    losses_resumed = _train_losses(logdir)
    assert set(losses_resumed) == set(losses_full)
    for name in losses_full:
        np.testing.assert_allclose(
            losses_resumed[name], losses_full[name], rtol=1e-5,
            err_msg=f"train losses diverge after resume: {name}",
        )

    curve_resumed = json.loads((logdir / "reward_curve.json").read_text())
    assert len(curve_resumed["mean"]) == 3
    np.testing.assert_allclose(curve_resumed["mean"], curve_full["mean"], rtol=1e-6)


@pytest.mark.slow
def test_remote_savepath_artifacts_land_in_bucket(workdir, monkeypatch):
    fake_gcs = workdir / "fake_gcs"
    monkeypatch.setenv("DDPO_TPU_FAKE_GCS", str(fake_gcs))
    from ddpo_tpu.pipelines import policy_gradient

    policy_gradient.main(
        COMMON + ["--num_train_epochs", "1", "--logbase", "gs://testbucket/logs"]
    )
    remote = fake_gcs / "testbucket" / "logs" / "models" / "pg"
    assert (remote / "reward_curve.json").exists()
    assert (remote / "log_0.png").exists()
    assert any((remote / "rewards").iterdir())
    assert any((remote / "samples").iterdir())
    ckpt = remote / "checkpoints" / "0"
    assert ckpt.exists() and any(ckpt.iterdir())
    assert (remote / "checkpoints" / "0_host.pkl").exists()
    with builtins_open(remote / "checkpoints" / "0_host.pkl") as f:
        host = pickle.load(f)
    assert "per_prompt_stats" in host and "train_rng" in host


def builtins_open(path):
    return open(path, "rb")


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(workdir, monkeypatch):
    """Preemption safety (beyond the reference): SIGTERM mid-run sets a
    flag, the driver checkpoints at the epoch boundary and exits cleanly,
    and --resume True continues from exactly that epoch. The signal is
    raised deterministically from inside epoch 1's prompt generation."""
    import os
    import signal

    from ddpo_tpu import training
    from ddpo_tpu.pipelines import policy_gradient

    real_make_prompts = training.make_prompts
    calls = {"n": 0}

    def sigterm_on_second_call(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first sample batch of epoch 1
            os.kill(os.getpid(), signal.SIGTERM)
        return real_make_prompts(*a, **kw)

    monkeypatch.setattr(training, "make_prompts", sigterm_on_second_call)
    rewards = policy_gradient.main(COMMON + ["--num_train_epochs", "3"])
    monkeypatch.setattr(training, "make_prompts", real_make_prompts)

    # stopped after epoch 1 of 3, with a checkpoint for epoch 1
    assert len(rewards) == 2
    ckpt_root = workdir / "bucket" / "logs" / "debug-animals" / "models" / "pg"
    assert (ckpt_root / "checkpoints" / "1").exists()
    # the handler was restored (pytest's own SIGTERM disposition back)
    assert signal.getsignal(signal.SIGTERM) is not None

    rewards_resumed = policy_gradient.main(
        COMMON + ["--num_train_epochs", "3", "--resume", "True"]
    )
    # continues with epochs 2 only (epochs 0-1 already done)
    assert len(rewards_resumed) == 3
    assert rewards_resumed[:2] == rewards
