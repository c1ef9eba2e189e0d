"""RWR-side driver e2e smokes: sample -> sizes -> finetune chain + calibrate.

Split from test_pipelines.py so xdist loadscope can run the PG-driver and
RWR-driver end-to-end groups on different workers (they were the single
largest module group on the suite's critical path).
"""

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

    # metrics streams landed for both RWR drivers
    from ddpo_tpu.utils.metrics import read_metrics

    base = workdir / "bucket" / "logs" / "debug-animals"
    sample_events = read_metrics(str(base / "samples" / "0"))
    assert sample_events and sample_events[0]["phase"] == "sample"
    assert sample_events[-1]["n_total"] == n
    finetune_events = read_metrics(str(base / "models" / "1"))
    assert finetune_events and finetune_events[0]["phase"] == "finetune"
    assert np.isfinite(finetune_events[0]["loss"])


def test_calibrate_then_auto_sample(workdir):
    """calibrate sweeps guidance scales with paired prompts/noise, writes
    calibration.json + metadata.json into the model dir; sample
    --guidance_scale auto then resolves the calibrated scale from it
    (reference pipeline/sample.py:48-49 semantics — the reference only
    consumed metadata.json; calibrate is the producer it lacked)."""
    import json as _json

    from ddpo_tpu.pipelines import calibrate, sample

    best, curve = calibrate.main(
        COMMON + ["--guidance_scales", "[1.0, 7.5]", "--n_eval_batches", "2",
                  "--n_samples_per_device", "1"]
    )
    assert best in (1.0, 7.5)
    assert set(curve) == {1.0, 7.5}
    assert all(np.isfinite(v["mean"]) for v in curve.values())

    model_dir = workdir / "bucket" / "logs" / "debug-animals" / "models" / "0"
    meta = _json.loads((model_dir / "metadata.json").read_text())
    assert meta["guidance_scale"] == best
    assert (model_dir / "calibration.json").exists()
    assert (model_dir / "calibration.png").exists()

    n = sample.main(
        COMMON + ["--guidance_scale", "auto", "--max_steps", "1",
                  "--n_samples_per_device", "1", "--local_size", "4",
                  "--savepath", "samples/calib"]
    )
    assert n >= 1


def test_generate_driver(workdir):
    """Generation-only driver: PNG per sample + grid + prompts.json from a
    checkpoint (the reference previews samples only inside its training
    loops); --prompts overrides the dataset's prompt_fn."""
    from ddpo_tpu.pipelines import generate

    outdir, prompts = generate.main(
        COMMON + ["--n_samples", "3", "--prompts", "['a dog', 'a cat']",
                  "--seed", "7"]
    )
    assert len(prompts) == 3
    assert prompts == ["a dog", "a cat", "a dog"]
    import json as _json
    import os as _os

    pngs = [f for f in _os.listdir(outdir) if f.endswith(".png")]
    assert len([f for f in pngs if not f.startswith("grid")]) == 3
    assert any(f.startswith("grid") for f in pngs)
    meta = _json.loads(open(_os.path.join(outdir, "prompts.json")).read())
    assert meta["prompts"] == prompts
    from ddpo_tpu.utils.metrics import read_metrics

    events = read_metrics(outdir)
    assert events and events[0]["phase"] == "generate"


def test_sample_driver_dpm(workdir):
    """RWR collection with --scheduler dpm++: the collector stores only
    images+rewards (no trajectories), so the deterministic few-step ODE
    solver is a valid drop-in for the DDIM chain (2.38x measured on v5e,
    bench_dpm.py). Exercises the sharded trajectory-free sampler on the
    8-device test mesh end to end through the writer."""
    from ddpo_tpu.data.hdf5 import LocalReader
    from ddpo_tpu.pipelines import sample

    n = sample.main(
        COMMON + ["--scheduler", "dpm++", "--max_steps", "1",
                  "--n_samples_per_device", "1", "--local_size", "8",
                  "--mask_mode", "percentile", "--mask_param", "0",
                  "--savepath", "samples/dpm"]
    )
    assert n >= 1
    reader = LocalReader(
        str(workdir / "bucket" / "logs" / "debug-animals" / "samples" / "dpm")
    )
    assert len(reader) == n
    images = reader.get(slice(0, n), field="images")
    assert np.isfinite(np.asarray(images, np.float32)).all()
