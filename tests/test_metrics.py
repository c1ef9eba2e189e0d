"""Unit tests for the JSONL metrics stream (ddpo_tpu/utils/metrics.py).

The reference's observability is per-epoch .npy dumps plus a matplotlib
curve (SURVEY.md 5.5); the rebuild adds a structured append-only scalar
stream. These tests pin the schema (step + wall_time + scalars), coercion
of numpy/jax scalars, refusal of non-scalar values, the disabled no-op
mode, and the read-back helpers.
"""

import json

import numpy as np
import pytest

from ddpo_tpu.utils.metrics import MetricsLogger, iter_scalar, read_metrics


def test_log_appends_jsonl(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log(0, phase="sample", mean_reward=1.5)
    m.log(1, phase="train", loss=0.25, clipfrac=0.0)

    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    first = json.loads(lines[0])
    assert first["step"] == 0
    assert first["phase"] == "sample"
    assert first["mean_reward"] == 1.5
    assert "wall_time" in first


def test_coerces_numpy_and_jax_scalars(tmp_path):
    import jax.numpy as jnp

    m = MetricsLogger(str(tmp_path))
    m.log(
        0,
        np_scalar=np.float32(2.5),
        np_0d=np.array(3.0),
        jax_0d=jnp.asarray(4.0),
        int64=np.int64(7),
    )
    event = read_metrics(str(tmp_path))[0]
    assert event["np_scalar"] == 2.5
    assert event["np_0d"] == 3.0
    assert event["jax_0d"] == 4.0
    assert event["int64"] == 7
    # everything must be JSON-native after coercion
    assert all(
        isinstance(v, (bool, int, float, str, type(None)))
        for v in event.values()
    )


def test_rejects_arrays(tmp_path):
    m = MetricsLogger(str(tmp_path))
    with pytest.raises(TypeError, match="scalars"):
        m.log(0, bad=np.zeros(4))


def test_disabled_writes_nothing(tmp_path):
    m = MetricsLogger(str(tmp_path), enabled=False)
    m.log(0, x=1.0)
    assert not (tmp_path / "metrics.jsonl").exists()


def test_read_metrics_accepts_dir_or_file(tmp_path):
    m = MetricsLogger(str(tmp_path))
    for step in range(3):
        m.log(step, loss=float(step) * 0.1)
    by_dir = read_metrics(str(tmp_path))
    by_file = read_metrics(str(tmp_path / "metrics.jsonl"))
    assert by_dir == by_file and len(by_dir) == 3


def test_iter_scalar_filters_by_key(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log(0, phase="sample", mean_reward=1.0)
    m.log(0, phase="train", loss=0.5)
    m.log(1, phase="sample", mean_reward=2.0)
    events = read_metrics(str(tmp_path))
    assert list(iter_scalar(events, "mean_reward")) == [(0, 1.0), (1, 2.0)]
    assert list(iter_scalar(events, "loss")) == [(0, 0.5)]
