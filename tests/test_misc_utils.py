"""Smoke coverage for progress, profiling, filesystem, and image helpers."""

import json
import os

import numpy as np

from ddpo_tpu.utils import fs
from ddpo_tpu.utils.images import save_gif, save_image, save_images
from ddpo_tpu.utils.profiling import StepTimer
from ddpo_tpu.utils.progress import Progress, Silent
from ddpo_tpu.utils.timer import Timer


def test_progress_counts_and_stamps(capsys):
    p = Progress(4, name="test")
    for i in range(4):
        p({"loss": 0.5, "note": "x"})
    p.stamp()
    out = capsys.readouterr().out
    assert "4 / 4" in out and "loss : 0.5" in out

    s = Silent(100, name="quiet")
    s({"a": 1})
    s.stamp()
    s.pause()
    s.append_description("anything")


def test_progress_reference_surface(capsys):
    # reference surface: param table chunked by ncol, tiny floats in
    # scientific notation, pause/resume, append_description into stamp
    # (ddpo/utils/progress.py:7-177)
    p = Progress(10, name="ref", ncol=2, max_length=16)
    p.update({"kl": 3.2e-5, "clipfrac": 0.1, "loss": -0.25})
    out = capsys.readouterr().out
    assert "3.20e-05" in out  # <1e-4 renders scientific
    assert "clipfrac : 0.1" in out
    p.pause()
    p.resume()
    p.append_description("epoch done")
    p.stamp()
    out = capsys.readouterr().out
    assert "epoch done" in out and "1 / 10" in out


def test_step_timer_phases():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    means = t.means()
    assert set(means) == {"a", "b"}
    assert t.counts["a"] == 2
    assert "a:" in t.report()


def test_timer_resets():
    t = Timer()
    first = t()
    assert first >= 0
    assert t(reset=False) >= 0


def test_filesystem_local_roundtrips(tmp_path):
    path = str(tmp_path / "sub" / "x.pkl")
    os.makedirs(os.path.dirname(path))
    fs.save(path, {"a": 1})
    assert fs.unpickle(path) == {"a": 1}
    fs.save_json(str(tmp_path / "x.json"), {"b": 2})
    assert fs.read_json(str(tmp_path / "x.json")) == {"b": 2}
    assert fs.exists(path) and not fs.exists(str(tmp_path / "nope"))
    assert "x.json" in fs.ls(str(tmp_path))
    assert not fs.is_remote(path)
    assert fs.is_remote("gs://bucket/x")
    assert fs.get_bucket("gs://bucket/a/b") == ("bucket", "a/b")
    made = fs.join_and_create(str(tmp_path), "deep", "dir", "f.txt")
    assert os.path.isdir(os.path.dirname(made))


def test_image_saving(tmp_path):
    img = np.random.default_rng(0).random((16, 16, 3)).astype(np.float32)
    save_image(str(tmp_path / "one.png"), img)
    assert (tmp_path / "one.png").exists()
    save_images([img, img, img], str(tmp_path / "grid.png"), nrow=2)
    assert (tmp_path / "grid.png").exists()
    save_gif([img, img], str(tmp_path / "anim.gif"))
    assert (tmp_path / "anim.gif").exists()
