"""Reward callbacks (dependency-free subset), HDF5 storage, bucket loader."""

import numpy as np
import pytest

from ddpo_tpu.data.bucket import BucketDataset, collate_fn, get_bucket_loader
from ddpo_tpu.data.hdf5 import H5Reader, RemoteWriter
from ddpo_tpu.models.tokenizer import HashTokenizer
from ddpo_tpu.training.callbacks import (
    arange_fn,
    callback_fns,
    evaluate_callbacks,
    jpeg_fn,
    mirror_correlation_fn,
    mirror_symmetry_fn,
    neg_jpeg_fn,
    rotational_correlation_fn,
)
from ddpo_tpu.utils.images import decode_jpeg, encode_jpeg


def _noise_image(seed, size=64):
    return np.random.default_rng(seed).random((size, size, 3)).astype(np.float32)


def _flat_image(size=64):
    return np.full((size, size, 3), 0.5, dtype=np.float32)


def test_registry_parity_with_reference():
    expected = {
        "vae", "aesthetic", "consistency", "jpeg", "neg_jpeg", "rotational",
        "rotational_corr", "mirror", "mirror_corr", "thumbnail", "arange",
        "vqa", "llava_vqa", "llava_bertscore",
    }
    assert expected == set(callback_fns)


def test_jpeg_reward_orders_by_compressibility():
    """Flat images compress better than noise -> higher (less negative)."""
    images = np.stack([_flat_image(), _noise_image(0)])
    scores, info = jpeg_fn()(images, None, None)
    assert scores.shape == (2, 1)
    assert scores[0, 0] > scores[1, 0]
    assert (scores <= 0).all()

    neg_scores, _ = neg_jpeg_fn()(images, None, None)
    np.testing.assert_allclose(neg_scores, -scores)


def test_arange_reward():
    scores, _ = arange_fn()(np.zeros((5, 8, 8, 3), np.float32), None, None)
    np.testing.assert_array_equal(scores.squeeze(), np.arange(5))


def test_mirror_rewards_prefer_symmetry():
    sym = np.zeros((16, 16, 3), np.float32)
    sym[:, :8] = 0.9
    sym[:, 8:] = 0.9  # perfectly mirror-symmetric
    asym = np.zeros((16, 16, 3), np.float32)
    asym[:, :8] = 1.0  # half bright, half dark
    images = np.stack([sym, asym])

    scores, _ = mirror_symmetry_fn()(images, None, None)
    assert scores[0] > scores[1]

    # correlation variant needs nonconstant images
    images2 = np.stack(
        [np.concatenate([_noise_image(1)[:, :32], _noise_image(1)[:, :32][:, ::-1]], axis=1),
         _noise_image(2)]
    )
    corr, _ = mirror_correlation_fn()(images2, None, None)
    assert corr[0] < corr[1]  # mirrored image has correlation 1 -> score -1


def test_rotational_correlation_prefers_180_symmetry():
    half = _noise_image(3)[:32]
    rot_sym = np.concatenate([half, half[::-1, ::-1]], axis=0)
    images = np.stack([rot_sym, _noise_image(4)])
    scores, _ = rotational_correlation_fn()(images, None, None)
    assert scores[0] > scores[1]


def test_evaluate_callbacks_random_training_prompt():
    fns = {"arange": arange_fn()}
    images = np.zeros((3, 8, 8, 3), np.float32)
    out = evaluate_callbacks(fns, images, [["p1", "p2"]] * 3, [{}] * 3)
    scores, info = out["arange"]
    assert scores.shape == (3, 1)


def test_jpeg_codec_roundtrip():
    img = _noise_image(0, size=32)
    encoded = encode_jpeg(img)
    assert encoded.dtype == np.uint8 and encoded.ndim == 1
    decoded = decode_jpeg(encoded)
    assert decoded.shape == img.shape
    assert np.abs(decoded - img).mean() < 0.2  # lossy but close


# ----------------------------------- hdf5 ------------------------------------ #


@pytest.fixture
def sample_dataset(tmp_path):
    """Write a small sharded dataset like pipelines/sample.py does."""
    from ddpo_tpu.data.hdf5 import decode_generic, encode_generic

    writer = RemoteWriter(str(tmp_path / "samples"), split_size=4)
    writer.configure("images", encode_fn=encode_jpeg, decode_fn=decode_jpeg)
    writer.configure("inference_prompts")
    writer.configure(
        "training_prompts", encode_fn=encode_generic, decode_fn=decode_generic
    )
    writer.configure("jpeg")
    writer.configure("vae")

    n = 10
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.random((n, 16, 16, 3)).astype(np.float32),
        "inference_prompts": [f"prompt {i}" for i in range(n)],
        "training_prompts": [[f"prompt {i}"] for i in range(n)],
        "jpeg": -rng.random((n, 1)),
        "vae": rng.normal(size=(n, 2, 2, 8)).astype(np.float32),
    }
    mask = np.ones(n, dtype=bool)
    mask[7] = False  # exercise masking
    added = writer.add_batch(batch, mask=mask)
    writer.close()
    return str(tmp_path / "samples"), batch, added


def test_remote_writer_splits_and_masks(sample_dataset):
    import glob
    import os

    path, batch, added = sample_dataset
    assert added == 9
    files = glob.glob(os.path.join(path, "*.hdf5"))
    assert len(files) == 3  # 9 rows at split_size 4 -> 4+4+1


def test_manifest_and_remote_reader(sample_dataset):
    path, batch, added = sample_dataset
    from ddpo_tpu.pipelines.save_sizes import build_manifest
    from ddpo_tpu.utils import fs

    manifest = build_manifest(path)
    assert sum(manifest.values()) == 9
    fs.save(f"{path}/sizes.pkl", manifest)

    from ddpo_tpu.data.hdf5 import RemoteReader

    reader = RemoteReader(path)
    assert len(reader) == 9
    row = reader[0]
    assert row["images"].shape == (16, 16, 3)
    assert row["vae"].shape == (2, 2, 8)
    assert isinstance(row["training_prompts"], list)
    # jpeg scores roundtrip exactly (no codec); split files sort by random
    # suffix so global order is not write order — compare as sorted sets
    got = np.stack([reader.get(i, "jpeg") for i in range(9)])
    kept = np.delete(batch["jpeg"], 7, axis=0)
    np.testing.assert_allclose(
        np.sort(got.ravel()), np.sort(kept.ravel()), rtol=1e-6
    )


def test_make_weights_softmax(sample_dataset):
    path, batch, _ = sample_dataset
    from ddpo_tpu.pipelines.save_sizes import build_manifest
    from ddpo_tpu.utils import fs
    from ddpo_tpu.data.hdf5 import RemoteReader

    fs.save(f"{path}/sizes.pkl", build_manifest(path))
    reader = RemoteReader(path)
    reader.make_weights("jpeg", temperature=2.0, by_prompt=False)
    assert reader.weighted
    np.testing.assert_allclose(reader.weights.mean(), 1.0, rtol=1e-6)
    assert "weights" in reader[0]


def test_bucket_loader_end_to_end(sample_dataset):
    path, batch, _ = sample_dataset
    from ddpo_tpu.pipelines.save_sizes import build_manifest
    from ddpo_tpu.utils import fs

    fs.save(f"{path}/sizes.pkl", build_manifest(path))

    tok = HashTokenizer()
    dataset, loader = get_bucket_loader(path, tok, batch_size=4)
    batches = list(loader)
    assert len(batches) == 2  # 9 rows, bs 4, drop_last
    b = batches[0]
    assert b["vae"].shape == (4, 2, 2, 8)
    assert b["input_ids"].shape == (4, 77)
    assert b["uncond_text"].shape == (4, 77)
    assert "jpeg" in b and b["jpeg"].shape == (4, 1)
    assert b["idxs"].tolist() == [0, 1, 2, 3]


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    ids = tok(["a dog", "a dog", "a cat"])
    assert ids.shape == (3, 77)
    np.testing.assert_array_equal(ids[0], ids[1])  # deterministic
    assert (ids[0] != ids[2]).any()
    assert ids[0, 0] == 49406  # BOS
    assert (ids < 49408).all() and (ids >= 0).all()
