"""Native JPEG scorer: builds, matches PIL within codec tolerance, threads."""

import numpy as np
import pytest

from ddpo_tpu.utils.images import encode_jpeg


@pytest.fixture(scope="module")
def native():
    from ddpo_tpu.native import jpeg

    if jpeg._get_lib() is None:
        pytest.skip(f"native lib unavailable: {jpeg._load_error}")
    return jpeg


def _images(n=6, size=64):
    rng = np.random.default_rng(0)
    flat = np.full((size, size, 3), 0.5, dtype=np.float32)
    noise = rng.random((n - 1, size, size, 3)).astype(np.float32)
    return np.concatenate([flat[None], noise])


def test_native_matches_pil_sizes(native):
    images = _images()
    sizes = native.jpeg_sizes_native(images, quality=95)
    pil_sizes = np.array([len(encode_jpeg(i, quality=95)) for i in images])
    # different encoder settings (subsampling/huffman) -> allow 25% slack,
    # but the compressibility ORDERING must agree
    assert np.all(np.abs(sizes - pil_sizes) / pil_sizes < 0.25)
    assert np.argmin(sizes) == np.argmin(pil_sizes) == 0  # flat compresses best


def test_native_threaded_matches_sequential(native):
    images = _images(12)
    seq = native.jpeg_sizes_native(images, n_threads=1)
    par = native.jpeg_sizes_native(images, n_threads=8)
    np.testing.assert_array_equal(seq, par)


def test_native_uint8_and_float_inputs_agree(native):
    images = _images(3)
    a = native.jpeg_sizes_native(images)
    b = native.jpeg_sizes_native((images * 255).astype(np.uint8))
    np.testing.assert_array_equal(a, b)


def test_jpeg_fn_uses_batch_scorer():
    from ddpo_tpu.training.callbacks import jpeg_fn

    scores, _ = jpeg_fn()(_images(4), None, None)
    assert scores.shape == (4, 1)
    assert scores[0, 0] > scores[1, 0]  # flat image compresses best
