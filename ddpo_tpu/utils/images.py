"""Image codecs and saving helpers.

encode_jpeg/decode_jpeg are both a reward signal (JPEG compressibility:
reference training/callbacks.py:143-163) and the storage codec for RWR
datasets (reference utils/hdf5.py:25-44; quality 95).
"""

from __future__ import annotations

import io
import os

import numpy as np

from ddpo_tpu.utils import filesystem as fs


def _to_uint8(x: np.ndarray) -> np.ndarray:
    if issubclass(x.dtype.type, np.floating):
        assert np.abs(x).max() <= 1.0 + 1e-5, "float images must be in [0, 1]"
        x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
    return x


def encode_jpeg(x: np.ndarray, quality: int = 95) -> np.ndarray:
    """HWC image (uint8 or [0,1] float) -> JPEG bytes as a uint8 array."""
    from PIL import Image

    img = Image.fromarray(_to_uint8(x))
    buffer = io.BytesIO()
    img.save(buffer, "JPEG", quality=quality)
    return np.frombuffer(buffer.getvalue(), dtype=np.uint8)


def decode_jpeg(jpeg: np.ndarray) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(bytes(jpeg)))
    return np.array(img) / 255.0


def encode_generic(x) -> np.ndarray:
    import dill

    return np.frombuffer(dill.dumps(x), dtype=np.uint8)


def decode_generic(x):
    import dill

    return dill.loads(bytes(x))


def save_image(savepath: str, x, cache: str = "logs") -> None:
    from PIL import Image

    img = x if isinstance(x, Image.Image) else Image.fromarray(_to_uint8(np.asarray(x)))
    if fs.is_remote(savepath):
        localpath = os.path.join(cache, savepath.replace("gs://", ""))
        fs.mkdir(localpath, fname=True)
        img.save(localpath)
        with fs.open(savepath, mode="wb") as f:
            img.save(f, format="PNG")
    else:
        fs.mkdir(savepath, fname=True)
        img.save(savepath)


def save_images(images, *savepath, nrow: int = 8) -> None:
    """Grid of images to one file (matplotlib)."""
    import math

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = os.path.join(*savepath)
    fs.mkdir(path, fname=True)
    n = len(images)
    nrow = min(nrow, n)
    ncol = int(math.ceil(n / nrow))
    fig, axes = plt.subplots(nrow, ncol, squeeze=False)
    axes = axes.flatten()
    for ax in axes:
        ax.axis("off")
    for i, image in enumerate(images):
        axes[i].imshow(image)
    plt.savefig(path)
    plt.close(fig)


def save_gif(img_list, path: str = "") -> None:
    """Animated GIF from a list of [0,1]-float frames (reference :87-99)."""
    from PIL import Image

    frames = [Image.fromarray(_to_uint8(np.asarray(img))) for img in img_list]
    frames[0].save(
        fp=path, format="GIF", append_images=frames[1:], save_all=True,
        duration=200, loop=0,
    )


def plot_calibration(savepath: str, y_dict: dict, ylabel=None, cache: str = "logs") -> None:
    """Reward vs guidance-scale calibration plot (reference :402-428)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = sorted(y_dict.keys())
    plt.plot(xs, [y_dict[x] for x in xs])
    ax = plt.gca()
    ax.grid(linestyle="-", linewidth="1", color="white")
    ax.set_facecolor([0.9, 0.9, 0.9])
    for spine in ax.spines.values():
        spine.set_visible(False)
    plt.ylabel(ylabel)
    plt.xlabel("guidance scale")
    if fs.is_remote(savepath):
        localpath = os.path.join(cache, savepath.replace("gs://", ""))
        fs.mkdir(localpath, fname=True)
        plt.savefig(localpath)
        with fs.open(savepath, mode="wb") as f:
            plt.savefig(f)
    else:
        fs.mkdir(savepath, fname=True)
        plt.savefig(savepath)
    plt.close()
