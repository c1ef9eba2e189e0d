"""LAION aesthetic predictor: 5-layer MLP over CLIP ViT-L/14 features.

Reference: ddpo/models/laion.py. The torch checkpoint
``sac+logos+ava1-l14-linearMSE.pth`` (layers 0/2/4/6/7 of an nn.Sequential)
is transplanted into the flax param tree by position; dropout layers are
always deterministic in the reference, so they are simply omitted here.
"""

from __future__ import annotations

import os

import flax.linen as nn
import numpy as np

WEIGHTS_FNAME = "sac+logos+ava1-l14-linearMSE.pth"
WEIGHTS_URL = (
    "https://github.com/christophschuhmann/"
    f"improved-aesthetic-predictor/blob/main/{WEIGHTS_FNAME}?raw=true"
)


class AestheticClassifier(nn.Module):
    @nn.compact
    def __call__(self, x):
        for features in (1024, 128, 64, 16, 1):
            x = nn.Dense(features=features)(x)
        return x


def load_weights(cache: str = "cache", allow_download: bool = True):
    """Load (or fetch into cache) the torch MLP weights -> flax params."""
    import torch

    loadpath = os.path.join(cache, WEIGHTS_FNAME)
    if not os.path.exists(loadpath):
        if not allow_download:
            raise FileNotFoundError(
                f"aesthetic weights not found at {loadpath}; place "
                f"{WEIGHTS_FNAME} there (no network in this environment)"
            )
        import requests

        os.makedirs(cache, exist_ok=True)
        r = requests.get(WEIGHTS_URL, timeout=60)
        r.raise_for_status()
        with open(loadpath, "wb") as f:
            f.write(r.content)

    weights = torch.load(loadpath, map_location="cpu")
    return set_weights(weights)


def set_weights(loaded_weights) -> dict:
    """torch state_dict (nn.Sequential 'layers.{i}') -> flax param tree."""
    layer_names = [0, 2, 4, 6, 7]
    params = {}
    for i, layer in enumerate(layer_names):
        params[f"Dense_{i}"] = {
            "kernel": np.asarray(loaded_weights[f"layers.{layer}.weight"]).T,
            "bias": np.asarray(loaded_weights[f"layers.{layer}.bias"]),
        }
    return {"params": params}
