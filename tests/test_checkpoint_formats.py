"""HF checkpoint artifact-format coverage: safetensors + fp16 variants.

The real-weight load risk that remains in a zero-egress environment is
FORMAT, not math: the converter's tensor math is pinned by the torch
oracles (test_manifest.py, test_full_model_oracle.py), but those feed
in-memory state dicts. This file exercises the FILE paths the reference's
users actually hit (ddpo/utils/serialization.py:322-371 loads
CompVis/stable-diffusion-v1-4, distributed as torch safetensors and as a
Flax msgpack pipeline, both also shipped in fp16):

- a synthetic SD-shaped checkpoint dir in torch-safetensors layout
  (diffusion_pytorch_model.safetensors / model.safetensors per submodule)
  written from our own param trees via the inverse key/tensor mapping,
  loaded back through ``load_sd_checkpoint`` -> bit-identical trees;
- the fp16 variant of the same -> ``load_stable_diffusion`` coerces every
  leaf to the requested param dtype and the UNet's activations match the
  original params to half-precision tolerance;
- the diffusers-Flax msgpack layout, fp32 and fp16.

A loader that mishandles the safetensors layout, the key mapping, or the
fp16 -> param-dtype coercion fails here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpo_tpu.models.convert import to_diffusers_torch_key
from ddpo_tpu.utils.serialization import load_stable_diffusion


def _flatten(tree, prefix=()):
    out = {}
    for key, val in tree.items():
        if isinstance(val, dict):
            out.update(_flatten(val, prefix + (key,)))
        else:
            out[prefix + (key,)] = np.asarray(val)
    return out


def _to_torch_tensor(path, x):
    """Inverse of convert.convert_torch_tensor for export."""
    if path[-1] == "kernel":
        if x.ndim == 4:  # HWIO -> OIHW
            return np.transpose(x, (3, 2, 0, 1))
        if x.ndim == 2:  # (in, out) -> (out, in)
            return np.transpose(x)
    return x


def _write_safetensors_checkpoint(root, params, dtype=np.float32):
    """Write {unet,vae,text_encoder} in the torch-safetensors dir layout."""
    import safetensors.numpy

    filenames = {
        "unet": "diffusion_pytorch_model.safetensors",
        "vae": "diffusion_pytorch_model.safetensors",
        "text_encoder": "model.safetensors",
    }
    for sub, fname in filenames.items():
        flat = _flatten(params[sub])
        state_dict = {
            to_diffusers_torch_key(path): np.ascontiguousarray(
                _to_torch_tensor(path, x).astype(dtype)
            )
            for path, x in flat.items()
        }
        subdir = os.path.join(root, sub)
        os.makedirs(subdir, exist_ok=True)
        safetensors.numpy.save_file(state_dict, os.path.join(subdir, fname))


def _write_flax_checkpoint(root, params, dtype=np.float32):
    """Write the diffusers-Flax msgpack pipeline layout."""
    from flax.serialization import msgpack_serialize

    filenames = {
        "unet": "diffusion_flax_model.msgpack",
        "vae": "diffusion_flax_model.msgpack",
        "text_encoder": "flax_model.msgpack",
    }
    for sub, fname in filenames.items():
        tree = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(dtype), params[sub]
        )
        subdir = os.path.join(root, sub)
        os.makedirs(subdir, exist_ok=True)
        with open(os.path.join(subdir, fname), "wb") as f:
            f.write(msgpack_serialize(tree))


@pytest.fixture(scope="module")
def tiny_reference():
    models, params = load_stable_diffusion(model_preset="tiny", seed=7)
    return models, params


def _unet_activation(models, params):
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    t = jnp.array([3], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 32))
    return np.asarray(
        models.unet.apply({"params": params["unet"]}, latents, t, ctx),
        np.float32,
    )


def _assert_trees_match(loaded, reference, atol):
    ref_flat = _flatten(reference)
    got_flat = _flatten(loaded)
    assert set(got_flat) == set(ref_flat), (
        sorted(set(ref_flat) ^ set(got_flat))[:10]
    )
    for path, ref in ref_flat.items():
        got = got_flat[path]
        assert got.shape == ref.shape, path
        np.testing.assert_allclose(
            got.astype(np.float32), ref.astype(np.float32),
            atol=atol, rtol=0, err_msg=str(path),
        )


def test_safetensors_fp32_roundtrip(tmp_path, tiny_reference):
    """torch-safetensors dir -> load_sd_checkpoint: exact tree."""
    from ddpo_tpu.models.convert import load_sd_checkpoint

    models, params = tiny_reference
    _write_safetensors_checkpoint(str(tmp_path), params)
    loaded = load_sd_checkpoint(str(tmp_path))
    for sub in ("unet", "vae", "text_encoder"):
        _assert_trees_match(loaded[sub], params[sub], atol=0.0)


@pytest.mark.parametrize("writer", ["safetensors", "flax"])
def test_fp16_checkpoint_coerces_and_matches(tmp_path, tiny_reference, writer):
    """fp16 artifact variants (the '-fp16' HF revisions) load through the
    full load_stable_diffusion path: every leaf lands in the requested
    param dtype and the UNet reproduces the original activations to
    half-precision tolerance."""
    models, params = tiny_reference
    write = (
        _write_safetensors_checkpoint if writer == "safetensors"
        else _write_flax_checkpoint
    )
    write(str(tmp_path), params, dtype=np.float16)

    loaded_models, loaded = load_stable_diffusion(
        pretrained_model=str(tmp_path), dtype=jnp.float32,
        model_preset="tiny", seed=7,
    )
    for leaf in jax.tree_util.tree_leaves(loaded):
        assert leaf.dtype == jnp.float32

    for sub in ("unet", "vae"):
        # fp16 has 10 mantissa bits; tiny-model weights are O(1)
        _assert_trees_match(loaded[sub], params[sub], atol=2e-3)

    out_ref = _unet_activation(models, params)
    out_fp16 = _unet_activation(loaded_models, loaded)
    rel = np.linalg.norm(out_fp16 - out_ref) / (np.linalg.norm(out_ref) + 1e-12)
    assert rel < 2e-2, rel


def test_flax_fp32_roundtrip_through_loader(tmp_path, tiny_reference):
    """diffusers-Flax msgpack dir through load_stable_diffusion: exact."""
    models, params = tiny_reference
    _write_flax_checkpoint(str(tmp_path), params)
    _, loaded = load_stable_diffusion(
        pretrained_model=str(tmp_path), dtype=jnp.float32,
        model_preset="tiny", seed=7,
    )
    for sub in ("unet", "vae", "text_encoder"):
        _assert_trees_match(loaded[sub], params[sub], atol=0.0)
