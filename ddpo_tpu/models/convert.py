"""Checkpoint conversion: HF diffusers / transformers SD-1.4 -> ddpo_tpu.

Our param trees intentionally mirror HF *Flax* naming, so:
  - diffusers Flax checkpoints (e.g. duongna/stable-diffusion-v1-4-flax, the
    reference's pretrained_model at config/base.py:9) load structurally
    unchanged — ``from_diffusers_flax`` is a tree passthrough with dtype
    coercion.
  - diffusers *torch* checkpoints (safetensors from CompVis/stable-diffusion
    -v1-4) convert via segment renames plus the standard layout transposes
    (Conv OIHW->HWIO, Linear (out,in)->(in,out), GroupNorm/LayerNorm
    weight->scale, Embedding weight->embedding).

``torch_key_to_flax_path`` is the single mapping both directions use; tests
validate a synthetic roundtrip against our real param trees.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# torch module names whose "weight" is a normalization scale
_NORM_HINTS = (
    "norm", "layer_norm", "layernorm", "group_norm", "conv_norm_out",
    "pre_layrnorm", "post_layernorm", "final_layer_norm",
)
# torch module names that are embeddings
_EMBED_HINTS = ("token_embedding", "position_embedding")


def torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """'down_blocks.0.resnets.1.conv1.weight' -> (path tuple, kind).

    kind in {conv, linear, norm, embed, other} drives the tensor transform.
    """
    parts = key.split(".")
    leaf = parts[-1]
    modules = parts[:-1]

    # merge numeric segments into their parent: down_blocks.0 -> down_blocks_0
    merged = []
    for part in modules:
        if part.isdigit() and merged and not merged[-1].isdigit():
            # HF flax keeps CLIP encoder layers as bare indices under "layers"
            if merged[-1] == "layers":
                merged.append(part)
            else:
                merged[-1] = f"{merged[-1]}_{part}"
        else:
            merged.append(part)

    name = merged[-1] if merged else ""
    is_norm = any(h in name for h in _NORM_HINTS)
    is_embed = any(h in name for h in _EMBED_HINTS)

    if leaf == "weight":
        if is_norm:
            leaf, kind = "scale", "norm"
        elif is_embed:
            leaf, kind = "embedding", "embed"
        else:
            leaf, kind = "kernel", "tensor"  # conv vs linear decided by ndim
    elif leaf == "bias":
        kind = "bias"
    else:
        kind = "other"
    return tuple(merged) + (leaf,), kind


def convert_torch_tensor(x: np.ndarray, kind: str) -> np.ndarray:
    if kind == "tensor":
        if x.ndim == 4:  # conv OIHW -> HWIO
            return np.transpose(x, (2, 3, 1, 0))
        if x.ndim == 2:  # linear (out, in) -> (in, out)
            return np.transpose(x)
    return x


def from_diffusers_torch(state_dict: Dict[str, np.ndarray]) -> dict:
    """torch state_dict -> nested flax param tree (numpy leaves)."""
    tree: dict = {}
    for key, value in state_dict.items():
        path, kind = torch_key_to_flax_path(key)
        x = convert_torch_tensor(np.asarray(value), kind)
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = x
    return tree


# flax names ending in _<digit> that are literal module names in torch
# (everything else — down_blocks_0, resnets_1, to_out_0, net_0, ... — is an
# indexed list/ModuleList in the torch layout and splits back to ".<digit>")
_LITERAL_UNDERSCORE_STEMS = ("linear",)  # time_embedding.linear_1/linear_2


def to_diffusers_torch_key(path: Tuple[str, ...]) -> str:
    """Inverse of the segment mapping (for roundtrip tests / export)."""
    out = []
    for part in path[:-1]:
        if "_" in part and part.rsplit("_", 1)[-1].isdigit():
            stem, idx = part.rsplit("_", 1)
            if stem in _LITERAL_UNDERSCORE_STEMS:
                out.append(part)
            else:
                out.extend([stem, idx])
        else:
            out.append(part)
    leaf = path[-1]
    if leaf in ("scale", "embedding", "kernel"):
        leaf = "weight"
    return ".".join(out + [leaf])


def from_diffusers_flax(params, dtype=None):
    """diffusers-Flax param tree -> ours (structure already matches)."""
    import jax

    def cast(x):
        x = np.asarray(x)
        return x.astype(dtype) if dtype is not None else x

    if hasattr(params, "unfreeze"):
        params = params.unfreeze()
    return jax.tree_util.tree_map(cast, params)


def load_sd_checkpoint(path: str, dtype=None) -> dict:
    """Load an SD-1.4 checkpoint directory into {unet, vae, text_encoder}.

    Accepts either a diffusers Flax pipeline dir (msgpack per submodule) or
    torch safetensors; local files only (zero-egress environment).
    """
    import os

    out = {}
    for sub in ("unet", "vae", "text_encoder"):
        subdir = os.path.join(path, sub)
        flax_path = os.path.join(subdir, "diffusion_flax_model.msgpack")
        if sub == "text_encoder":
            flax_path = os.path.join(subdir, "flax_model.msgpack")
        st_candidates = [
            os.path.join(subdir, "diffusion_pytorch_model.safetensors"),
            os.path.join(subdir, "model.safetensors"),
        ]
        if os.path.exists(flax_path):
            from flax.serialization import msgpack_restore

            with open(flax_path, "rb") as f:
                out[sub] = from_diffusers_flax(msgpack_restore(f.read()), dtype)
        else:
            st_path = next((p for p in st_candidates if os.path.exists(p)), None)
            if st_path is None:
                raise FileNotFoundError(f"no flax/safetensors weights under {subdir}")
            import safetensors.numpy

            state_dict = safetensors.numpy.load_file(st_path)
            tree = from_diffusers_torch(state_dict)
            if sub == "vae":
                tree = _alias_vae_attention(tree)
            out[sub] = tree
    return out


_VAE_ATTN_ALIASES = {
    "to_q": "query", "to_k": "key", "to_v": "value", "to_out_0": "proj_attn",
}


def _alias_vae_attention(tree):
    """Newer diffusers torch VAEs name mid-block attention to_q/to_k/to_v/
    to_out.0; our VAESelfAttention (and older Flax checkpoints) use
    query/key/value/proj_attn. Rename in place where present."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        renamed = {}
        for key, val in node.items():
            renamed[_VAE_ATTN_ALIASES.get(key, key)] = walk(val)
        return renamed

    return walk(tree)


def load_clip_checkpoint(path: str) -> dict:
    """Load a CLIP model checkpoint dir (openai/clip-vit-large-patch14
    layout) into the param tree consumed by models/clip.py and the
    consistency/aesthetic reward callbacks.

    Accepts transformers Flax msgpack (flax_model.msgpack) or torch
    safetensors (model.safetensors); local files only.
    """
    import os

    flax_path = os.path.join(path, "flax_model.msgpack")
    if os.path.exists(flax_path):
        from flax.serialization import msgpack_restore

        with open(flax_path, "rb") as f:
            return from_diffusers_flax(msgpack_restore(f.read()))
    st_path = os.path.join(path, "model.safetensors")
    if not os.path.exists(st_path):
        raise FileNotFoundError(f"no flax/safetensors CLIP weights under {path}")
    import safetensors.numpy

    state_dict = safetensors.numpy.load_file(st_path)
    tree = from_diffusers_torch(state_dict)
    # logit_scale is a bare scalar parameter in the torch checkpoint
    if "logit_scale" in state_dict:
        tree["logit_scale"] = np.asarray(state_dict["logit_scale"])
    return tree
