"""Model-stack construction and (pre)trained-weight loading.

Replaces the reference's utils/serialization.py HF-hub path
(FlaxStableDiffusionPipeline.from_pretrained at :322-371) with first-party
model construction plus local checkpoint loading:

  - ``load_stable_diffusion(pretrained_model=...)``: if the path is a local
    checkpoint directory (diffusers Flax msgpack or torch safetensors), the
    weights are converted via models/convert.py; otherwise the models are
    randomly initialized at the exact SD-1.4 architecture (this environment
    is zero-egress — there is no hub download path). Random init preserves
    every systems property (shapes, speed, memory); reward curves need real
    weights.
  - ``load_unet(loadpath, ...)``: overlays finetuned UNet params saved by the
    trainers (unet_{epoch}.pkl, same artifact format as the reference so RWR
    iterations chain identically).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddpo_tpu.core.scheduler import DDIMScheduler
from ddpo_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
)
from ddpo_tpu.models.tokenizer import get_tokenizer, warn_if_fallback
from ddpo_tpu.utils import filesystem as fs
from ddpo_tpu.utils.checkpoints import load_unet_pickle


class StableModels(NamedTuple):
    tokenizer: Any
    text_encoder: CLIPTextModel
    vae: AutoencoderKL
    unet: UNet2DCondition
    scheduler: DDIMScheduler


def sd_scheduler(dtype=jnp.float32) -> DDIMScheduler:
    """SD-1.4 DDIM configuration (the reference re-instantiates the patched
    scheduler from the pipeline's config at pipeline/policy_gradient.py:107)."""
    return DDIMScheduler(
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        set_alpha_to_one=False,
        steps_offset=1,
        prediction_type="epsilon",
        dtype=dtype,
    )


def _random_init_params(models: StableModels, seed: int = 0):
    """Random-init parameters at the configured architecture."""
    ctx_dim = models.unet.config.cross_attention_dim
    ctx_len = models.text_encoder.config.max_position_embeddings
    k_unet, k_vae, k_text = jax.random.split(jax.random.PRNGKey(seed), 3)
    # jit the inits: eagerly they dispatch one micro-program per param
    # (hundreds of ~40ms compiles); as one jitted program each they compile
    # once and land in the persistent compile cache
    unet_params = jax.jit(models.unet.init)(
        k_unet,
        jnp.zeros((1, 4, 8, 8)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, ctx_len, ctx_dim)),
    )["params"]
    vae_params = jax.jit(models.vae.init)(
        k_vae, jnp.zeros((1, 3, 32, 32)), jax.random.PRNGKey(0)
    )["params"]
    text_params = jax.jit(models.text_encoder.init)(
        k_text, jnp.zeros((1, ctx_len), jnp.int32)
    )["params"]
    return {"unet": unet_params, "vae": vae_params, "text_encoder": text_params}


def to_dtype(tree, dtype):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=dtype), tree)


def get_dtype(tree):
    dtypes = {x.dtype for x in jax.tree_util.tree_leaves(tree)}
    assert len(dtypes) == 1, dtypes
    return dtypes.pop()


def _tiny_stack(activation_dtype):
    """Miniature stack for CPU smoke tests / CI (model_preset='tiny')."""
    from ddpo_tpu.models import CLIPTextConfig, UNetConfig, VAEConfig

    text_cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4,
    )
    unet_cfg = UNetConfig(
        sample_size=8, block_out_channels=(32, 64), layers_per_block=1,
        attention_heads=2, cross_attention_dim=32,
        down_block_has_attn=(True, False),
    )
    vae_cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)
    return (
        CLIPTextModel(text_cfg, dtype=activation_dtype),
        AutoencoderKL(vae_cfg, dtype=activation_dtype),
        UNet2DCondition(unet_cfg, dtype=activation_dtype),
    )


def load_stable_diffusion(
    pretrained_model: Optional[str] = None,
    dtype=jnp.float32,
    activation_dtype=jnp.float32,
    cache: str = "cache",
    seed: int = 0,
    model_preset: str = "sd14",
) -> Tuple[StableModels, dict]:
    """Build the SD-1.4 stack and its params (local checkpoint or random)."""
    if model_preset == "tiny":
        text_encoder, vae, unet = _tiny_stack(activation_dtype)
    else:
        text_encoder = CLIPTextModel(dtype=activation_dtype)
        vae = AutoencoderKL(dtype=activation_dtype)
        unet = UNet2DCondition(dtype=activation_dtype)
    tokenizer = get_tokenizer(pretrained_model)
    if model_preset != "tiny":  # tiny preset is a systems fixture by design
        warn_if_fallback(tokenizer, "serialization")
    models = StableModels(
        tokenizer=tokenizer,
        text_encoder=text_encoder,
        vae=vae,
        unet=unet,
        scheduler=sd_scheduler(),
    )

    if pretrained_model is not None and os.path.isdir(pretrained_model):
        from ddpo_tpu.models.convert import load_sd_checkpoint

        print(f"[ serialization ] loading local checkpoint: {pretrained_model}")
        params = load_sd_checkpoint(pretrained_model)
        # transformers text_encoder params may carry a top-level text_model key
        if "text_model" not in params["text_encoder"]:
            params["text_encoder"] = {"text_model": params["text_encoder"]}
    else:
        if pretrained_model is not None:
            print(
                f"[ serialization ] '{pretrained_model}' is not a local "
                "directory; random-initializing SD-1.4 (zero-egress env)"
            )
        params = _random_init_params(models, seed=seed)

    params = to_dtype(params, dtype)
    return models, params


def load_unet(
    loadpath: Optional[str],
    epoch="latest",
    pretrained_model: Optional[str] = None,
    dtype=jnp.float32,
    activation_dtype=jnp.float32,
    cache: str = "cache",
    seed: int = 0,
    model_preset: str = "sd14",
) -> Tuple[StableModels, dict]:
    """Stack + params, optionally overlaying a finetuned UNet.

    loadpath formats (reference parity, utils/serialization.py:357-368):
      - None: pretrained/random params only
      - dir containing unet_{epoch}.pkl (RWR chain artifact)
      - "orbax:<savepath>": latest full-train-state checkpoint's params
    """
    models, params = load_stable_diffusion(
        pretrained_model, dtype=dtype, activation_dtype=activation_dtype,
        cache=cache, seed=seed, model_preset=model_preset,
    )
    if loadpath:
        if loadpath.startswith("orbax:"):
            from ddpo_tpu.utils.checkpoints import restore_train_state

            restored, step = restore_train_state(loadpath[len("orbax:"):])
            assert restored is not None, f"no checkpoint under {loadpath}"
            print(f"[ serialization ] restored orbax step {step}")
            unet_params = restored["state"]["params"] if "state" in restored else restored["params"]
            params["unet"] = to_dtype(unet_params, dtype)
        else:
            print(f"[ serialization ] loading finetuned unet from {loadpath}")
            params["unet"] = to_dtype(load_unet_pickle(loadpath, epoch=epoch), dtype)
    return models, params


def save_stable_diffusion_export(savepath: str, params: dict) -> str:
    """Export params in a diffusers-compatible Flax layout.

    Writes {unet,vae,text_encoder}/*.msgpack under savepath, mirroring the
    reference's HF-pipeline export (utils/serialization.py:189-241) without
    requiring diffusers: our param trees already use HF Flax naming, so the
    msgpack files round-trip through models/convert.load_sd_checkpoint and
    are loadable by diffusers' from_pretrained(..., from_flax=True) given
    matching config.json files.
    """
    from flax.serialization import msgpack_serialize

    os.makedirs(savepath, exist_ok=True)
    fname = {
        "unet": "diffusion_flax_model.msgpack",
        "vae": "diffusion_flax_model.msgpack",
        "text_encoder": "flax_model.msgpack",
    }
    for sub in ("unet", "vae", "text_encoder"):
        subdir = os.path.join(savepath, sub)
        os.makedirs(subdir, exist_ok=True)
        tree = jax.tree_util.tree_map(np.asarray, jax.device_get(params[sub]))
        with open(os.path.join(subdir, fname[sub]), "wb") as f:
            f.write(msgpack_serialize(tree))
    return savepath


def sync_to_bucket(localpath: str, savepath: str) -> int:
    """Synchronous artifact sync localpath -> savepath (local or gs://).

    Reference parity: utils/serialization.py:374-381 (gcsfs variant of the
    gsutil rsync). Incremental: skips files whose destination copy is newer.
    """
    return fs.put_dir(localpath, savepath)


def async_to_bucket(localpath: str, savepath: str, wait: bool = False):
    """Fire-and-forget artifact sync, process 0 only (reference
    utils/serialization.py:383-399: async gsutil -m rsync subprocess).

    Returns the sync thread (or None on non-zero processes) so drivers/tests
    can join it before exit.
    """
    import threading

    if jax.process_index() != 0:
        return None
    thread = threading.Thread(
        target=sync_to_bucket, args=(localpath, savepath), daemon=True
    )
    thread.start()
    if wait:
        thread.join()
    return thread
