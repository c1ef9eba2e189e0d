"""End-to-end tiny PIPELINE oracle: torch/diffusers semantics vs our stack.

The per-model oracles (test_full_model_oracle.py, test_models.py,
test_tokenizer.py) pin each component; this composes them the way a real
generation run does — prompt -> BPE tokenize -> CLIP text encode ->
DDIM(eta=0) CFG sampling -> VAE decode — and checks the CROSS-COMPONENT
wiring: tokenizer padding layout feeding the text encoder, text embeddings
feeding the UNet's cross-attention, the CFG concat order ([uncond, cond],
reference pipeline_flax_stable_diffusion.py:187), the guidance combine
(u + s*(c - u), :226-229), the timestep grid (stride descending +
steps_offset, scheduling_ddim_flax.py:189-211), and the VAE unscale/clip
(pipeline/policy_gradient.py:174-182).

The torch side is an independent straight-line reimplementation of the
diffusers pipeline semantics over the tiny torch models; the jax side uses
the exact fns pipelines/generate.py composes (tokenizer -> text encoder ->
sampling.sample_images -> sampling.vae_decode). Both consume the same
init-noise latents (drawn from the sampler's own RNG stream) so eta=0
makes the whole chain deterministic.

Sensitivity (VERDICT round-3 item #7 "done" criterion): a deliberate
guidance-combine flip and a timestep-grid flip in the torch mirror must
both FAIL the comparison — proven below.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddpo_tpu.core import DDIMScheduler
from ddpo_tpu.models import UNet2DCondition
from ddpo_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from ddpo_tpu.models.convert import from_diffusers_torch
from ddpo_tpu.models.tokenizer import CLIPBPETokenizer
from ddpo_tpu.models.vae import AutoencoderKL
from ddpo_tpu.sampling import SamplerConfig, sample_images, vae_decode

from test_full_model_oracle import (
    TorchTinyUNet,
    TorchTinyVAE,
    UNET_CFG,
    VAE_CFG,
    _convert,
)
from test_tokenizer import CORPUS, _load_asset_lines, _train_bpe

SEQ = 16  # tiny CLIP position count; tokenizer pads to this
GUIDANCE = 5.0
N_STEPS = 5  # stride 200 grid: [801, 601, 401, 201, 1]
PROMPTS = ["a photo of a dog", "a cat riding a bicycle, watercolor"]


@pytest.fixture(scope="module")
def stack():
    """Tiny torch pipeline (diffusers layouts) + converted jax params."""
    transformers = pytest.importorskip("transformers")

    vocab, merges = _train_bpe(CORPUS + _load_asset_lines())
    tokenizer = CLIPBPETokenizer(vocab, merges)

    torch.manual_seed(0)
    t_unet = TorchTinyUNet().eval()
    t_vae = TorchTinyVAE().eval()
    t_text = transformers.CLIPTextModel(
        transformers.CLIPTextConfig(
            vocab_size=tokenizer.vocab_size,
            hidden_size=UNET_CFG.cross_attention_dim,
            intermediate_size=2 * UNET_CFG.cross_attention_dim,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=SEQ,
            hidden_act="quick_gelu",
        )
    ).eval()

    params = {
        "unet": _convert(t_unet),
        "vae": _convert(t_vae),
        "text_encoder": from_diffusers_torch(
            {k: v.detach().numpy() for k, v in t_text.state_dict().items()}
        ),
    }
    return tokenizer, t_text, t_unet, t_vae, params


def _torch_ddim_generate(
    t_text, t_unet, t_vae, prompt_ids, uncond_ids, init_latents,
    flip_guidance=False, flip_grid=False,
):
    """Independent torch mirror of the diffusers flax SD pipeline at eta=0.

    Semantics per the reference's patched pipeline: CFG context is
    concat([uncond, cond]) and the latents are duplicated for one batched
    UNet call (pipeline_flax_stable_diffusion.py:187,209); guidance is
    u + s*(c - u) (:226-229); the DDIM grid is
    (arange(n) * (1000 // n)).round()[::-1] + steps_offset with SD-1.4's
    steps_offset=1 and set_alpha_to_one=False
    (scheduling_ddim_flax.py:189-211); the eta=0 step is
    x_prev = sqrt(a_prev) * x0_hat + sqrt(1 - a_prev) * eps; decode
    unscales by 0.18215 and maps to [0, 1] NHWC
    (pipeline/policy_gradient.py:174-182).

    flip_guidance / flip_grid are the deliberate wiring bugs the oracle
    must catch.
    """
    with torch.no_grad():
        cond = t_text(torch.from_numpy(prompt_ids).long()).last_hidden_state
        uncond = t_text(torch.from_numpy(uncond_ids).long()).last_hidden_state
        context = torch.cat([uncond, cond], dim=0)

        betas = (
            torch.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=torch.float64)
            ** 2
        )
        alphas_cumprod = torch.cumprod(1.0 - betas, dim=0).float()
        final_alpha = alphas_cumprod[0]  # set_alpha_to_one=False

        step_ratio = 1000 // N_STEPS
        offset = 0 if flip_grid else 1
        grid = (np.arange(N_STEPS) * step_ratio).round()[::-1] + offset

        x = torch.from_numpy(init_latents).float()
        for t in grid.astype(np.int64):
            eps = t_unet(
                torch.cat([x, x], dim=0),
                torch.full((2 * x.shape[0],), t),
                context,
            )
            u, c = eps.chunk(2, dim=0)
            if flip_guidance:
                eps = c + GUIDANCE * (u - c)
            else:
                eps = u + GUIDANCE * (c - u)

            prev_t = int(t) - step_ratio
            a_t = alphas_cumprod[int(t)]
            a_prev = alphas_cumprod[prev_t] if prev_t >= 0 else final_alpha
            x0 = (x - math.sqrt(1.0 - a_t) * eps) / math.sqrt(a_t)
            x = math.sqrt(a_prev) * x0 + math.sqrt(1.0 - a_prev) * eps

        images = t_vae.decode(x / 0.18215)
        return (images / 2 + 0.5).clamp(0, 1).permute(0, 2, 3, 1).numpy()


def _jax_generate(tokenizer, params, prompt_ids, uncond_ids, key):
    """Our stack, composed exactly as pipelines/generate.py composes it."""
    text_model = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=tokenizer.vocab_size,
            hidden_size=UNET_CFG.cross_attention_dim,
            intermediate_size=2 * UNET_CFG.cross_attention_dim,
            num_layers=2,
            num_heads=4,
            max_position_embeddings=SEQ,
        )
    )
    unet = UNet2DCondition(UNET_CFG)
    vae = AutoencoderKL(VAE_CFG)
    scheduler = DDIMScheduler()

    encode = lambda ids: text_model.apply(
        {"params": params["text_encoder"]}, jnp.asarray(ids)
    )
    config = SamplerConfig(
        num_inference_steps=N_STEPS,
        guidance_scale=GUIDANCE,
        eta=0.0,
        height=16,
        width=16,
        vae_scale_factor=2,
        latent_channels=4,
    )
    latents = jax.jit(
        lambda p, pe, ue: sample_images(
            lambda q, x, t, c: unet.apply({"params": q}, x, t, c),
            p,
            scheduler,
            scheduler.create_state(),
            pe,
            ue,
            key,
            config,
        )
    )(params["unet"], encode(prompt_ids), encode(uncond_ids))
    images = jax.jit(lambda p, l: vae_decode(vae, p, l))(params["vae"], latents)
    return np.asarray(latents), np.asarray(images)


def _ids_and_init(tokenizer, key):
    prompt_ids = tokenizer(PROMPTS, max_length=SEQ)
    uncond_ids = tokenizer([""] * len(PROMPTS), max_length=SEQ)
    # the sampler's own init-noise stream (sampling/sampler.py::sample_images)
    _, init_key = jax.random.split(key)
    init = np.asarray(
        jax.random.normal(init_key, (len(PROMPTS), 4, 8, 8), jnp.float32)
    )
    return prompt_ids, uncond_ids, init


def test_pipeline_end_to_end_matches_torch(stack):
    tokenizer, t_text, t_unet, t_vae, params = stack
    key = jax.random.PRNGKey(42)
    prompt_ids, uncond_ids, init = _ids_and_init(tokenizer, key)

    want = _torch_ddim_generate(
        t_text, t_unet, t_vae, prompt_ids, uncond_ids, init
    )
    _, got = _jax_generate(tokenizer, params, prompt_ids, uncond_ids, key)

    assert got.shape == want.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_pipeline_oracle_catches_guidance_flip(stack):
    tokenizer, t_text, t_unet, t_vae, params = stack
    key = jax.random.PRNGKey(42)
    prompt_ids, uncond_ids, init = _ids_and_init(tokenizer, key)

    want = _torch_ddim_generate(
        t_text, t_unet, t_vae, prompt_ids, uncond_ids, init,
        flip_guidance=True,
    )
    _, got = _jax_generate(tokenizer, params, prompt_ids, uncond_ids, key)
    assert np.max(np.abs(got - want)) > 1e-2, (
        "flipped guidance combine produced matching images: oracle is blind"
    )


def test_pipeline_oracle_catches_grid_flip(stack):
    tokenizer, t_text, t_unet, t_vae, params = stack
    key = jax.random.PRNGKey(42)
    prompt_ids, uncond_ids, init = _ids_and_init(tokenizer, key)

    want = _torch_ddim_generate(
        t_text, t_unet, t_vae, prompt_ids, uncond_ids, init, flip_grid=True
    )
    _, got = _jax_generate(tokenizer, params, prompt_ids, uncond_ids, key)
    assert np.max(np.abs(got - want)) > 1e-3, (
        "steps_offset grid flip produced matching images: oracle is blind"
    )
