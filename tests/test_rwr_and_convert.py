"""RWR diffusion train step, aesthetic-weight transplant, checkpoint convert."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState

from ddpo_tpu.core.scheduler import DDPMScheduler
from ddpo_tpu.models import CLIPTextConfig, CLIPTextModel, UNet2DCondition, UNetConfig
from ddpo_tpu.models.aesthetic import AestheticClassifier, set_weights
from ddpo_tpu.training import diffusion

TINY = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    attention_heads=2,
    cross_attention_dim=32,
    down_block_has_attn=(True, False),
)
TEXT = CLIPTextConfig(
    vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4
)


@pytest.fixture(scope="module")
def rwr_setup():
    unet = UNet2DCondition(TINY)
    text = CLIPTextModel(TEXT)
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, 77, 32)),
    )["params"]
    text_params = jax.jit(text.init)(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))[
        "params"
    ]

    def unet_apply(p, latents, t, ctx):
        return unet.apply({"params": p}, latents, t, ctx)

    def text_apply(p, ids):
        return text.apply({"params": p}, ids)

    state = TrainState.create(
        apply_fn=unet_apply, params=unet_params, tx=optax.adamw(1e-4)
    )
    scheduler = DDPMScheduler()
    sched_state = scheduler.create_state()

    batch = {
        "vae": jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 8)),
        "input_ids": jax.random.randint(jax.random.PRNGKey(3), (4, 77), 0, 100),
        "uncond_text": jnp.zeros((4, 77), jnp.int32),
    }
    return state, text_apply, text_params, batch, scheduler, sched_state


def test_rwr_train_step_decreases_loss(rwr_setup):
    state, text_apply, text_params, batch, scheduler, sched_state = rwr_setup
    step = jax.jit(
        functools.partial(
            diffusion.train_step,
            text_encoder_apply=text_apply,
            scheduler=scheduler,
            train_cfg=False,
            guidance_scale=5.0,
        )
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, loss, rng = step(
            state, text_encoder_params=text_params, batch=batch, rng=rng,
            scheduler_state=sched_state,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


@pytest.mark.slow
def test_rwr_weighted_matches_uniform_when_weights_equal(rwr_setup):
    state, text_apply, text_params, batch, scheduler, sched_state = rwr_setup
    kwargs = dict(
        text_encoder_apply=text_apply, scheduler=scheduler,
        train_cfg=False, guidance_scale=5.0,
    )
    rng = jax.random.PRNGKey(7)
    _, loss_u, _ = diffusion.train_step(
        state, text_encoder_params=text_params, batch=batch, rng=rng,
        scheduler_state=sched_state, **kwargs,
    )
    # uniform weights with expected batch-sum 1 == unweighted mean
    weights = jnp.full((4,), 1.0 / 4.0)
    _, loss_w, _ = diffusion.train_step(
        state, text_encoder_params=text_params, batch=batch, rng=rng,
        scheduler_state=sched_state, weights=weights, **kwargs,
    )
    np.testing.assert_allclose(float(loss_u), float(loss_w), rtol=1e-5)


def test_rwr_train_cfg_changes_prediction(rwr_setup):
    state, text_apply, text_params, batch, scheduler, sched_state = rwr_setup
    rng = jax.random.PRNGKey(9)
    _, loss_no, _ = diffusion.train_step(
        state, text_encoder_params=text_params, batch=batch, rng=rng,
        scheduler_state=sched_state, text_encoder_apply=text_apply,
        scheduler=scheduler, train_cfg=False, guidance_scale=5.0,
    )
    _, loss_cfg, _ = diffusion.train_step(
        state, text_encoder_params=text_params, batch=batch, rng=rng,
        scheduler_state=sched_state, text_encoder_apply=text_apply,
        scheduler=scheduler, train_cfg=True, guidance_scale=5.0,
    )
    assert abs(float(loss_no) - float(loss_cfg)) > 1e-8


def test_rwr_cfg_concat_matches_two_apply(rwr_setup):
    """diffusion.train_step(cfg_concat=True) == two-apply form: identical
    loss and gradients up to fp reassociation (the 2B concat apply is the
    same math; the backward sums contributions in a different order, so
    compare through an SGD update whose param delta scales with the actual
    gradient difference — adamw's sign-normalization would amplify fp noise
    on near-zero gradients into spurious mismatches)."""
    state, text_apply, text_params, batch, scheduler, sched_state = rwr_setup
    sgd_state = TrainState.create(
        apply_fn=state.apply_fn, params=state.params, tx=optax.sgd(0.1)
    )
    common = dict(
        text_encoder_params=text_params, batch=batch,
        rng=jax.random.PRNGKey(11), scheduler_state=sched_state,
        text_encoder_apply=text_apply, scheduler=scheduler, train_cfg=True,
        guidance_scale=5.0,
    )
    state_two, loss_two, _ = diffusion.train_step(
        sgd_state, cfg_concat=False, **common
    )
    state_cat, loss_cat, _ = diffusion.train_step(
        sgd_state, cfg_concat=True, **common
    )
    np.testing.assert_allclose(float(loss_cat), float(loss_two), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        state_cat.params, state_two.params,
    )


# ------------------------------ aesthetic MLP -------------------------------- #


def test_aesthetic_transplant_matches_torch_linear_stack():
    torch = pytest.importorskip("torch")
    layers = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    torch_names = [0, 2, 4, 6, 7]
    rng = np.random.default_rng(0)
    state_dict = {}
    for name, (fin, fout) in zip(torch_names, layers):
        state_dict[f"layers.{name}.weight"] = torch.tensor(
            rng.normal(size=(fout, fin)).astype(np.float32) * 0.01
        )
        state_dict[f"layers.{name}.bias"] = torch.tensor(
            rng.normal(size=(fout,)).astype(np.float32) * 0.01
        )

    params = set_weights(state_dict)
    x = rng.normal(size=(3, 768)).astype(np.float32)
    out = AestheticClassifier().apply(params, jnp.asarray(x))

    h = x
    for name in torch_names:
        W = state_dict[f"layers.{name}.weight"].numpy()
        b = state_dict[f"layers.{name}.bias"].numpy()
        h = h @ W.T + b
    np.testing.assert_allclose(np.asarray(out), h, rtol=1e-4, atol=1e-5)


# ------------------------------- converters ---------------------------------- #


def test_torch_key_mapping():
    from ddpo_tpu.models.convert import torch_key_to_flax_path

    cases = {
        "down_blocks.0.resnets.1.conv1.weight": (
            ("down_blocks_0", "resnets_1", "conv1", "kernel"), "tensor"),
        "down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q.weight": (
            ("down_blocks_0", "attentions_1", "transformer_blocks_0", "attn1",
             "to_q", "kernel"), "tensor"),
        "mid_block.resnets.0.norm1.weight": (
            ("mid_block", "resnets_0", "norm1", "scale"), "norm"),
        "conv_norm_out.bias": ((("conv_norm_out", "bias"))[0:2], "bias"),
        "time_embedding.linear_1.bias": (
            ("time_embedding", "linear_1", "bias"), "bias"),
        "text_model.encoder.layers.3.self_attn.q_proj.weight": (
            ("text_model", "encoder", "layers", "3", "self_attn", "q_proj",
             "kernel"), "tensor"),
        "text_model.embeddings.token_embedding.weight": (
            ("text_model", "embeddings", "token_embedding", "embedding"),
            "embed"),
    }
    for key, (path, kind) in cases.items():
        got_path, got_kind = torch_key_to_flax_path(key)
        assert got_path == tuple(path), (key, got_path)
        assert got_kind == kind, (key, got_kind)


def test_torch_conversion_runs_through_tiny_unet():
    """Build a torch-style state_dict from our param tree (inverse layout
    transforms), convert it back, and check the UNet produces identical
    outputs — validates both the renames and the tensor transposes."""
    from ddpo_tpu.models.convert import from_diffusers_torch

    model = UNet2DCondition(TINY)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, 7, 32)),
    )["params"]

    # flatten ours -> torch-style dict
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            path = prefix + [k]
            if isinstance(v, dict):
                walk(v, path)
            else:
                mods, leaf = path[:-1], path[-1]
                torch_mods = []
                for part in mods:
                    if "_" in part and part.rsplit("_", 1)[1].isdigit() and not (
                        part.startswith("to_out") or part.startswith("net_")
                        or part.startswith("linear_") or part.startswith("norm")
                        or part.startswith("conv")
                    ):
                        stem, idx = part.rsplit("_", 1)
                        torch_mods += [stem, idx]
                    else:
                        torch_mods.append(part)
                x = np.asarray(v)
                if leaf == "kernel":
                    torch_leaf = "weight"
                    if x.ndim == 4:
                        x = np.transpose(x, (3, 2, 0, 1))  # HWIO -> OIHW
                    elif x.ndim == 2:
                        x = np.transpose(x)
                elif leaf == "scale":
                    torch_leaf = "weight"
                else:
                    torch_leaf = leaf
                flat[".".join(torch_mods + [torch_leaf])] = x

    walk(params, [])
    converted = from_diffusers_torch(flat)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    ref = model.apply({"params": params}, x, jnp.array([500]), ctx)
    out = model.apply({"params": converted}, x, jnp.array([500]), ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
