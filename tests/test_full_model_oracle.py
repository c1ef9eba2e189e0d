"""FULL-MODEL torch activation oracles for the diffusers weight contract.

VERDICT round-2 item #4 (flip side of "no real weights in a zero-egress
env"): the per-block oracles in test_manifest.py validate every transpose/
rename kind but cannot catch WIRING bugs — a flipped skip-concat order, a
wrong timestep-embedding convention, or a misplaced attention block keeps
every shape identical. Here complete tiny-geometry torch models faithful to
diffusers' UNet2DConditionModel / AutoencoderKL (state-dict keys in the
diffusers torch layout; reference loads these weights via
ddpo/utils/serialization.py:322-371) are converted through
``models.convert.from_diffusers_torch`` and must reproduce our Flax models'
activations end-to-end. A deliberate skip-order flip must FAIL the
comparison (asserted below), proving the oracle's sensitivity.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddpo_tpu.models import UNet2DCondition, UNetConfig
from ddpo_tpu.models.convert import from_diffusers_torch
from ddpo_tpu.models.vae import AutoencoderKL, VAEConfig

from test_manifest import (
    TorchBasicTransformerBlock,
    TorchResnetBlock2D,
    TorchVAEAttention,
)

# tiny geometry (same as serialization._tiny_stack's model_preset="tiny")
UNET_CFG = UNetConfig(
    sample_size=8, block_out_channels=(32, 64), layers_per_block=1,
    attention_heads=2, cross_attention_dim=32,
    down_block_has_attn=(True, False),
)
VAE_CFG = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)


def _gn(c):
    """GroupNorm groups: 32 when divisible, else gcd (our GroupNorm's rule)."""
    return 32 if c % 32 == 0 else math.gcd(c, 32)


class TorchTransformer2D(torch.nn.Module):
    """diffusers Transformer2DModel (use_linear_projection=False)."""

    def __init__(self, c, heads, context_dim):
        super().__init__()
        self.norm = torch.nn.GroupNorm(_gn(c), c, eps=1e-5)
        self.proj_in = torch.nn.Conv2d(c, c, 1)
        self.transformer_blocks = torch.nn.ModuleList(
            [TorchBasicTransformerBlock(c, heads, c // heads, context_dim)]
        )
        self.proj_out = torch.nn.Conv2d(c, c, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.view(b, c, h * w).transpose(1, 2)
        for block in self.transformer_blocks:
            x = block(x, context)
        x = x.transpose(1, 2).view(b, c, h, w)
        return self.proj_out(x) + res


class TorchDownsample(torch.nn.Module):
    def __init__(self, c, asymmetric=False):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = torch.nn.Conv2d(c, c, 3, stride=2,
                                    padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:  # diffusers VAE encoder: pad (0,1) per spatial side
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TorchUpsample(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(
            torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
        )


class TorchTinyUNet(torch.nn.Module):
    """diffusers UNet2DConditionModel semantics at UNET_CFG geometry.

    flip_skip_concat flips the up-block concat order — the wiring bug the
    oracle must catch.
    """

    def __init__(self, cfg=UNET_CFG, flip_skip_concat=False):
        super().__init__()
        self.cfg = cfg
        self.flip = flip_skip_concat
        ch = cfg.block_out_channels
        temb_dim = ch[0] * 4
        heads = cfg.attention_heads
        ctx = cfg.cross_attention_dim

        self.time_embedding = torch.nn.Module()
        self.time_embedding.linear_1 = torch.nn.Linear(ch[0], temb_dim)
        self.time_embedding.linear_2 = torch.nn.Linear(temb_dim, temb_dim)

        self.conv_in = torch.nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)

        n = len(ch)
        self.down_blocks = torch.nn.ModuleList()
        prev = ch[0]
        self._down_meta = []
        for i, out in enumerate(ch):
            block = torch.nn.Module()
            block.resnets = torch.nn.ModuleList(
                [TorchResnetBlock2D(prev if j == 0 else out, out, temb=temb_dim)
                 for j in range(cfg.layers_per_block)]
            )
            if cfg.down_block_has_attn[i]:
                block.attentions = torch.nn.ModuleList(
                    [TorchTransformer2D(out, heads, ctx)
                     for _ in range(cfg.layers_per_block)]
                )
            if i < n - 1:
                block.downsamplers = torch.nn.ModuleList([TorchDownsample(out)])
            self.down_blocks.append(block)
            self._down_meta.append(
                (cfg.down_block_has_attn[i], i < n - 1)
            )
            prev = out

        mid = ch[-1]
        self.mid_block = torch.nn.Module()
        self.mid_block.resnets = torch.nn.ModuleList(
            [TorchResnetBlock2D(mid, mid, temb=temb_dim),
             TorchResnetBlock2D(mid, mid, temb=temb_dim)]
        )
        self.mid_block.attentions = torch.nn.ModuleList(
            [TorchTransformer2D(mid, heads, ctx)]
        )

        # skip-channel bookkeeping mirrors diffusers: conv_in + per-down-block
        # residuals (one per resnet, plus the downsample output)
        skip_channels = [ch[0]]
        for i, out in enumerate(ch):
            skip_channels += [out] * cfg.layers_per_block
            if i < n - 1:
                skip_channels.append(out)

        self.up_blocks = torch.nn.ModuleList()
        self._up_meta = []
        rev_ch = list(reversed(ch))
        rev_attn = list(reversed(cfg.down_block_has_attn))
        prev = ch[-1]
        for i, out in enumerate(rev_ch):
            block = torch.nn.Module()
            resnets = []
            for j in range(cfg.layers_per_block + 1):
                skip = skip_channels.pop()
                resnets.append(
                    TorchResnetBlock2D(prev + skip, out, temb=temb_dim)
                )
                prev = out
            block.resnets = torch.nn.ModuleList(resnets)
            if rev_attn[i]:
                block.attentions = torch.nn.ModuleList(
                    [TorchTransformer2D(out, heads, ctx)
                     for _ in range(cfg.layers_per_block + 1)]
                )
            if i < n - 1:
                block.upsamplers = torch.nn.ModuleList([TorchUpsample(out)])
            self.up_blocks.append(block)
            self._up_meta.append((rev_attn[i], i < n - 1))

        self.conv_norm_out = torch.nn.GroupNorm(_gn(ch[0]), ch[0], eps=1e-5)
        self.conv_out = torch.nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def _time_proj(self, t):
        """diffusers Timesteps: flip_sin_to_cos=True, freq_shift=0."""
        half = self.cfg.block_out_channels[0] // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, context):
        temb = self.time_embedding.linear_2(
            torch.nn.functional.silu(
                self.time_embedding.linear_1(self._time_proj(t))
            )
        )
        x = self.conv_in(x)
        skips = [x]
        for block, (has_attn, has_down) in zip(self.down_blocks, self._down_meta):
            for j, resnet in enumerate(block.resnets):
                x = resnet(x, temb)
                if has_attn:
                    x = block.attentions[j](x, context)
                skips.append(x)
            if has_down:
                x = block.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, context)
        x = self.mid_block.resnets[1](x, temb)

        for block, (has_attn, has_up) in zip(self.up_blocks, self._up_meta):
            for j, resnet in enumerate(block.resnets):
                skip = skips.pop()
                pair = (skip, x) if self.flip else (x, skip)
                x = resnet(torch.cat(pair, dim=1), temb)
                if has_attn:
                    x = block.attentions[j](x, context)
            if has_up:
                x = block.upsamplers[0](x)
        assert not skips
        return self.conv_out(
            torch.nn.functional.silu(self.conv_norm_out(x))
        )


class _TorchVAEResnet(torch.nn.Module):
    """ResnetBlock2D without time embedding (diffusers temb_channels=None).

    Group count follows our GroupNorm's gcd rule for non-divisible channel
    counts (tiny geometry only; real SD channels are all 32-divisible).
    """

    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(_gn(cin), cin, eps=1e-5)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = torch.nn.GroupNorm(_gn(cout), cout, eps=1e-5)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (
            torch.nn.Conv2d(cin, cout, 1) if cin != cout else None
        )

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        res = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return h + res


def _vae_resnet(cin, cout):
    return _TorchVAEResnet(cin, cout)


class TorchTinyVAE(torch.nn.Module):
    """diffusers AutoencoderKL semantics at VAE_CFG geometry."""

    def __init__(self, cfg=VAE_CFG):
        super().__init__()
        ch = cfg.block_out_channels
        n = len(ch)

        enc = torch.nn.Module()
        enc.conv_in = torch.nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = torch.nn.ModuleList()
        prev = ch[0]
        for i, out in enumerate(ch):
            block = torch.nn.Module()
            block.resnets = torch.nn.ModuleList(
                [_vae_resnet(prev if j == 0 else out, out)
                 for j in range(cfg.layers_per_block)]
            )
            if i < n - 1:
                block.downsamplers = torch.nn.ModuleList(
                    [TorchDownsample(out, asymmetric=True)]
                )
            enc.down_blocks.append(block)
            prev = out
        enc.mid_block = torch.nn.Module()
        enc.mid_block.resnets = torch.nn.ModuleList(
            [_vae_resnet(ch[-1], ch[-1]), _vae_resnet(ch[-1], ch[-1])]
        )
        enc.mid_block.attentions = torch.nn.ModuleList(
            [TorchVAEAttention(ch[-1])]
        )
        enc.conv_norm_out = torch.nn.GroupNorm(_gn(ch[-1]), ch[-1], eps=1e-5)
        enc.conv_out = torch.nn.Conv2d(
            ch[-1], 2 * cfg.latent_channels, 3, padding=1
        )
        self.encoder = enc
        self.quant_conv = torch.nn.Conv2d(
            2 * cfg.latent_channels, 2 * cfg.latent_channels, 1
        )

        dec = torch.nn.Module()
        dec.conv_in = torch.nn.Conv2d(cfg.latent_channels, ch[-1], 3, padding=1)
        dec.mid_block = torch.nn.Module()
        dec.mid_block.resnets = torch.nn.ModuleList(
            [_vae_resnet(ch[-1], ch[-1]), _vae_resnet(ch[-1], ch[-1])]
        )
        dec.mid_block.attentions = torch.nn.ModuleList(
            [TorchVAEAttention(ch[-1])]
        )
        dec.up_blocks = torch.nn.ModuleList()
        prev = ch[-1]
        for i, out in enumerate(reversed(ch)):
            block = torch.nn.Module()
            block.resnets = torch.nn.ModuleList(
                [_vae_resnet(prev if j == 0 else out, out)
                 for j in range(cfg.layers_per_block + 1)]
            )
            if i < n - 1:
                block.upsamplers = torch.nn.ModuleList([TorchUpsample(out)])
            dec.up_blocks.append(block)
            prev = out
        dec.conv_norm_out = torch.nn.GroupNorm(_gn(ch[0]), ch[0], eps=1e-5)
        dec.conv_out = torch.nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)
        self.decoder = dec
        self.post_quant_conv = torch.nn.Conv2d(
            cfg.latent_channels, cfg.latent_channels, 1
        )
        self._n = n

    def encode(self, x):
        enc = self.encoder
        x = enc.conv_in(x)
        for i, block in enumerate(enc.down_blocks):
            for resnet in block.resnets:
                x = resnet(x)
            if i < self._n - 1:
                x = block.downsamplers[0](x)
        x = enc.mid_block.resnets[0](x)
        x = enc.mid_block.attentions[0](x)
        x = enc.mid_block.resnets[1](x)
        x = enc.conv_out(torch.nn.functional.silu(enc.conv_norm_out(x)))
        return self.quant_conv(x)

    def decode(self, z):
        dec = self.decoder
        x = dec.conv_in(self.post_quant_conv(z))
        x = dec.mid_block.resnets[0](x)
        x = dec.mid_block.attentions[0](x)
        x = dec.mid_block.resnets[1](x)
        for i, block in enumerate(dec.up_blocks):
            for resnet in block.resnets:
                x = resnet(x)
            if i < self._n - 1:
                x = block.upsamplers[0](x)
        return dec.conv_out(torch.nn.functional.silu(dec.conv_norm_out(x)))


def _convert(module):
    state = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return from_diffusers_torch(state)


def _unet_inputs():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([7, 301], np.int64)
    ctx = rs.randn(2, 7, 32).astype(np.float32)
    return x, t, ctx


def test_full_unet_activation_parity():
    """Converted torch full UNet == our Flax UNet2DCondition end-to-end."""
    torch.manual_seed(0)
    tmod = TorchTinyUNet().eval()
    params = _convert(tmod)

    x, t, ctx = _unet_inputs()
    with torch.no_grad():
        want = tmod(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)
        ).numpy()

    fmod = UNet2DCondition(UNET_CFG)
    got = np.asarray(
        fmod.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_full_unet_oracle_catches_skip_order_flip():
    """A flipped up-block concat order must NOT pass the oracle."""
    torch.manual_seed(0)
    tmod = TorchTinyUNet(flip_skip_concat=True).eval()
    params = _convert(tmod)

    x, t, ctx = _unet_inputs()
    with torch.no_grad():
        want = tmod(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)
        ).numpy()

    fmod = UNet2DCondition(UNET_CFG)
    got = np.asarray(
        fmod.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
    )
    assert np.max(np.abs(got - want)) > 1e-3, (
        "skip-order flip produced identical activations: oracle is blind"
    )


def test_full_vae_activation_parity():
    """Converted torch AutoencoderKL == our Flax VAE (encode and decode)."""
    torch.manual_seed(1)
    tmod = TorchTinyVAE().eval()
    params = _convert(tmod)
    fmod = AutoencoderKL(VAE_CFG)

    rs = np.random.RandomState(1)
    img = rs.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want_moments = tmod.encode(torch.from_numpy(img)).numpy()
    got_moments = np.asarray(
        fmod.apply({"params": params}, jnp.asarray(img), method=fmod.encode)
    )
    np.testing.assert_allclose(got_moments, want_moments, atol=5e-5, rtol=1e-4)

    z = rs.randn(2, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        want_img = tmod.decode(torch.from_numpy(z)).numpy()
    got_img = np.asarray(
        fmod.apply({"params": params}, jnp.asarray(z), method=fmod.decode)
    )
    np.testing.assert_allclose(got_img, want_img, atol=5e-5, rtol=1e-4)
