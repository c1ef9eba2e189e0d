"""W8A8 dynamic-quantized 3x3 conv for inference sampling.

The v5e MXU runs int8xint8->int32 at twice the bf16 rate (394 vs 197
TOPS/TF nominal). Measured at the SD-1.4 UNet's production conv shapes
(bench_int8_probe.py, v5e, relay-safe two-scan-length methodology), the
COMPLETE quantized pattern — dynamic per-sample activation scales, int8
conv, fp32 rescale — beats the bf16 conv by 1.27x (64px, Cin=320) to 3.1x
(8px, Cin=1280); weight quantization is loop-invariant under the sampler
scan and XLA hoists it out.

Quantization scheme (inference-only; training always runs the bf16/fp32
paths — the PPO trust region is calibrated to bf16 recompute noise and a
~1% weight perturbation would swamp it):
  - weights:     symmetric per-output-channel int8, scale = absmax/127
                 over (kh, kw, cin). Computed from the runtime weight
                 arg, so finetuned/LoRA-merged checkpoints quantize
                 correctly with no calibration pass.
  - activations: symmetric per-sample (per batch element) int8, scale =
                 absmax/127 over (h, w, c), computed on the fly. Dynamic
                 scales cost one reduction per conv (VPU, overlapped) and
                 avoid any calibration dataset.
  - accumulate int32 on the MXU, rescale in fp32, return x.dtype.

Only the stride-1 3x3 resnet/upsampler convs quantize (ops/conv.py
dispatch): they carry most of the UNet's conv FLOPs. The probe's int8
matmul results at attention/FF shapes were mixed (0.7x-3x), so Dense
layers stay bf16. The VAE decoder is untouched — it runs once per batch
and sets final image quality.

Reference workload: the 50-step sampler scan this accelerates,
/root/reference/ddpo/diffusers_patch/pipeline_flax_stable_diffusion.py:204-255.
The reference has no quantized inference path of any kind.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-12  # guards all-zero slices; scale stays positive


def quantize_symmetric(x: jnp.ndarray, axes, *, bound: int = 127):
    """Symmetric int8 quantization along the kept dims.

    Returns (q_int8, scale_f32) with x ~= q * scale; scale broadcasts
    against x (reduced axes kept as size-1 dims).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / bound
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -bound, bound).astype(jnp.int8)
    return q, scale


def conv3x3_w8a8(
    x: jnp.ndarray,  # (B, H, W, Cin) NHWC, any float dtype
    w: jnp.ndarray,  # (3, 3, Cin, Cout) HWIO
    bias: Optional[jnp.ndarray] = None,  # (Cout,)
    *,
    padding=((1, 1), (1, 1)),
) -> jnp.ndarray:
    """stride-1 3x3 conv on the int8 MXU path; returns x.dtype.

    padding is exposed for the halo-exchange spatial path (VALID over H
    after the shard has fetched its boundary rows, ops/spatial.py).

    INFERENCE ONLY: the round/clip/int8 cast is non-differentiable, so a
    custom_vjp backward raises at trace time instead of silently emitting
    zero gradients — a training/calibration path composed with quant=True
    fails loudly (drivers gate the flag to inference, pipelines/sample.py
    and pipelines/generate.py, but the op defends itself).
    """

    def _impl(x, w, bias):
        xq, sx = quantize_symmetric(x, (1, 2, 3))    # (B,1,1,1)
        wq, sw = quantize_symmetric(w, (0, 1, 2))    # (1,1,1,Cout) -> squeeze
        acc = jax.lax.conv_general_dilated(
            xq, wq,
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (sx * sw[0])  # (B,1,1,1)*(1,1,Cout)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)

    @jax.custom_vjp
    def _conv(x, w, bias):
        return _impl(x, w, bias)

    def _fwd(x, w, bias):
        return _impl(x, w, bias), None

    def _bwd(res, g):
        raise NotImplementedError(
            "conv3x3_w8a8 is an inference-only op: the int8 round/clip is "
            "non-differentiable. Train with quant disabled (the default); "
            "quantize only the sampling/inference UNet."
        )

    _conv.defvjp(_fwd, _bwd)
    return _conv(x, w, bias)
