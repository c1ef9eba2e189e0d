"""Pallas direct 3x3 conv (stride 1, SAME) for the UNet's spatial convs.

XLA's conv emitter runs the SD-1.4 resnet convs at ~30 TF/s on v5e (~15% of
bf16 peak; BENCHLOG.md round-3 microbench), making convolutions the last
structural lever in the sampler. This kernel reformulates the conv as 9
accumulated (H*W, Cin) x (Cin, bco) matmuls with fp32 accumulation, one
(batch, channel-block) program per grid cell.

Layout trick: the three dx-shifted column windows are prepared OUTSIDE the
kernel (XLA pad+slice, pure HBM bandwidth) so that in-kernel windows are
leading-dim row slices of contiguous (H+2, W, Cin) blocks — reshape
(H, W, Cin) -> (H*W, Cin) is then layout-preserving (W is a sublane
multiple) and the MXU sees its operands without any in-VMEM re-tiling.
Slicing dx inside the kernel instead (offset 1 on the sublane dim) forces a
relayout copy per window and measured SLOWER than XLA (4.4 vs 3.9 ms at
64x64x320; BENCHLOG.md).

  grid (B, Cout/bco):
    xl/xc/xr blocks: (1, H+2, W, Cin)  dx = -1 / 0 / +1 column windows
    w block:         (3, 3, Cin, bco)
    out:             (1, H, W, bco)

Shapes are static per UNet level (64/32/16/8 px), so each level compiles its
own specialization. Backward stays on XLA (sampling is forward-only; the
training path differentiates the XLA reference conv — same math).

Reference workload: the 50-step CFG sampler scan
(/root/reference/ddpo/diffusers_patch/pipeline_flax_stable_diffusion.py:
204-255); conv sites ddpo_tpu/models/layers.py (ResnetBlock conv1/conv2,
up/downsamplers).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_co(cout: int, h: int, w: int, cin: int) -> int:
    """Largest output-channel block that divides Cout and fits VMEM."""
    budget = 48 * 1024 * 1024
    for bco in (cout, 512, 256, 128, 64):
        if cout % bco:
            continue
        acc_bytes = h * w * bco * 4
        w_bytes = 9 * cin * bco * 2
        x_bytes = 3 * (h + 2) * w * cin * 2
        if acc_bytes + w_bytes + 2 * x_bytes <= budget:
            return bco
    return cout


def _conv3x3_kernel(xl_ref, xc_ref, xr_ref, w_ref, o_ref, *,
                    height, width, cin, bco, out_dtype, kfold):
    if kfold:
        # im2col inside VMEM: one (H*W, 9*Cin) x (9*Cin, bco) dot. The
        # K=Cin-per-tap formulation starves the MXU (31 TF/s even for XLA's
        # own einsum at Cin=320 — BENCHLOG round 3); folding all 9 taps
        # into K raises per-tile arithmetic intensity. Window slices are
        # leading-dim (free); the concat is a VMEM copy.
        parts = []
        for dy in range(3):
            for ref in (xl_ref, xc_ref, xr_ref):
                parts.append(
                    ref[0, dy : dy + height].reshape(height * width, cin)
                )
        a = jnp.concatenate(parts, axis=1)  # (M, 9*Cin), (dy, dx)-major
        acc = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((height * width, bco), jnp.float32)
        for dy in range(3):
            for dx, ref in enumerate((xl_ref, xc_ref, xr_ref)):
                win = ref[0, dy : dy + height].reshape(height * width, cin)
                acc += jnp.dot(
                    win, w_ref[3 * dy + dx], preferred_element_type=jnp.float32
                )
    o_ref[0] = acc.reshape(height, width, bco).astype(out_dtype)


def conv3x3_direct(
    x: jnp.ndarray,  # (B, H, W, Cin) NHWC
    w: jnp.ndarray,  # (3, 3, Cin, Cout) HWIO (flax nn.Conv layout)
    bias: Optional[jnp.ndarray] = None,  # (Cout,)
    interpret: bool = False,
    kfold: bool = True,
) -> jnp.ndarray:
    """stride-1 SAME 3x3 conv; returns (B, H, W, Cout) in x.dtype."""
    b, h, width, cin = x.shape
    kh, kw, wcin, cout = w.shape
    assert (kh, kw) == (3, 3) and wcin == cin, (w.shape, x.shape)

    bco = _pick_block_co(cout, h, width, cin)
    assert cout % bco == 0, (cout, bco)

    # dx column windows, prepared in HBM: zero-pad H once, then shift W
    xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))  # (B, H+2, W, Cin)
    xl = jnp.pad(xh, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :width, :]
    xr = jnp.pad(xh, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]

    kernel = functools.partial(
        _conv3x3_kernel, height=h, width=width, cin=cin, bco=bco,
        out_dtype=x.dtype, kfold=kfold,
    )
    x_spec = pl.BlockSpec(
        (1, h + 2, width, cin), lambda i, j: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if kfold:
        w_arg = w.reshape(9 * cin, cout)  # (dy, dx, cin)-major K
        w_spec = pl.BlockSpec(
            (9 * cin, bco), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
    else:
        w_arg = w.reshape(9, cin, cout)
        w_spec = pl.BlockSpec(
            (9, cin, bco), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        kernel,
        grid=(b, cout // bco),
        in_specs=[x_spec, x_spec, x_spec, w_spec],
        out_specs=pl.BlockSpec(
            (1, h, width, bco), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * width * 9 * cin * cout,
            bytes_accessed=(
                3 * xh.size * xh.dtype.itemsize
                + w.size * w.dtype.itemsize
                + b * h * width * cout * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xl, xh, xr, w_arg)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv3x3_xla(x, w, bias=None):
    """XLA reference: lax.conv_general_dilated in NHWC/HWIO."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Dispatching entry point for the models (mirrors ops.attention's design):
# Pallas forward on TPU where profitable, XLA elsewhere; backward always
# differentiates the XLA reference (identical math, no second kernel to
# validate; sampling — the hot path — is forward-only).
# ---------------------------------------------------------------------------

_CONV_OVERRIDE: Optional[bool] = None


def set_conv_kernel_enabled(value: Optional[bool]) -> None:
    """Force (True/False) or restore automatic (None) Pallas conv dispatch.

    Read at TRACE time (not part of any jit cache key) — set before the
    first trace, as with set_flash_enabled. Drivers running tensor/sequence
    parallelism through plain jit must force False: GSPMD cannot partition
    pallas_call operands (the dp shard_map sampler path is fine — kernels
    there see local shards).
    """
    global _CONV_OVERRIDE
    _CONV_OVERRIDE = value


def _kernel_profitable(x_shape, w_shape) -> bool:
    """Shapes where the Pallas conv measured faster than XLA on v5e.

    Updated with bench_conv.py results; conservative default is False
    (kernel v1 lost at every production shape — BENCHLOG round 3). The
    K-folded v2 flips this where it wins.
    """
    return False


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _conv3x3_pallas_op(x, w):
    return conv3x3_direct(x, w)


def _conv3x3_fwd(x, w):
    return conv3x3_direct(x, w), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_: conv3x3_xla(x_, w_), x, w)
    return vjp(g)


_conv3x3_pallas_op.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3(x, w, bias=None, spatial_axis=None, quant=False):
    """3x3 stride-1 SAME conv used by the model layers.

    Auto-dispatch: the Pallas kernel on TPU backends at shapes where it
    measured faster than XLA's conv emitter (bench_conv.py), XLA otherwise.

    spatial_axis: mesh axis name when running INSIDE a shard_map with the
    H dim sharded over it (parallel/spatial.py). The shard exchanges one
    halo row with each H neighbor and convolves VALID over H — exactly
    global SAME padding (ops/spatial.py docstring).

    quant: W8A8 dynamic int8 path for inference sampling (ops/quant.py) —
    2x-rate MXU, measured 1.27-3.1x at production shapes. Composes with
    spatial_axis (activation scales become shard-local, still a valid
    symmetric quantization). quant=True takes precedence over the
    _CONV_OVERRIDE/Pallas dispatch below: fixtures that force the Pallas
    kernel (set_conv_override) exercise the XLA int8 path when quant is
    on — intentional, the int8 conv has no Pallas variant.
    """
    if spatial_axis is not None:
        from ddpo_tpu.ops.spatial import halo_exchange_rows

        xh = halo_exchange_rows(x, spatial_axis)
        if quant:
            from ddpo_tpu.ops.quant import conv3x3_w8a8

            return conv3x3_w8a8(xh, w, bias, padding=((0, 0), (1, 1)))
        out = jax.lax.conv_general_dilated(
            xh, w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    if quant:
        from ddpo_tpu.ops.quant import conv3x3_w8a8

        return conv3x3_w8a8(x, w, bias)
    use_kernel = _CONV_OVERRIDE
    if use_kernel is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # shape policy from bench_conv.py measurements on v5e
        use_kernel = on_tpu and _kernel_profitable(x.shape, w.shape)
    if use_kernel:
        out = _conv3x3_pallas_op(x, w)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out
    return conv3x3_xla(x, w, bias)
