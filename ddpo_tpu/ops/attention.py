"""Attention ops: XLA reference and a Pallas TPU flash-attention kernel.

The SD-1.4 UNet's hottest op is the 64x64-latent self-attention: sequence
length 4096 at 512px. A naive implementation materializes the (4096, 4096)
score matrix per head in HBM; the Pallas kernel streams K/V blocks through
VMEM with an online softmax so scores never hit HBM.

Replaces the attention inside the diffusers models the reference imports
(SURVEY.md section 2.11); there is no reference implementation to mirror —
the reference's attention lives in the diffusers dependency.

Layout: q (B, Sq, H, D), k/v (B, Sk, H, D) -> out (B, Sq, H, D).
Softmax is computed in float32 regardless of input dtype.

The kernel is forward-only + custom_vjp: the backward pass re-derives
gradients through the (mathematically identical) XLA implementation. This
keeps training exact while sampling (the throughput-critical, grad-free path)
uses the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable under the CPU test backend
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG_INF = -1e30


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention, fp32 softmax. Used for training and as oracle."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v
    )
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    """One (batch, head, q_block) program: stream K/V blocks, online softmax.

    q_ref: (1, 1, block_q, d) | k_ref, v_ref: (1, 1, padded_kv, d).
    kv_len is the true (unpadded) key length; padded keys are masked.
    """
    q = q_ref[0, 0].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kv_blocks = k_ref.shape[2] // block_k

    m0 = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        # mask out padded keys
        key_ids = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), dimension=1
        )
        s = jnp.where(key_ids < kv_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    _, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    """One (B,S,H,D)->(B,H,S,D) transpose per operand (Mosaic wants the
    block's trailing dim 128-divisible or equal to the full array dim, so D
    must be the trailing array dim); no D padding in HBM — VMEM tiles pad
    the 40/80/160 lanes internally."""
    b, sq, h, d = q.shape
    sk = k.shape[1]

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    # cap the p-buffer (block_q x block_k f32) + double-buffered K/V blocks
    # to stay inside scoped VMEM; matters for fp32 inputs (training path)
    itemsize = jnp.dtype(q.dtype).itemsize
    while block_k > 1024 and (
        block_q * block_k * 4 + 4 * block_k * _round_up(d, 128) * itemsize
    ) > 13 * 2**20:
        block_k //= 2
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    def fold(x, s_pad):
        if s_pad != x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)  # (B, H, S, D)

    qf, kf, vf = fold(q, sq_pad), fold(k, sk_pad), fold(v, sk_pad)

    grid = (b, h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=sk, block_k=block_k
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.transpose(0, 2, 1, 3)  # back to (B, S, H, D)
    return out[:, :sq] if sq_pad != sq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q, k, v, scale=None, block_q=512, block_k=4096, interpret=False
):
    """Pallas flash attention. Forward on TPU/interpreter; exact-math custom
    VJP through the XLA reference (recompute, no score materialization saved).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


# Block sizes tuned on TPU v5e at the SD latent self-attention shape
# (B*H=64, S=4096, D=40): bq=512/bk=4096 (whole K/V per program for SD
# shapes) measured 2.25x faster than XLA attention; larger q blocks OOM the
# scoped VMEM (p-buffer is block_q x block_k f32). See bench_ops.py.


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = flash_attention(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching entry point used by the models.

    use_flash=None -> auto: Pallas kernel on TPU backends for all UNet
    self-attention levels (measured faster at every S>=256 on v5e, see
    bench_ops.py), XLA elsewhere (CPU tests, 77-token cross-attention).
    """
    if use_flash is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        use_flash = on_tpu and q.shape[1] >= 256 and k.shape[1] >= 256
    if use_flash:
        return flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
