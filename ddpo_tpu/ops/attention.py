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

Training uses a full Pallas backward (dq and dk/dv kernels that recompute
probability blocks from the forward's saved logsumexp) so the VJP never
materializes (S, S) score matrices in HBM either; gradient parity vs the XLA
implementation is tested at fp32 tolerance (tests/test_ops.py). On non-TPU
backends the custom VJP falls back to differentiating the XLA reference.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len, block_k):
    """One (batch, head, q_block) program: stream K/V blocks, online softmax.

    q_ref: (1, 1, block_q, d) | k_ref, v_ref: (1, 1, padded_kv, d).
    kv_len is the true (unpadded) key length; padded keys are masked.
    Also writes the row logsumexp (for the Pallas backward).
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

    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_blocks(q, block_q, block_k, sq, sk, d):
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(sk, 128))
    # cap the p-buffer (block_q x block_k f32) + double-buffered K/V blocks
    # to stay inside scoped VMEM; matters for fp32 inputs (training path)
    itemsize = jnp.dtype(q.dtype).itemsize
    while block_k > 1024 and (
        block_q * block_k * 4 + 4 * block_k * _round_up(d, 128) * itemsize
    ) > 13 * 2**20:
        block_k //= 2
    return block_q, block_k


def _fold(x, s_pad):
    """(B, S, H, D) -> (B, H, S_pad, D)."""
    if s_pad != x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, s_pad - x.shape[1]), (0, 0), (0, 0)))
    return x.transpose(0, 2, 1, 3)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret, with_lse=False):
    """One (B,S,H,D)->(B,H,S,D) transpose per operand (Mosaic wants the
    block's trailing dim 128-divisible or equal to the full array dim, so D
    must be the trailing array dim); no D padding in HBM — VMEM tiles pad
    the 40/80/160 lanes internally."""
    b, sq, h, d = q.shape
    sk = k.shape[1]

    block_q, block_k = _pick_blocks(q, block_q, block_k, sq, sk, d)
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, block_k)

    qf, kf, vf = _fold(q, sq_pad), _fold(k, sk_pad), _fold(v, sk_pad)

    grid = (b, h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_len=sk, block_k=block_k
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ),
        # the full K/V block ((1,1,sk_pad,d) x2, double-buffered) is VMEM-
        # resident per program: at d>160 it exceeds the default 16M scoped
        # guard (VAE single-head d=512 at S=4096 needs 18.7M — found on
        # hardware, round 3). v5e has 128M VMEM; same lift as the backward.
        compiler_params=(
            None
            if pltpu is None or interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        ),
        interpret=interpret,
    )(qf, kf, vf)

    outs = out.transpose(0, 2, 1, 3)  # back to (B, S, H, D)
    outs = outs[:, :sq] if sq_pad != sq else outs
    if with_lse:
        return outs, lse  # lse stays in the folded (B, H, S_pad, 1) layout
    return outs


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, kv_len, block_k,
):
    """dQ for one (batch, head, q_block): stream K/V, recompute P blocks.

    dS = P * (dO V^T - delta); dQ = scale * dS K.
    """
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # (block_q, 1) f32
    delta = delta_ref[0, 0]  # (block_q, 1) f32
    block_q, d = q.shape
    num_kv_blocks = k_ref.shape[2] // block_k

    def body(i, dq):
        k_blk = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        key_ids = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), dimension=1
        )
        s = jnp.where(key_ids < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_kv_blocks, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, kv_len, block_q,
):
    """dK/dV for one (batch, head, kv_block): stream Q/dO blocks.

    dV = sum_i P_i^T dO_i ; dK = scale * sum_i dS_i^T Q_i.
    """
    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)
    block_k, d = k_blk.shape
    num_q_blocks = q_ref.shape[2] // block_q
    kv_base = pl.program_id(2) * block_k
    key_ids = kv_base + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), dimension=1
    )

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_ids < kv_len, s, NEG_INF)
        # padded q rows (q=0, do=0, lse=log(kv_len)) contribute zeros already
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, num_q_blocks, body,
        (jnp.zeros((block_k, d), jnp.float32), jnp.zeros((block_k, d), jnp.float32)),
    )
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale, block_q, block_k, interpret):
    """Pallas dq/dk/dv. lse is in the folded (B, H, Sq_pad, 1) layout."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q, block_k = _pick_blocks(q, block_q, block_k, sq, sk, d)
    # The backward kernels keep up to ~6 (block_q, block_k) f32 buffers
    # live at once (s, p, dp, ds, the key-id iota mask, and scheduling
    # slack) plus f32 casts of the K/V blocks and the double-buffered
    # full-sequence refs. With the forward's block_k the stack exceeds the
    # default 16M scoped-VMEM guard at S=4096 (21.8M bf16 / 17.8M fp32,
    # measured on v5e at the 512px training shape), so (a) cap block_k so
    # the modeled stack stays ~24M and (b) lift the scoped guard to 64M —
    # v5e has 128M VMEM and the measured stack at block_k=1024 is ~18M.
    d_pad = _round_up(d, 128)
    while block_k > 128 and (
        6 * block_q * block_k * 4 + 2 * block_k * d_pad * 4
    ) > 24 * 2**20:
        block_k //= 2
    bwd_params = {}
    if pltpu is not None and not interpret:
        bwd_params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20
        )
    # the dkv kernel holds full Q/dO plus a K/V block; keep q chunks modest
    bwd_block_q = min(block_q, 512)
    sq_pad = _round_up(sq, block_q)
    if sq_pad % bwd_block_q:
        bwd_block_q = block_q
    sk_pad = _round_up(sk, block_k)

    qf, dof = _fold(q, sq_pad), _fold(g, sq_pad)
    kf, vf = _fold(k, sk_pad), _fold(v, sk_pad)
    if lse.shape[2] < sq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_pad - lse.shape[2]), (0, 0)))
    elif lse.shape[2] > sq_pad:
        lse = lse[:, :, :sq_pad]

    # delta_i = rowsum(dO_i * O_i): cheap elementwise+reduce, fused by XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (B, Sq, H)
    delta = delta.transpose(0, 2, 1)[..., None]  # (B, H, Sq, 1)
    if sq_pad != sq:
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))

    row_spec = lambda bi, hi, qi: (bi, hi, qi, 0)
    full_q_spec = lambda bi, hi, ki: (bi, hi, 0, 0)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, kv_len=sk, block_k=block_k
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        grid=(b, h, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), row_spec),
            pl.BlockSpec((1, 1, sk_pad, d), full_q_spec),
            pl.BlockSpec((1, 1, sk_pad, d), full_q_spec),
            pl.BlockSpec((1, 1, block_q, d), row_spec),
            pl.BlockSpec((1, 1, block_q, 1), row_spec),
            pl.BlockSpec((1, 1, block_q, 1), row_spec),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), row_spec),
        interpret=interpret,
        **bwd_params,
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, kv_len=sk,
            block_q=bwd_block_q,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk_pad, d), v.dtype),
        ),
        grid=(b, h, sk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, sq_pad, d), full_q_spec),
            pl.BlockSpec((1, 1, block_k, d), row_spec),
            pl.BlockSpec((1, 1, block_k, d), row_spec),
            pl.BlockSpec((1, 1, sq_pad, d), full_q_spec),
            pl.BlockSpec((1, 1, sq_pad, 1), full_q_spec),
            pl.BlockSpec((1, 1, sq_pad, 1), full_q_spec),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), row_spec),
            pl.BlockSpec((1, 1, block_k, d), row_spec),
        ),
        interpret=interpret,
        **bwd_params,
    )(qf, kf, vf, dof, lse, delta)

    def unfold(x, s):
        x = x.transpose(0, 2, 1, 3)
        return x[:, :s] if x.shape[1] != s else x

    return unfold(dq, sq), unfold(dk, sk), unfold(dv, sk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q, k, v, scale=None, block_q=512, block_k=4096, interpret=False
):
    """Pallas flash attention with a Pallas backward (dq + dk/dv kernels
    recomputing P blocks from the saved logsumexp), so neither direction
    materializes scores in HBM. On non-Pallas backends (plain CPU) the VJP
    differentiates the XLA reference instead.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


# Block sizes tuned on TPU v5e at the SD latent self-attention shape
# (B*H=64, S=4096, D=40): bq=512/bk=4096 (whole K/V per program for SD
# shapes) measured 2.25x faster than XLA attention; larger q blocks OOM the
# scoped VMEM (p-buffer is block_q x block_k f32). See bench_ops.py.


def _use_pallas_bwd(q, interpret) -> bool:
    """Pallas backward for bf16 training (1.5x the fp32 per-timestep
    baseline, bench_train.py) and for interpret-mode parity tests. fp32
    training keeps the XLA-recompute VJP: pinning fp32 (q, k, v, out, lse)
    residuals for every attention under whole-model rematerialization
    exceeds 16GB HBM at the 512px CFG train shape (RESOURCE_EXHAUSTED
    measured on v5e; the reference's own fp32 config needed 32GB v4 chips).
    """
    return interpret or q.dtype == jnp.bfloat16


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if _use_pallas_bwd(q, interpret):
        out, lse = _flash_forward(
            q, k, v, scale, block_q, block_k, interpret, with_lse=True
        )
        return out, (q, k, v, out, lse)
    out = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, None, None)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if out is None:  # fp32 on hardware: differentiate the XLA reference
        _, vjp = jax.vjp(
            lambda q_, k_, v_: xla_attention(q_, k_, v_, scale), q, k, v
        )
        return vjp(g)
    return _flash_backward(
        q, k, v, out, lse, g, scale, block_q, block_k, interpret
    )


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# Process-wide dispatch override. GSPMD cannot partition pallas_call
# operands, so drivers running tensor parallelism through plain jit force
# the XLA path (set_flash_enabled(False)); None = automatic dispatch.
_FLASH_OVERRIDE: Optional[bool] = None


def set_flash_enabled(value: Optional[bool]) -> None:
    """Force (True/False) or restore automatic (None) flash dispatch.

    True forces the Pallas kernel even where auto-dispatch would pick XLA
    (short KV, non-TPU backends — useful for dispatch assertions in tests);
    False forces XLA everywhere; None restores automatic dispatch.

    The override is read at TRACE time and is not part of any jit cache
    key: calling this after a function has been traced has no effect on the
    already-compiled executable. Set it before the first trace (as the
    drivers do), or pass use_flash explicitly to attention().
    """
    global _FLASH_OVERRIDE
    _FLASH_OVERRIDE = value


# Mesh-axis sharding for the model's self-attention. GSPMD cannot partition
# pallas_call operands, so tensor-parallel (heads axis) and sequence-parallel
# (query-sequence axis) runs route self-attention through an inner shard_map:
# each device's program sees concrete local shards and dispatches through the
# normal flash/XLA logic — the Pallas kernel stays live under tp/sp (VERDICT
# round-2 items #3/#6; the round-2 design forced XLA via set_flash_enabled).
# Read at TRACE time, like _FLASH_OVERRIDE: set before the first jit trace.
_SHARD_CTX: Optional[dict] = None


def set_attention_sharding(
    mesh=None,
    batch_axis: Optional[str] = None,
    heads_axis: Optional[str] = None,
    seq_axis: Optional[str] = None,
) -> None:
    """Shard self-attention over mesh axes (None mesh disables).

    batch_axis: data-parallel axis the (2B) CFG batch dim is sharded over.
    heads_axis: tensor-parallel axis; heads split across it (to_q/k/v output
        sharding produces exactly this layout, parallel/sharding.py rules).
    seq_axis: sequence-parallel axis; the query sequence splits across it and
        K/V are all-gathered inside the shard (exact softmax; the per-shard
        math of parallel/sequence.py::sequence_parallel_attention).

    Cross-attention (Sq != Sk, 77-token text context) stays on the plain
    path — at Sk=77 there is nothing to shard and GSPMD partitions it fine.

    KNOWN LIMIT (trainers must not combine sp>1 with tp>1): with BOTH manual
    axes active, XLA's manual<->auto partitioning boundary miscounts the
    weight gradients of surrounding convolutions by exactly 2x (measured on
    jax 0.9 CPU meshes: conv kernels 2.0x, every Dense/GN grad and the full
    forward exact — see tests/test_parallel.py). Forward-only use (sampling)
    is unaffected. The pg driver rejects sp>1 && tp>1.
    """
    global _SHARD_CTX
    if mesh is None:
        _SHARD_CTX = None
        return
    _SHARD_CTX = {
        "mesh": mesh,
        "batch": batch_axis,
        "heads": heads_axis,
        "seq": seq_axis,
    }


def _axis_size(mesh, axis: Optional[str]) -> int:
    return mesh.shape[axis] if axis and axis in mesh.shape else 1


def _sharded_self_attention(q, k, v, scale):
    """shard_map self-attention over the configured mesh axes."""
    from jax.sharding import PartitionSpec as P

    from ddpo_tpu.parallel.mesh import shard_map_compat

    ctx = _SHARD_CTX
    mesh = ctx["mesh"]
    heads_ax = ctx["heads"] if _axis_size(mesh, ctx["heads"]) > 1 else None
    seq_ax = ctx["seq"] if _axis_size(mesh, ctx["seq"]) > 1 else None
    batch_ax = ctx["batch"] if _axis_size(mesh, ctx["batch"]) > 1 else None
    if heads_ax and q.shape[2] % mesh.shape[heads_ax]:
        heads_ax = None
    if seq_ax and (q.shape[1] % mesh.shape[seq_ax] or k.shape[1] % mesh.shape[seq_ax]):
        seq_ax = None
    if batch_ax and q.shape[0] % mesh.shape[batch_ax]:
        # e.g. a batch-1 trace (init, single-sample preview) while the ctx
        # is active: leave the batch dim to GSPMD rather than erroring
        batch_ax = None
    if not (heads_ax or seq_ax):
        return None  # nothing to shard beyond what GSPMD already does

    local_sq = q.shape[1] // _axis_size(mesh, seq_ax)
    local_sk = k.shape[1]  # gathered inside the shard
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_flash = (
        on_tpu and local_sq >= 256 and local_sk >= 256 and q.shape[-1] <= 256
    )
    if _FLASH_OVERRIDE is not None:
        use_flash = _FLASH_OVERRIDE

    def local(q_, k_, v_):
        if seq_ax:
            k_ = jax.lax.all_gather(k_, seq_ax, axis=1, tiled=True)
            v_ = jax.lax.all_gather(v_, seq_ax, axis=1, tiled=True)
        if use_flash:
            return flash_attention(q_, k_, v_, scale)
        return xla_attention(q_, k_, v_, scale)

    spec = P(batch_ax, seq_ax, heads_ax, None)
    return shard_map_compat(
        local, mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Dispatching entry point used by the models.

    use_flash=None -> auto: Pallas kernel on TPU backends for all UNet
    self-attention levels (measured faster at every S>=256 on v5e, see
    bench_ops.py), XLA elsewhere (CPU tests, 77-token cross-attention).
    Under an active set_attention_sharding context, self-attention runs
    inside a shard_map over the configured tp/sp axes (Pallas-compatible).

    spatial_axis: mesh axis name when ALREADY inside a shard_map with the
    sequence dim sharded over it (parallel/spatial.py — self-attention
    only): K/V are all-gathered over the axis (exact softmax on local
    queries) and dispatch proceeds on the local shapes. Mutually exclusive
    with the set_attention_sharding context (which shard_maps internally
    and cannot nest).
    """
    if spatial_axis is not None:
        from ddpo_tpu.ops.spatial import gather_kv

        k, v = gather_kv(k, v, spatial_axis)
        return attention(q, k, v, scale, use_flash)
    if _SHARD_CTX is not None and q.shape[1] == k.shape[1]:
        out = _sharded_self_attention(q, k, v, scale)
        if out is not None:
            return out
    if use_flash is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # Short-KV (77-token cross-attention) stays on the XLA path: routing
        # it through the kernel was measured 7% SLOWER end-to-end on v5e
        # (grid of tiny per-program KV work + extra fold transposes beats the
        # XLA softmax's HBM traffic at Sk=77). See BENCHLOG.md round 2.
        # Head-dim gate: the kernel is measured profitable at the UNet head
        # dims (D=40/80/160); the VAE's single-head D=512 spatial attention
        # keeps 2 x S x D of K/V VMEM-resident per program and is better
        # (and validated) on the XLA path — it runs once per decode.
        use_flash = (
            on_tpu
            and q.shape[1] >= 256
            and k.shape[1] >= 256
            and q.shape[-1] <= 256
        )
        if _FLASH_OVERRIDE is not None:
            use_flash = _FLASH_OVERRIDE
    if use_flash:
        return flash_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
