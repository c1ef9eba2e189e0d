"""Isolate where the Pallas conv kernel's time goes (64x64x320->320 @ B16).

Probes:
  p0: XLA batched einsum of the same FLOPs (the matmul-rate ceiling)
  p1: pallas kernel, 9 accumulated dots on the SAME unshifted input
      (no slicing/reshape) — matmul+acc structure ceiling
  p2: p1 + leading-dim dy slices (reshape cost)
  p3: the real conv kernel (adds the 3 shifted input fetches)
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ddpo_tpu.ops.conv import conv3x3_direct

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")

B, H, W, CIN, COUT = 16, 64, 64, 320, 320


def timeit(fn, *args, n=10):
    @jax.jit
    def many(*args):
        def body(carry, _):
            x, rest = carry[0], carry[1:]
            out = fn(x, *rest)
            x = x + (out.mean() * 1e-6).astype(x.dtype)
            return (x, *rest), ()

        carry, _ = jax.lax.scan(body, args, None, length=n)
        return carry[0]

    r = many(*args)
    jax.device_get(r.ravel()[0])
    t0 = time.perf_counter()
    r = many(*args)
    jax.device_get(r.ravel()[0])
    return (time.perf_counter() - t0) / n


def p1_kernel(x_ref, w_ref, o_ref):
    acc = jnp.zeros((H * W, COUT), jnp.float32)
    flat = x_ref[0].reshape(H * W, CIN)
    for i in range(9):
        acc += jnp.dot(flat, w_ref[i], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(H, W, COUT).astype(jnp.bfloat16)


def p1(x, w9):
    return pl.pallas_call(
        p1_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CIN, COUT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(x, w9)


def p2_kernel(x_ref, w_ref, o_ref):
    acc = jnp.zeros((H * W, COUT), jnp.float32)
    for dy in range(3):
        for i in range(3):
            win = x_ref[0, dy : dy + H].reshape(H * W, CIN)
            acc += jnp.dot(
                win, w_ref[3 * dy + i], preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.reshape(H, W, COUT).astype(jnp.bfloat16)


def p2(xh, w9):
    return pl.pallas_call(
        p2_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W, CIN), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CIN, COUT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(xh, w9)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, H, W, CIN), jnp.bfloat16)
    xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    w9 = jax.random.normal(kw, (9, CIN, COUT), jnp.bfloat16) * 0.02
    w = w9.reshape(3, 3, CIN, COUT)
    flops = 2 * B * H * W * 9 * CIN * COUT

    t0 = timeit(
        lambda x, w9: jnp.einsum(
            "bhwc,kcd->bhwd", x, w9, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16),
        x, w9,
    )
    print(f"p0 XLA einsum 9K-dot:  {t0*1e3:7.3f} ms ({flops/t0/1e12:5.1f} TF/s)")

    t1 = timeit(p1, x, w9)
    print(f"p1 pallas 9 dots:      {t1*1e3:7.3f} ms ({flops/t1/1e12:5.1f} TF/s)")

    t2 = timeit(lambda xh, w9: p2(xh, w9), xh, w9)
    print(f"p2 + dy slices:        {t2*1e3:7.3f} ms ({flops/t2/1e12:5.1f} TF/s)")

    t3 = timeit(lambda x, w: conv3x3_direct(x, w), x, w)
    print(f"p3 real conv kernel:   {t3*1e3:7.3f} ms ({flops/t3/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()


# --------- round 2 probes: where does MXU throughput actually live? -------- #

def p4_square(key):
    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )

    t = timeit(mm, a, a)
    fl = 2 * 8192**3
    print(f"p4 XLA 8192^3 matmul:  {t*1e3:7.3f} ms ({fl/t/1e12:5.1f} TF/s)")


def p5_kfolded_xla(x, w):
    # im2col in XLA (materialized in HBM) + one K=2880 dot
    def op(x, w2):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, dy : dy + H, dx : dx + W, :]
            for dy in range(3) for dx in range(3)
        ]
        a = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * CIN)
        return jnp.dot(a, w2, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )

    w2 = w.reshape(9 * CIN, COUT)
    t = timeit(op, x, w2)
    fl = 2 * B * H * W * 9 * CIN * COUT
    print(f"p5 XLA im2col K=2880:  {t*1e3:7.3f} ms ({fl/t/1e12:5.1f} TF/s)")


def p6_kernel(xl_ref, xc_ref, xr_ref, w_ref, o_ref):
    # fold dx into K via lane concat: 3 dots of K=3*CIN
    acc = jnp.zeros((H * W, COUT), jnp.float32)
    for dy in range(3):
        a = jnp.concatenate(
            [
                xl_ref[0, dy : dy + H].reshape(H * W, CIN),
                xc_ref[0, dy : dy + H].reshape(H * W, CIN),
                xr_ref[0, dy : dy + H].reshape(H * W, CIN),
            ],
            axis=1,
        )
        acc += jnp.dot(a, w_ref[dy], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(H, W, COUT).astype(jnp.bfloat16)


def p6(xl, xc, xr, w3):
    spec = pl.BlockSpec((1, H + 2, W, CIN), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        p6_kernel,
        grid=(B,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((3, 3 * CIN, COUT), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(xl, xc, xr, w3)


def p7_kernel(xl_ref, xc_ref, xr_ref, w_ref, o_ref):
    # full K fold: one dot of K=9*CIN
    parts = []
    for dy in range(3):
        for ref in (xl_ref, xc_ref, xr_ref):
            parts.append(ref[0, dy : dy + H].reshape(H * W, CIN))
    a = jnp.concatenate(parts, axis=1)  # (M, 9*CIN)
    acc = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(H, W, COUT).astype(jnp.bfloat16)


def p7(xl, xc, xr, w2):
    spec = pl.BlockSpec((1, H + 2, W, CIN), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        p7_kernel,
        grid=(B,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((9 * CIN, COUT), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, COUT), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(xl, xc, xr, w2)


def main2():
    print(f"device: {jax.devices()[0].device_kind}")
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, H, W, CIN), jnp.bfloat16)
    xh = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xl = jnp.pad(xh, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :W, :]
    xr = jnp.pad(xh, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    w9 = jax.random.normal(kw, (9, CIN, COUT), jnp.bfloat16) * 0.02
    flops = 2 * B * H * W * 9 * CIN * COUT

    p4_square(kx)
    p5_kfolded_xla(x, w9.reshape(3, 3, CIN, COUT))

    # weight order must match the kernel's concat order: dy outer, dx inner
    # (dx order: left(-1), center(0), right(+1) = dx index 0,1,2 in HWIO)
    w3 = w9.reshape(3, 3, CIN, COUT).transpose(0, 1, 2, 3).reshape(
        3, 3 * CIN, COUT
    )
    t6 = timeit(lambda xl, xc, xr, w3: p6(xl, xc, xr, w3), xl, xh, xr, w3)
    print(f"p6 pallas dx-fold K960: {t6*1e3:6.3f} ms ({flops/t6/1e12:5.1f} TF/s)")

    w2 = w9.reshape(3, 3, CIN, COUT).reshape(9 * CIN, COUT)
    t7 = timeit(lambda xl, xc, xr, w2: p7(xl, xc, xr, w2), xl, xh, xr, w2)
    print(f"p7 pallas full K2880:  {t7*1e3:7.3f} ms ({flops/t7/1e12:5.1f} TF/s)")


if __name__ == "__main__" and __import__("os").environ.get("PROBE2"):
    main2()
