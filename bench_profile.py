"""Decompose UNet step time on the real chip: which blocks cost what.

Times each SD-1.4 UNet component at its real 512px shapes (CFG batch 2*B)
with the scan-carry methodology from bench_ops.py (carry dependence defeats
loop-invariant hoisting; per-dispatch timing is meaningless through the
remote relay). Each op is wrapped so its output is adapted back to the input
shape (slice/tile — fused into the carry add, negligible) to keep the
dependence chain. Drives kernel-optimization priorities.

Usage: python bench_profile.py [batch] [--quant]

--quant profiles the W8A8 int8 inference configuration (quantized resnet
and up/downsample convs, ops/quant.py) — the round-2/3 bf16 decomposition
(attention 28%, elementwise ~45%, convs 12%) predates the int8 conv path;
this pins the post-quantization bottleneck ordering.
"""

import sys
import time

import jax
import jax.numpy as jnp


def timeit_looped(op, args, n=10):
    @jax.jit
    def many(args):
        def body(carry, _):
            a0, rest = carry[0], carry[1:]
            out = op(a0, *rest)
            a0 = a0 + (out * 1e-6).astype(a0.dtype)
            return (a0, *rest), ()

        carry, _ = jax.lax.scan(body, tuple(args), None, length=n)
        return carry[0]

    r = many(args)
    jax.device_get(r.ravel()[0])
    t0 = time.perf_counter()
    r = many(args)
    jax.device_get(r.ravel()[0])
    return (time.perf_counter() - t0) / n


def _adapt(out, like_channels):
    """Slice or tile the trailing channel dim to match the carry."""
    c = out.shape[-1]
    if c == like_channels:
        return out
    if c > like_channels:
        return out[..., :like_channels]
    reps = like_channels // c
    return jnp.concatenate([out] * reps, axis=-1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")
    argv = [a for a in sys.argv[1:]]
    quant = "--quant" in argv
    argv = [a for a in argv if a != "--quant"]
    batch = int(argv[0]) if argv else 8
    b = 2 * batch  # CFG
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    from ddpo_tpu.models.layers import (
        ResnetBlock2D, Transformer2D, Downsample2D, Upsample2D,
    )
    from ddpo_tpu.models import UNet2DCondition

    print(
        f"device: {jax.devices()[0].device_kind} | CFG batch {b}"
        + (" | quant=int8" if quant else ""),
        flush=True,
    )
    ctx = jax.random.normal(key, (b, 77, 768), dtype)
    temb = jax.random.normal(key, (b, 1280), dtype)

    total = 0.0

    resnets = [
        ("res 64x64 320->320", 64, 320, 320, 2),
        ("res 64x64 640->320", 64, 640, 320, 3),
        ("res 32x32 320->640", 32, 320, 640, 1),
        ("res 32x32 640->640", 32, 640, 640, 1),
        ("res 32x32 1280->640", 32, 1280, 640, 3),
        ("res 16x16 640->1280", 16, 640, 1280, 1),
        ("res 16x16 1280->1280", 16, 1280, 1280, 1),
        ("res 16x16 2560->1280", 16, 2560, 1280, 3),
        ("res 8x8 1280->1280", 8, 1280, 1280, 4),
        ("res 8x8 2560->1280", 8, 2560, 1280, 3),
    ]
    for label, hw, cin, cout, count in resnets:
        x = jax.random.normal(key, (b, hw, hw, cin), dtype)
        mod = ResnetBlock2D(out_channels=cout, dtype=dtype, quant=quant)
        params = mod.init(key, x, temb)["params"]
        t = timeit_looped(
            lambda x, temb: _adapt(mod.apply({"params": params}, x, temb), x.shape[-1]),
            (x, temb),
        )
        total += t * count
        print(f"{label:26s}: {t*1e3:7.3f} ms x{count} = {t*count*1e3:7.2f}", flush=True)

    transformers = [
        ("xfmr 64x64 C320", 64, 320, 5),
        ("xfmr 32x32 C640", 32, 640, 5),
        ("xfmr 16x16 C1280", 16, 1280, 5),
        ("xfmr 8x8 C1280", 8, 1280, 1),
    ]
    for label, hw, c, count in transformers:
        x = jax.random.normal(key, (b, hw, hw, c), dtype)
        mod = Transformer2D(heads=8, dim_head=c // 8, dtype=dtype)
        params = mod.init(key, x, ctx)["params"]
        t = timeit_looped(lambda x, ctx: mod.apply({"params": params}, x, ctx), (x, ctx))
        total += t * count
        print(f"{label:26s}: {t*1e3:7.3f} ms x{count} = {t*count*1e3:7.2f}", flush=True)

    updown = [
        ("down 64->32 C320", Downsample2D(320, dtype=dtype), (b, 64, 64, 320)),
        ("down 32->16 C640", Downsample2D(640, dtype=dtype), (b, 32, 32, 640)),
        ("down 16->8 C1280", Downsample2D(1280, dtype=dtype), (b, 16, 16, 1280)),
        ("up 8->16 C1280", Upsample2D(1280, dtype=dtype, quant=quant), (b, 8, 8, 1280)),
        ("up 16->32 C1280", Upsample2D(1280, dtype=dtype, quant=quant), (b, 16, 16, 1280)),
        ("up 32->64 C640", Upsample2D(640, dtype=dtype, quant=quant), (b, 32, 32, 640)),
    ]
    for label, mod, shape in updown:
        x = jax.random.normal(key, shape, dtype)
        params = mod.init(key, x)["params"]

        def op(x, _mod=mod, _p=params, _shape=shape):
            out = _mod.apply({"params": _p}, x)
            return jax.image.resize(out, _shape, "nearest")  # restore carry shape

        t = timeit_looped(op, (x,))
        total += t
        print(f"{label:26s}: {t*1e3:7.3f} ms (incl. shape-restore resize)", flush=True)

    model = UNet2DCondition(dtype=dtype, quant=quant)
    lat = jax.random.normal(key, (b, 4, 64, 64), jnp.float32)
    ts = jnp.full((b,), 500, jnp.int32)
    ctx32 = jax.random.normal(key, (b, 77, 768), jnp.float32)
    params = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, s.dtype) * 0.02).astype(s.dtype),
        jax.eval_shape(model.init, key, lat, ts, ctx32)["params"],
    )

    def unet_op(lat, ts, ctx):
        out = model.apply({"params": params}, lat, ts, ctx)
        return out.astype(lat.dtype)

    t_full = timeit_looped(unet_op, (lat, ts, ctx32), n=6)
    print(f"{'FULL UNet forward':26s}: {t_full*1e3:7.2f} ms")
    print(f"{'sum of parts':26s}: {total*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
