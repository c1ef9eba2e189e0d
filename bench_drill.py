"""Drill into slow UNet blocks: time each sub-op of a ResnetBlock2D.

Uses n=50 scan iterations to amortize the ~28ms remote-relay dispatch
overhead to <0.6ms per op, and times an identity op as the floor.

Usage: python bench_drill.py
"""

import time

import jax
import jax.numpy as jnp


def timeit_looped(op, args, n=50):
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


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")
    import flax.linen as nn

    from ddpo_tpu.ops.groupnorm import group_norm, _moments_reference, _group_onehot

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    print(f"device: {jax.devices()[0].device_kind}")

    for (hw, c) in ((8, 1280), (16, 1280), (32, 640), (64, 320)):
        x = jax.random.normal(key, (16, hw, hw, c), dtype)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        t_id = timeit_looped(lambda x: x * 1.000001, (x,))

        t_gn = timeit_looped(
            lambda x: group_norm(x, scale, bias, 32, silu=True), (x,)
        )

        def gn_xla_moments(x):
            xf = x.reshape(16, hw * hw, c)
            sums, sq = _moments_reference(xf, 32)
            onehot = _group_onehot(c, 32, jnp.float32)
            denom = float(hw * hw * c // 32)
            mean_c = ((sums / denom) @ onehot.T)[:, None, :]
            var = sq / denom - (sums / denom) ** 2
            rstd_c = (jax.lax.rsqrt(var + 1e-5) @ onehot.T)[:, None, :]
            out = (xf.astype(jnp.float32) - mean_c) * rstd_c * scale + bias
            out = out * jax.nn.sigmoid(out)
            return out.astype(x.dtype).reshape(x.shape)

        t_gn_xla = timeit_looped(gn_xla_moments, (x,))

        conv = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=dtype)
        cp = conv.init(key, x)["params"]
        t_conv = timeit_looped(lambda x: conv.apply({"params": cp}, x), (x,))

        conv1x1 = nn.Conv(c, (1, 1), dtype=dtype)
        cp1 = conv1x1.init(key, x)["params"]
        t_conv1 = timeit_looped(lambda x: conv1x1.apply({"params": cp1}, x), (x,))

        # 3x3 conv as explicit matmul over im2col patches
        w3 = jax.random.normal(key, (9 * c, c), dtype) * 0.02

        def conv_matmul(x):
            patches = jax.lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.einsum(
                "nhwk,kc->nhwc", patches, w3,
                preferred_element_type=jnp.float32,
            ).astype(dtype)

        t_convmm = timeit_looped(conv_matmul, (x,))

        print(
            f"hw={hw:3d} c={c:4d}: id {t_id*1e3:6.3f} | gn+silu {t_gn*1e3:6.3f} "
            f"| gn_xla {t_gn_xla*1e3:6.3f} | conv3x3 {t_conv*1e3:6.3f} "
            f"| conv1x1 {t_conv1*1e3:6.3f} | conv3x3-mm {t_convmm*1e3:6.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
