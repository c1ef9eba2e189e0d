"""Pallas direct conv vs XLA conv at the SD-1.4 UNet's dominant shapes.

VERDICT round-2 item #2: one real experiment at the dominant conv shape
(3x3, 64x64x320, CFG batch 16) — win -> integrate, lose -> BENCHLOG with
numbers. Timing per bench_ops.py methodology: in-jit scan with carry
dependence, jax.device_get sync (relay-safe).

Run (real chip): PYTHONPATH=/root/repo:/root/.axon_site python bench_conv.py
"""


import jax
import jax.numpy as jnp

from ddpo_tpu.ops.conv import conv3x3_direct, conv3x3_xla

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")


# single source of truth for the slope-extrapolation methodology
# (BENCHLOG round-3 correction): a future change to the sync method or
# scan lengths must not fork between bench scripts
from bench_ops import timeit_looped  # noqa: E402


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    # (B, H, W, Cin, Cout): CFG batch 16 at 512px; resnet conv1/conv2 shapes
    # per level plus the up-block concat conv (Cin=2*C)
    shapes = [
        (16, 64, 64, 320, 320),
        (16, 64, 64, 640, 320),   # up-block concat conv at level 0
        (16, 32, 32, 640, 640),
        (16, 16, 16, 1280, 1280),
        (16, 8, 8, 1280, 1280),
    ]
    for (b, h, w, cin, cout) in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (b, h, w, cin), jnp.bfloat16)
        wgt = jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16) * 0.02

        # parity first
        ref = conv3x3_xla(x, wgt)
        got = conv3x3_direct(x, wgt)
        err = float(
            jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        )
        rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))

        t_xla = timeit_looped(lambda x, w: conv3x3_xla(x, w), (x, wgt))
        t_pal = timeit_looped(lambda x, w: conv3x3_direct(x, w), (x, wgt))
        flops = 2 * b * h * w * 9 * cin * cout
        print(
            f"conv {b}x{h}x{w}x{cin}->{cout}: XLA {t_xla*1e3:7.3f} ms "
            f"({flops/t_xla/1e12:5.1f} TF/s) | pallas {t_pal*1e3:7.3f} ms "
            f"({flops/t_pal/1e12:5.1f} TF/s) | speedup {t_xla/t_pal:.2f}x "
            f"| rel_err {rel:.2e}"
        )


if __name__ == "__main__":
    main()
