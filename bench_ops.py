"""Per-op micro-benchmarks on the real chip: Pallas kernels vs XLA oracles.

Times each op inside a jax.lax.scan with a carry dependence (feeding a scaled
output back into the input) so XLA cannot hoist the loop-invariant compute —
naive per-dispatch timing on this remote backend measures ~28ms of relay
overhead, not the kernel.

Shapes are the SD-1.4 UNet attention levels at 512px with CFG batch 8:
(S=4096, D=40), (S=1024, D=80), (S=256, D=160), plus GroupNorm maps.

Usage: python bench_ops.py  (prints one line per measurement)
"""

import time

import jax
import jax.numpy as jnp


def _setup():
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def _timed_scan(op, args, n):
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
    jax.device_get(r.ravel()[0])  # sync (block_until_ready unreliable here)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = many(args)
        jax.device_get(r.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_looped(op, args, n1=20, n2=100):
    """True per-op seconds: two scan lengths, slope extrapolation.

    The relay's per-dispatch overhead is ~30-40 ms; dividing one scan's
    wall time by n leaves +overhead/n of bias (n=10 fabricated a fake
    'XLA conv is slow' result in round 3 — BENCHLOG). The slope between
    two scan lengths cancels the constant overhead exactly.
    """
    t1 = _timed_scan(op, args, n1)
    t2 = _timed_scan(op, args, n2)
    return (t2 - t1) / (n2 - n1)


def main():
    _setup()
    from ddpo_tpu.ops.attention import flash_attention, xla_attention
    from ddpo_tpu.ops.groupnorm import group_norm, group_norm_silu

    print(f"device: {jax.devices()[0].device_kind}")

    # attention at every UNet level (CFG batch 8 at 512px)
    for (s, h, d) in ((4096, 8, 40), (1024, 8, 80), (256, 8, 160)):
        q = jax.random.normal(jax.random.PRNGKey(0), (8, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (8, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (8, s, h, d), jnp.bfloat16)
        t_xla = timeit_looped(xla_attention, (q, k, v))
        t_flash = timeit_looped(lambda q, k, v: flash_attention(q, k, v), (q, k, v))
        print(
            f"attn S={s} D={d}: XLA {t_xla*1e3:7.2f} ms | "
            f"flash {t_flash*1e3:7.2f} ms | speedup {t_xla/t_flash:.2f}x"
        )

    for (s, c) in ((4096, 320), (1024, 640), (256, 1280)):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, s, c), jnp.bfloat16)
        scale, bias = jnp.ones((c,)), jnp.zeros((c,))
        t_xla = timeit_looped(
            lambda x: group_norm(x, scale, bias, 32, silu=True), (x,)
        )
        t_kernel = timeit_looped(
            lambda x: group_norm_silu(x, scale, bias, 32, use_kernel=True), (x,)
        )
        print(
            f"gn   S={s} C={c}: XLA {t_xla*1e3:7.3f} ms | "
            f"kernel {t_kernel*1e3:7.3f} ms"
        )


def bench_flash_blocks():
    """Sweep flash block sizes at the big latent shape."""
    _setup()
    from ddpo_tpu.ops.attention import flash_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (8, 4096, 8, 40), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (8, 4096, 8, 40), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 4096, 8, 40), jnp.bfloat16)
    for bq, bk in ((256, 1024), (512, 1024), (512, 2048), (1024, 1024),
                   (512, 4096), (1024, 4096), (2048, 4096)):
        try:
            t = timeit_looped(
                lambda q, k, v: flash_attention(q, k, v, None, bq, bk), (q, k, v)
            )
            print(f"flash bq={bq} bk={bk}: {t*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"flash bq={bq} bk={bk}: FAIL {type(e).__name__} {str(e)[:80]}")


def bench_gn_stats():
    _setup()
    from ddpo_tpu.ops.groupnorm import group_norm

    for (s, c) in ((4096, 320), (1024, 640)):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, s, c), jnp.bfloat16)
        scale, bias = jnp.ones((c,)), jnp.zeros((c,))
        t = timeit_looped(lambda x: group_norm(x, scale, bias, 32, silu=True), (x,))
        print(f"gn(stats-kernel) S={s} C={c}: {t*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
