"""Probe: does XLA on v5e lower int8 conv/matmul to the 2x-rate MXU path?

Decides whether an int8 inference path for the sampler (ROADMAP "Next #2":
"int8 weights") is worth building. Times lax.conv_general_dilated and
lax.dot_general at the SD-1.4 UNet's dominant shapes in bf16 vs
int8xint8->int32, plus the full quantize->conv->rescale pattern the real
path would run (dynamic per-sample activation scales, per-out-channel
weight scales, fp32 rescale back to bf16).

Timing via bench_ops.timeit_looped (in-jit scan with carry dependence, two
scan lengths, slope extrapolation — the relay-safe methodology from
BENCHLOG round 3). Run alone on an idle host: concurrent host load skews
the relay path (observed 25x during a pytest run).

v5e nominal: 197 TF/s bf16, 394 TOPS int8. Measured practical bf16 peak is
178 TF/s (BENCHLOG round 3) -> int8 convs well above ~180 TOP/s prove the
double-rate path is live and the lever is real.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")

from bench_ops import timeit_looped  # noqa: E402


def conv(x, w, pref):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )


def conv_int8_full(x, w):
    """Complete quantized conv: dynamic act quant + int8 MXU + rescale.

    Weight quantization is left inside on purpose: under the sampler scan
    it is loop-invariant and XLA hoists it; timeit_looped's carry feeds x
    only, so here too it runs once per scan, matching production.
    """
    sw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2), keepdims=True) / 127.0
    wq = jnp.round(w.astype(jnp.float32) / sw).astype(jnp.int8)
    sx = jnp.max(jnp.abs(x).astype(jnp.float32), axis=(1, 2, 3), keepdims=True) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    acc = conv(xq, wq, jnp.int32)
    return (acc.astype(jnp.float32) * (sx * sw[0])).astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    results = {"device": jax.devices()[0].device_kind, "cases": []}

    # SD UNet conv shapes at 512px, CFG batch 16 (bs8 x 2); cin==cout so
    # the scan carry chains without reshaping
    for b, h, w_, c in [
        (16, 64, 64, 320),
        (16, 32, 32, 640),
        (16, 16, 16, 1280),
        (16, 8, 8, 1280),
    ]:
        x = jax.random.normal(key, (b, h, w_, c), jnp.bfloat16)
        wt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 20), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(wt.astype(jnp.float32) * 500), -127, 127).astype(jnp.int8)
        flops = 2 * b * h * w_ * c * c * 9

        t_bf = timeit_looped(
            lambda x: conv(x, wt, jnp.float32).astype(jnp.bfloat16), (x,)
        )
        # raw int8: int8 carry, re-narrow with a shift (cheap, keeps chain)
        t_i8 = timeit_looped(
            lambda xq: (conv(xq, wq, jnp.int32) >> 7).astype(jnp.int8), (xq,)
        )
        t_full = timeit_looped(lambda x: conv_int8_full(x, wt), (x,))
        case = {
            "op": f"conv3x3 {b}x{h}x{w_}x{c}->{c}",
            "bf16_ms": round(t_bf * 1e3, 3),
            "bf16_tfs": round(flops / t_bf / 1e12, 1),
            "int8_ms": round(t_i8 * 1e3, 3),
            "int8_tops": round(flops / t_i8 / 1e12, 1),
            "int8_full_ms": round(t_full * 1e3, 3),
            "speedup_raw": round(t_bf / t_i8, 2),
            "speedup_full": round(t_bf / t_full, 2),
        }
        results["cases"].append(case)
        print(json.dumps(case), flush=True)

    # transformer Dense shapes (square so the carry chains)
    for m, c in [(16 * 4096, 320), (16 * 1024, 640), (16 * 256, 1280),
                 (16 * 4096, 1280)]:
        a = jax.random.normal(key, (m, c), jnp.bfloat16)
        bmat = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
        aq = jnp.clip(jnp.round(a.astype(jnp.float32) * 20), -127, 127).astype(jnp.int8)
        bq = jnp.clip(jnp.round(bmat.astype(jnp.float32) * 500), -127, 127).astype(jnp.int8)
        flops = 2 * m * c * c

        t_bf = timeit_looped(
            lambda a: (a @ bmat).astype(jnp.bfloat16), (a,)
        )
        t_i8 = timeit_looped(
            lambda aq: (jax.lax.dot_general(
                aq, bq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) >> 7).astype(jnp.int8), (aq,)
        )
        case = {
            "op": f"matmul {m}x{c}x{c}",
            "bf16_ms": round(t_bf * 1e3, 3),
            "bf16_tfs": round(flops / t_bf / 1e12, 1),
            "int8_ms": round(t_i8 * 1e3, 3),
            "int8_tops": round(flops / t_i8 / 1e12, 1),
            "speedup_raw": round(t_bf / t_i8, 2),
        }
        results["cases"].append(case)
        print(json.dumps(case), flush=True)

    with open("bench_int8_probe_results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
