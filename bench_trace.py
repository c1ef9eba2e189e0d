"""Profile the real UNet forward with jax.profiler and aggregate HLO times.

Traces N back-to-back jitted UNet forwards at the canonical sampling shape
(CFG batch 2*B, 64x64 latents, bf16) and parses the perfetto trace JSON that
jax.profiler emits, aggregating device-side op durations by fusion name.
This is ground truth — unlike scan-carry micro-benchmarks, it reflects the
exact fusions XLA builds for the production program (bench_profile.py's
closure-captured params distort small blocks, see BASELINE.md).

Usage: python bench_trace.py [batch] [outdir]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp


def run_and_trace(outdir: str, batch: int):
    from ddpo_tpu.models import UNet2DCondition

    b = 2 * batch
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    model = UNet2DCondition(dtype=dtype)
    lat = jax.random.normal(key, (b, 4, 64, 64), jnp.float32)
    ts = jnp.full((b,), 500, jnp.int32)
    ctx = jax.random.normal(key, (b, 77, 768), jnp.float32)
    params = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(key, s.shape, s.dtype) * 0.02).astype(s.dtype),
        jax.eval_shape(model.init, key, lat, ts, ctx)["params"],
    )
    params = jax.device_put(params)

    @jax.jit
    def fwd(params, lat, ts, ctx):
        return model.apply({"params": params}, lat, ts, ctx)

    out = fwd(params, lat, ts, ctx)
    out.block_until_ready()

    with jax.profiler.trace(outdir):
        for _ in range(4):
            out = fwd(params, lat, ts, ctx)
        out.block_until_ready()


def aggregate(outdir: str, top: int = 40):
    paths = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {outdir}"
    path = max(paths)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # Device-side events: pick the process whose name mentions the TPU/device.
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if re.search(r"TPU|/device|XLA", n, re.I) and "host" not in n.lower()
    }
    print(f"processes: {pid_names}")

    totals = defaultdict(float)
    counts = defaultdict(int)
    grand = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        if name.startswith("jit_"):  # program-level wrapper event
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        totals[name] += dur
        counts[name] += 1
        grand += dur

    print(f"\ntotal device op time: {grand:.2f} ms over 4 forwards "
          f"=> {grand/4:.2f} ms/forward")
    cats = defaultdict(float)
    for name, t in totals.items():
        cats[re.sub(r"[.\d]+$", "", name)] += t
    print("\n-- categories (ms/forward) --")
    for name, t in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{name:50s} {t/4:8.3f} {100*t/grand:6.2f}%")
    print(f"\n{'op':60s} {'total ms':>9s} {'n':>5s} {'%':>6s}")
    for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:60]:60s} {t:9.3f} {counts[name]:5d} {100*t/grand:6.2f}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ddpo_trace"
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")
    run_and_trace(outdir, batch)
    aggregate(outdir)
