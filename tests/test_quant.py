"""W8A8 int8 inference path (ops/quant.py).

Coverage:
- quantize_symmetric: scale/roundtrip invariants, zero-input safety.
- conv3x3_w8a8 vs the fp32 XLA conv: bounded relative error, dtype contract.
- UNet quant flag: identical param tree, bounded activation deviation.
- halo-exchange composition (quant + spatial_axis inside shard_map).
- driver e2e with --quant int8 on the tiny preset: generate AND the RWR
  collection driver (sample.py), plus the stacked --quant int8
  --scheduler dpm++ fastest-inference combination through both.
- grad guard: differentiating through the quantized conv raises instead
  of silently emitting zero gradients (the int8 round/clip has no vjp).

The reference has no quantized inference of any kind; this accelerates the
sampler scan it runs at bf16
(/root/reference/ddpo/diffusers_patch/pipeline_flax_stable_diffusion.py:204-255).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpo_tpu.ops.conv import conv3x3, conv3x3_xla
from ddpo_tpu.ops.quant import conv3x3_w8a8, quantize_symmetric


def _rel_l2(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_quantize_symmetric_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    q, scale = quantize_symmetric(x, (1, 2, 3))
    assert q.dtype == jnp.int8
    assert scale.shape == (4, 1, 1, 1)
    # max-magnitude element hits +-127 exactly; dequantized error is
    # bounded by half a quantization step per element
    deq = q.astype(jnp.float32) * scale
    assert int(jnp.max(jnp.abs(q))) == 127
    step = np.asarray(scale)
    assert np.all(np.abs(np.asarray(deq - x)) <= step / 2 + 1e-7)


def test_quantize_symmetric_zero_input_safe():
    q, scale = quantize_symmetric(jnp.zeros((2, 4, 4, 8)), (1, 2, 3))
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.isfinite(np.asarray(scale))) and np.all(np.asarray(scale) > 0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_conv_w8a8_close_to_fp(dtype):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 16, 16, 64), dtype)
    w = (jax.random.normal(kw, (3, 3, 64, 64)) * 0.05).astype(jnp.float32)
    bias = jnp.linspace(-0.1, 0.1, 64)

    out_q = conv3x3_w8a8(x, w, bias)
    out_f = conv3x3_xla(x.astype(jnp.float32), w, bias)
    assert out_q.dtype == dtype
    # sum of ~576 int8-rounded products: relative l2 well under 1%
    assert _rel_l2(out_q, out_f) < 0.02, _rel_l2(out_q, out_f)


def test_conv3x3_quant_dispatch():
    """conv3x3(quant=True) routes through the int8 path (different result
    from the fp path, close to it)."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 8, 8, 32))
    w = (jax.random.normal(kw, (3, 3, 32, 32)) * 0.05).astype(jnp.float32)
    out_q = conv3x3(x, w, quant=True)
    out_f = conv3x3(x, w)
    assert not np.allclose(np.asarray(out_q), np.asarray(out_f))
    assert _rel_l2(out_q, out_f) < 0.02


def test_conv_quant_halo_composes():
    """quant + spatial_axis: shard-local act scales, halo rows, VALID-H conv
    — stays within quantization error of the global fp conv."""
    from jax.sharding import Mesh, PartitionSpec as P

    from ddpo_tpu.parallel.mesh import shard_map_compat

    devices = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devices, ("sp",))
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (1, 16, 8, 32))
    w = (jax.random.normal(kw, (3, 3, 32, 32)) * 0.05).astype(jnp.float32)

    sharded = shard_map_compat(
        lambda xs: conv3x3(xs, w, quant=True, spatial_axis="sp"),
        mesh,
        P(None, "sp", None, None),
        P(None, "sp", None, None),
    )(x)
    out_f = conv3x3_xla(x, w)
    assert sharded.shape == out_f.shape
    assert _rel_l2(sharded, out_f) < 0.02


def test_unet_quant_param_tree_identical_and_close():
    from ddpo_tpu.utils.serialization import load_stable_diffusion

    models, params = load_stable_diffusion(model_preset="tiny", seed=0)
    unet_q = models.unet.clone(quant=True)

    latents = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 8))
    t = jnp.array([5, 9], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 77, 32))

    # quant changes no parameters: init under quant yields the same tree
    q_params = jax.jit(unet_q.init)(jax.random.PRNGKey(0), latents, t, ctx)["params"]
    ref_tree = jax.tree_util.tree_structure(params["unet"])
    assert jax.tree_util.tree_structure(q_params) == ref_tree
    assert all(
        a.shape == b.shape
        for a, b in zip(
            jax.tree_util.tree_leaves(q_params),
            jax.tree_util.tree_leaves(params["unet"]),
        )
    )

    out_f = models.unet.apply({"params": params["unet"]}, latents, t, ctx)
    out_q = unet_q.apply({"params": params["unet"]}, latents, t, ctx)
    assert np.all(np.isfinite(np.asarray(out_q)))
    err = _rel_l2(out_q, out_f)
    assert 0 < err < 0.15, err


def test_generate_driver_quant_int8(tmp_path, monkeypatch):
    """generate.py --quant int8 end-to-end on the tiny preset."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DDPO_BUCKET", "bucket")
    import importlib
    import json
    import os

    import ddpo_tpu.config.base as base
    import ddpo_tpu.config.user as user

    importlib.reload(user)
    importlib.reload(base)
    from ddpo_tpu.pipelines import generate

    outdir, prompts = generate.main(
        ["--dataset", "debug-animals", "--quant", "int8",
         "--n_samples", "2", "--n_inference_steps", "3",
         "--prompts", "['a dog']", "--seed", "3"]
    )
    pngs = [f for f in os.listdir(outdir)
            if f.endswith(".png") and not f.startswith("grid")]
    assert len(pngs) == 2
    meta = json.loads(open(os.path.join(outdir, "prompts.json")).read())
    assert meta["prompts"] == ["a dog", "a dog"]


def test_conv_w8a8_grad_raises():
    """The int8 conv is inference-only: a grad trace through it must fail
    loudly (custom_vjp bwd raises), not emit silent zero gradients."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8))
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(lambda w: conv3x3_w8a8(x, w).sum())(w)


def _reload_config(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DDPO_BUCKET", "bucket")
    import importlib

    import ddpo_tpu.config.base as base
    import ddpo_tpu.config.user as user

    importlib.reload(user)
    importlib.reload(base)


def test_sample_driver_quant_int8(tmp_path, monkeypatch):
    """sample.py --quant int8: RWR collection with the quantized sampling
    UNet writes valid images (mirrors the generate-driver test; the two
    drivers gate the flag independently, pipelines/sample.py)."""
    _reload_config(tmp_path, monkeypatch)
    from ddpo_tpu.data.hdf5 import LocalReader
    from ddpo_tpu.pipelines import sample

    n = sample.main(
        ["--dataset", "debug-animals", "--n_inference_steps", "2",
         "--resolution", "32", "--quant", "int8", "--max_steps", "1",
         "--n_samples_per_device", "1", "--local_size", "8",
         "--mask_mode", "percentile", "--mask_param", "0",
         "--savepath", "samples/q8"]
    )
    assert n >= 1
    reader = LocalReader(
        str(tmp_path / "bucket" / "logs" / "debug-animals" / "samples" / "q8")
    )
    assert len(reader) == n
    images = np.asarray(reader.get(slice(0, n), field="images"), np.float32)
    assert np.isfinite(images).all()


def test_sample_driver_quant_int8_dpmpp(tmp_path, monkeypatch):
    """The stacked fastest-collection path: --quant int8 --scheduler dpm++
    through the RWR collection driver (trajectory-free ODE sampler with
    quantized resnet convs)."""
    _reload_config(tmp_path, monkeypatch)
    from ddpo_tpu.data.hdf5 import LocalReader
    from ddpo_tpu.pipelines import sample

    n = sample.main(
        ["--dataset", "debug-animals", "--n_inference_steps", "3",
         "--resolution", "32", "--quant", "int8", "--scheduler", "dpm++",
         "--max_steps", "1", "--n_samples_per_device", "1",
         "--local_size", "8", "--mask_mode", "percentile",
         "--mask_param", "0", "--savepath", "samples/q8dpm"]
    )
    assert n >= 1
    reader = LocalReader(
        str(tmp_path / "bucket" / "logs" / "debug-animals" / "samples" / "q8dpm")
    )
    images = np.asarray(reader.get(slice(0, n), field="images"), np.float32)
    assert np.isfinite(images).all()


def test_generate_driver_quant_int8_dpmpp(tmp_path, monkeypatch):
    """The stacked fastest-generation path: --quant int8 --scheduler dpm++
    through generate.py."""
    _reload_config(tmp_path, monkeypatch)
    import json
    import os

    from ddpo_tpu.pipelines import generate

    outdir, prompts = generate.main(
        ["--dataset", "debug-animals", "--quant", "int8",
         "--scheduler", "dpm++", "--n_samples", "2",
         "--n_inference_steps", "3", "--prompts", "['a dog']",
         "--seed", "3"]
    )
    pngs = [f for f in os.listdir(outdir)
            if f.endswith(".png") and not f.startswith("grid")]
    assert len(pngs) == 2
    meta = json.loads(open(os.path.join(outdir, "prompts.json")).read())
    assert meta["prompts"] == ["a dog", "a dog"]
