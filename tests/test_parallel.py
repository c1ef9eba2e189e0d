"""Mesh/sharding tests on the virtual 8-device CPU mesh.

Validates the jit+NamedSharding replacements for the reference's pmap
machinery: dp-sharded training matches single-device training bit-for-bit
(up to fp reassociation), tp partition rules produce a runnable sharded
forward, and the collectives match their numpy oracles.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ddpo_tpu.core import DDIMScheduler
from ddpo_tpu.models import UNet2DCondition, UNetConfig
from ddpo_tpu.parallel import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from ddpo_tpu.parallel.collectives import sharded_softmax, softmax_ref
from ddpo_tpu.parallel.sharding import param_specs, shard_params
from ddpo_tpu.training.policy_gradient import AccumulatingTrainState, train_step

TINY = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    attention_heads=2,
    cross_attention_dim=32,
    down_block_has_attn=(True, False),
)


def test_mesh_shapes():
    mesh = create_mesh(MeshConfig(dp=-1, tp=1))
    assert mesh.devices.shape == (8, 1, 1)
    mesh = create_mesh(MeshConfig(dp=4, tp=2))
    assert mesh.devices.shape == (4, 1, 2)
    mesh = create_mesh(MeshConfig(dp=2, sp=2, tp=2))
    assert mesh.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(dp=3, tp=2))


def test_sharded_softmax_matches_oracle():
    mesh = create_mesh(MeshConfig(dp=-1, tp=1))
    x = np.random.default_rng(0).normal(size=(64,)).astype(np.float32)
    out = sharded_softmax(mesh, shard_batch(mesh, jnp.asarray(x)), temperature=0.2)
    np.testing.assert_allclose(
        np.asarray(out), softmax_ref(x, temperature=0.2), rtol=1e-5, atol=1e-7
    )


@pytest.fixture(scope="module")
def tiny_setup():
    model = UNet2DCondition(TINY)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, 7, 32)),
    )["params"]

    def unet_apply(p, latents, t, context):
        return model.apply({"params": p}, latents, t, context)

    scheduler = DDIMScheduler()
    sched_state = scheduler.set_timesteps(scheduler.create_state(), 5)

    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 8, 8)),
        "next_latents": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 8, 8)),
        "ts": jnp.full((8,), 601),
        "log_probs": jax.random.normal(jax.random.PRNGKey(3), (8,)) * 0.01,
        "advantages": jax.random.normal(jax.random.PRNGKey(4), (8,)),
        "prompt_embeds": jax.random.normal(jax.random.PRNGKey(5), (8, 7, 32)),
        "uncond_embeds": jnp.zeros((8, 7, 32)),
    }
    return model, params, unet_apply, scheduler, sched_state, batch


@pytest.mark.slow
def test_dp_training_matches_single_device(tiny_setup):
    """The reference's explicit pmean all-reduce is implicit under GSPMD:
    a dp=8-sharded step must produce the same update as unsharded."""
    model, params, unet_apply, scheduler, sched_state, batch = tiny_setup
    optimizer = optax.adamw(1e-4)

    def make_state():
        return AccumulatingTrainState.create(
            apply_fn=unet_apply, params=params, tx=optimizer
        )

    step_kwargs = dict(
        scheduler=scheduler, train_cfg=True, guidance_scale=5.0,
        eta=1.0, clip_range=1e-1, do_opt_update=True,
    )

    # single device
    state0, info0 = train_step(make_state(), batch, sched_state, **step_kwargs)

    # dp=8 mesh
    mesh = create_mesh(MeshConfig(dp=-1, tp=1))
    sharded = shard_batch(mesh, batch)
    state_in = jax.device_put(make_state(), replicated(mesh))
    sched_in = jax.device_put(sched_state, replicated(mesh))
    step = jax.jit(functools.partial(train_step, **step_kwargs))
    state1, info1 = step(state_in, sharded, sched_in)

    np.testing.assert_allclose(
        float(info0["loss"]), float(info1["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(info0["approx_kl"]), float(info1["approx_kl"]), rtol=1e-4, atol=1e-10
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state0.params),
        jax.tree_util.tree_leaves(state1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_tp_sharded_forward_matches_replicated(tiny_setup):
    """tp=2 GSPMD-sharded UNet forward == replicated forward."""
    model, params, unet_apply, *_ = tiny_setup
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 4, 8, 8))
    t = jnp.full((4,), 601)
    ctx = jax.random.normal(jax.random.PRNGKey(8), (4, 7, 32))

    ref = unet_apply(params, x, t, ctx)

    mesh = create_mesh(MeshConfig(dp=4, tp=2))
    specs = param_specs(params)
    # sanity: the rules actually shard something
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s != P(), specs)
    )
    assert any(flat)

    sharded_params = shard_params(mesh, params)
    fwd = jax.jit(unet_apply)
    out = fwd(
        sharded_params,
        jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(t, batch_sharding(mesh)),
        jax.device_put(ctx, batch_sharding(mesh)),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_shard_map_sampler_matches_semantics(tiny_setup):
    """shard_map sampler: correct shapes, dp shards draw independent noise,
    chain consistency holds per shard."""
    from ddpo_tpu.sampling import SamplerConfig
    from ddpo_tpu.sampling.sampler import sample_trajectories_sharded

    model, params, unet_apply, scheduler, sched_state, _ = tiny_setup
    mesh = create_mesh(MeshConfig(dp=-1, tp=1))
    B = 8

    config = SamplerConfig(
        num_inference_steps=3, guidance_scale=5.0, eta=1.0, height=64, width=64
    )
    prompts = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 32))
    uncond = jnp.zeros((B, 7, 32))

    fn = jax.jit(
        lambda p, ss, pe, ue, k: sample_trajectories_sharded(
            mesh, unet_apply, p, scheduler, ss, pe, ue, k, config
        )
    )
    traj = fn(
        jax.device_put(params, replicated(mesh)),
        jax.device_put(scheduler.create_state(), replicated(mesh)),
        jax.device_put(prompts, batch_sharding(mesh)),
        jax.device_put(uncond, batch_sharding(mesh)),
        jax.random.PRNGKey(3),
    )
    assert traj["latents"].shape == (B, 3, 4, 8, 8)
    assert traj["log_probs"].shape == (B, 3)
    # per-shard RNG fold: initial latents must differ across shards
    init = np.asarray(traj["latents"][:, 0])
    assert np.abs(init[0] - init[1]).max() > 1e-3
    np.testing.assert_allclose(
        np.asarray(traj["next_latents"][:, :-1]),
        np.asarray(traj["latents"][:, 1:]),
        rtol=1e-5,
    )


def test_sequence_parallel_attention_matches_unsharded():
    """sp-sharded attention == unsharded attention: queries sharded over an
    'sp' mesh axis, K/V all-gathered per shard (exact softmax), optionally
    composed with a dp batch axis."""
    from jax.sharding import Mesh
    from ddpo_tpu.ops import xla_attention
    from ddpo_tpu.parallel import sequence_parallel_attention

    key = jax.random.PRNGKey(0)
    b, s, h, d = 4, 64, 2, 16
    q = jax.random.normal(key, (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    ref = xla_attention(q, k, v)

    devices = np.array(jax.devices()[:8])
    mesh_sp = Mesh(devices.reshape(8), ("sp",))
    out = sequence_parallel_attention(mesh_sp, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    mesh_dp_sp = Mesh(devices.reshape(2, 4), ("dp", "sp"))
    out2 = sequence_parallel_attention(
        mesh_dp_sp, q, k, v, batch_axis="dp"
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-6)


def test_attention_sharding_context_matches_unsharded():
    """set_attention_sharding(tp/sp) == plain attention, through the UNet.

    Round-3 design (VERDICT items #3/#6): tp>1 / sp>1 no longer force the
    XLA path process-wide — self-attention runs inside an inner shard_map
    over the heads ('tp') / query-sequence ('sp') axes, so the Pallas kernel
    stays live on TPU. On this CPU mesh the per-shard body dispatches to the
    XLA path; equality vs the unsharded forward proves the sharded math.
    """
    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.ops import set_attention_sharding

    model = UNet2DCondition(TINY)
    rs = np.random.RandomState(0)
    x = rs.randn(4, 4, 8, 8).astype(np.float32)
    t = np.array([1, 5, 9, 13], np.int32)
    ctx = rs.randn(4, 7, 32).astype(np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x[:1]), jnp.asarray(t[:1]),
        jnp.asarray(ctx[:1]),
    )["params"]

    ref = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                    jnp.asarray(ctx))
    )

    for cfg, devs in (
        (MeshConfig(dp=2, sp=2, tp=2), None),
        (MeshConfig(dp=4, sp=2, tp=1), None),
        (MeshConfig(dp=2, sp=1, tp=2), jax.devices()[:4]),
    ):
        mesh = create_mesh(cfg, devices=devs)
        set_attention_sharding(
            mesh,
            batch_axis="dp",
            heads_axis="tp" if cfg.tp > 1 else None,
            seq_axis="sp" if cfg.sp > 1 else None,
        )
        try:
            with mesh:
                out = jax.jit(
                    lambda p, x, t, c: model.apply({"params": p}, x, t, c)
                )(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
            np.testing.assert_allclose(
                np.asarray(out), ref, atol=2e-5, rtol=2e-5,
            )
        finally:
            set_attention_sharding(None)


def test_attention_sharding_grad_matches_unsharded():
    """Backward through the shard_mapped attention == unsharded gradients.

    Covers the two shippable training configs (dp+sp and dp+tp). sp+tp
    COMBINED is excluded and rejected by the driver: with two manual
    attention axes, XLA's manual<->auto partitioner boundary miscounts the
    weight grads of surrounding convs by exactly 2.0x (bisected round 3:
    conv kernels 2.0x, every Dense/GroupNorm grad and the forward exact,
    each axis alone exact — ops/attention.set_attention_sharding docstring).
    """
    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.ops import set_attention_sharding

    model = UNet2DCondition(TINY)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([3, 11], np.int32)
    ctx = rs.randn(2, 7, 32).astype(np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x[:1]), jnp.asarray(t[:1]),
        jnp.asarray(ctx[:1]),
    )["params"]

    def loss(p):
        out = model.apply(
            {"params": p}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
        return jnp.mean(out**2)

    ref_grads = jax.grad(loss)(params)

    for cfg, axes, n in (
        (MeshConfig(dp=2, sp=2, tp=1),
         dict(batch_axis="dp", seq_axis="sp"), 4),
        (MeshConfig(dp=2, sp=1, tp=2),
         dict(batch_axis="dp", heads_axis="tp"), 4),
    ):
        mesh = create_mesh(cfg, devices=jax.devices()[:n])
        set_attention_sharding(mesh, **axes)
        try:
            with mesh:
                got_grads = jax.jit(jax.grad(loss))(params)
        finally:
            set_attention_sharding(None)

        got = dict(jax.tree_util.tree_leaves_with_path(got_grads))
        for path, leaf in jax.tree_util.tree_leaves_with_path(ref_grads):
            np.testing.assert_allclose(
                np.asarray(got[path]), np.asarray(leaf), atol=3e-5, rtol=3e-4,
                err_msg=f"{axes} {path}",
            )


def test_spatial_unet_forward_matches_unsharded():
    """Whole-UNet spatial sharding (H over 'sp', halo-exchange convs, psum
    GroupNorm, gathered-K/V attention) == the unsharded forward, including
    through a downsample/upsample level. Also composed with a dp batch axis
    and checked at sp=4 (odd-local-H geometry rejected with a clear error).
    """
    from ddpo_tpu.parallel import make_spatial_unet_apply
    from ddpo_tpu.ops.spatial import validate_spatial_geometry

    model = UNet2DCondition(TINY)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, 4, 8, 8).astype(np.float32))
    t = jnp.asarray(np.array([10, 10, 500, 801], np.int32))
    ctx = jnp.asarray(rs.randn(4, 7, 32).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1], t[:1], ctx[:1])["params"]
    ref = np.asarray(model.apply({"params": params}, x, t, ctx))

    for cfg in (MeshConfig(dp=4, sp=2), MeshConfig(dp=2, sp=4)):
        mesh = create_mesh(cfg)
        apply_sp = make_spatial_unet_apply(mesh, model)
        out = jax.jit(apply_sp)(params, x, t, ctx)
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-5, rtol=2e-5,
            err_msg=f"sp={cfg.sp}",
        )

    # H=8 with one downsample level cannot shard 8 ways (local H=1 is odd
    # at the stride-2 level) — the validator must say so before tracing
    with pytest.raises(ValueError, match="spatial sharding"):
        validate_spatial_geometry(8, "sp", 8, levels=1)


def test_spatial_unet_grad_matches_unsharded():
    """Param grads through the whole-UNet shard_map == unsharded grads: the
    halo ppermutes / moment psums / K-V all_gathers all have exact
    transposes, and (unlike the sp+tp attention composition — see
    test_attention_sharding_grad_matches_unsharded) there is no
    manual<->auto partitioner boundary inside the model, so conv weight
    grads are exact. This is what qualifies the spatial path for PPO
    training, not just sampling."""
    from ddpo_tpu.parallel import make_spatial_unet_apply

    model = UNet2DCondition(TINY)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 4, 8, 8).astype(np.float32))
    t = jnp.asarray(np.array([3, 11], np.int32))
    ctx = jnp.asarray(rs.randn(2, 7, 32).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1], t[:1], ctx[:1])["params"]

    ref_grads = jax.grad(
        lambda p: jnp.mean(model.apply({"params": p}, x, t, ctx) ** 2)
    )(params)

    mesh = create_mesh(MeshConfig(dp=2, sp=2), devices=jax.devices()[:4])
    apply_sp = make_spatial_unet_apply(mesh, model)
    got_grads = jax.jit(
        jax.grad(lambda p: jnp.mean(apply_sp(p, x, t, ctx) ** 2))
    )(params)

    got = dict(jax.tree_util.tree_leaves_with_path(got_grads))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_grads):
        np.testing.assert_allclose(
            np.asarray(got[path]), np.asarray(leaf), atol=3e-5, rtol=3e-4,
            err_msg=str(path),
        )


def test_spatial_sampler_matches_unsharded(tiny_setup):
    """sample_trajectories with the spatially-sharded unet_apply must be
    bit-compatible with the plain apply: the scheduler (and its noise) runs
    at the GSPMD level on full latents, so the trajectory — latents,
    log_probs — matches to fp tolerance."""
    from ddpo_tpu.parallel import make_spatial_unet_apply
    from ddpo_tpu.sampling.sampler import SamplerConfig, sample_trajectories

    model, params, unet_apply, scheduler, sched_state, batch = tiny_setup
    cfg = SamplerConfig(
        num_inference_steps=5, guidance_scale=5.0, eta=1.0,
        height=64, width=64, vae_scale_factor=8, latent_channels=4,
    )
    key = jax.random.PRNGKey(7)
    ref = sample_trajectories(
        unet_apply, params, scheduler, sched_state,
        batch["prompt_embeds"][:4], batch["uncond_embeds"][:4], key, cfg,
    )

    mesh = create_mesh(MeshConfig(dp=4, sp=2))
    apply_sp = make_spatial_unet_apply(mesh, model)
    got = sample_trajectories(
        apply_sp, params, scheduler, sched_state,
        batch["prompt_embeds"][:4], batch["uncond_embeds"][:4], key, cfg,
    )
    for k in ("latents", "next_latents", "log_probs"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=1e-4, rtol=1e-4,
            err_msg=k,
        )


def test_sp_tp_combined_conv_grad_miscount_canary():
    """CANARY for the version-gated sp+tp training limitation.

    With BOTH manual attention axes active (seq over sp AND heads over tp),
    XLA's manual<->auto partitioning boundary miscounts the weight grads of
    every surrounding 3x3 convolution by EXACTLY 2.0x on the current jax
    pin (0.9.x CPU meshes); all non-conv grads and the forward are exact.
    The pg driver rejects sp>1 && tp>1 because of this
    (pipelines/policy_gradient.py, 'mesh_sp and mesh_tp cannot be
    combined'). No upstream issue exists yet (zero-egress build env) — this
    canary IS the version gate.

    This test asserts the bug IS PRESENT. When a jax/XLA upgrade fixes the
    boundary, it goes RED: then (1) delete the driver rejection, (2) flip
    this test to assert exact grads (fold it into
    test_attention_sharding_grad_matches_unsharded's loop with a combined
    MeshConfig(dp=2, sp=2, tp=2) entry), and (3) drop the KNOWN LIMIT note
    from ops/attention.set_attention_sharding's docstring.
    """
    from ddpo_tpu.models import UNet2DCondition
    from ddpo_tpu.ops import set_attention_sharding

    model = UNet2DCondition(TINY)
    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([3, 11], np.int32)
    ctx = rs.randn(2, 7, 32).astype(np.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x[:1]), jnp.asarray(t[:1]),
        jnp.asarray(ctx[:1]),
    )["params"]

    def loss(p):
        out = model.apply(
            {"params": p}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )
        return jnp.mean(out**2)

    ref_grads = jax.grad(loss)(params)

    mesh = create_mesh(
        MeshConfig(dp=1, sp=2, tp=2), devices=jax.devices()[:4]
    )
    set_attention_sharding(
        mesh, batch_axis="dp", seq_axis="sp", heads_axis="tp"
    )
    try:
        with mesh:
            got_grads = jax.jit(jax.grad(loss))(params)
    finally:
        set_attention_sharding(None)

    got = dict(jax.tree_util.tree_leaves_with_path(got_grads))
    n_doubled = 0
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(ref_grads):
        g, r = np.asarray(got[path]), np.asarray(ref_leaf)
        is_conv3x3 = r.ndim == 4 and r.shape[0] == 3 and r.shape[1] == 3
        if is_conv3x3:
            # the miscount: conv kernel grads exactly doubled
            np.testing.assert_allclose(
                g, 2.0 * r, atol=3e-5, rtol=3e-4,
                err_msg=(
                    "sp+tp conv-grad miscount is GONE (or changed) at "
                    f"{jax.tree_util.keystr(path)} — the jax upgrade fixed "
                    "the manual<->auto boundary. Un-freeze sp+tp: see this "
                    "test's docstring for the three steps."
                ),
            )
            n_doubled += 1
        else:
            np.testing.assert_allclose(
                g, r, atol=3e-5, rtol=3e-4,
                err_msg=f"non-conv grad diverged at {jax.tree_util.keystr(path)}",
            )
    assert n_doubled >= 10, f"only {n_doubled} conv kernels checked"
