"""DDPO driver: sample -> reward -> advantage -> PPO update, mesh-resident.

Rebuilds /root/reference/pipeline/policy_gradient.py for the jit+mesh world:

  - one ('dp','tp') Mesh replaces pmap+replicate; batches are placed with
    NamedSharding, gradients all-reduce implicitly.
  - the sampler is a single jitted lax.scan per batch (UNet in bfloat16 by
    default — reference ran float32), trajectories come back as one
    device_get at the end of the sampling phase.
  - reward callbacks run in a 2-worker thread pool overlapped with the next
    sampling batch (same double-buffering as the reference :208-285).
  - optional fused training loop: one dispatch scans all trained timesteps
    of a minibatch instead of one dispatch per (batch, timestep).
  - full-state Orbax checkpoints (params+opt+RNG+epoch) enable true resume,
    which the reference lacks (SURVEY.md 5.4); artifact layout (rewards/
    prompts/callback_info .npy, samples/*.png, reward-curve png) matches.

Run: python -m ddpo_tpu.pipelines.policy_gradient --dataset compressed-animals
"""

from __future__ import annotations

import functools
import json
import os
import time
from concurrent import futures

import jax
import jax.numpy as jnp
import numpy as np

from ddpo_tpu import training
from ddpo_tpu.core.scheduler import DDIMScheduler
from ddpo_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    jit_concat,
    local_shard,
    replicated,
    shard_batch,
)
from ddpo_tpu.parallel.collectives import (
    all_processes_equal,
    n_params,
    process_barrier,
)
from ddpo_tpu.sampling import SamplerConfig, sample_trajectories, vae_decode
from ddpo_tpu.training.optim import build_optimizer
from ddpo_tpu.training.policy_gradient import AccumulatingTrainState
from ddpo_tpu.training.stat_tracking import PerPromptStatTracker
from ddpo_tpu.utils import Timer, fs
from ddpo_tpu.utils.checkpoints import (
    restore_train_state,
    save_train_state,
    wait_for_pending_saves,
)
from ddpo_tpu.utils.metrics import MetricsLogger
from ddpo_tpu.parallel.mesh import maybe_initialize_distributed
from ddpo_tpu.utils.parser import Parser as BaseParser
from ddpo_tpu.utils.serialization import load_unet
from ddpo_tpu.models.tokenizer import make_uncond_ids


class Parser(BaseParser):
    config: str = "ddpo_tpu.config.base"
    dataset: str = "compressed_animals"


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


def main(argv=None):
    maybe_initialize_distributed()
    # reset the process-global attention-sharding context BEFORE any model
    # is traced: a previous main() in this process (test suite, in-process
    # chaining) may have left a stale mesh behind, and load_unet's jitted
    # init would otherwise shard_map this run's attention over dead
    # devices/axes (observed: a tp=2 run leaking into the next run's
    # batch-1 init trace -> shard_map divisibility error)
    from ddpo_tpu.ops import set_attention_sharding as _reset_attn

    _reset_attn(None)
    args = Parser().parse_args("pg", argv)
    mesh = create_mesh(MeshConfig(
        tp=getattr(args, "mesh_tp", 1), sp=getattr(args, "mesh_sp", 1)
    ))
    n_devices = mesh.devices.size
    # establish the full-mesh cross-process communicator NOW, while hosts
    # are seconds apart — later programs (the train step after minutes of
    # host-skewed compilation) reuse the cached context (see
    # warmup_collectives)
    from ddpo_tpu.parallel.collectives import warmup_collectives

    warmup_collectives(mesh)
    dp = mesh.shape["dp"]
    # per-worker semantics (reference pipeline/policy_gradient.py:223-464):
    # every process builds prompts/batches for ITS dp slice of the mesh;
    # shard_batch assembles the global arrays from the local shards. On one
    # process local_dp == dp and the local sizes are the global sizes.
    local_dp = mesh.local_mesh.shape["dp"]

    sample_bs = args.sample_batch_size * local_dp
    sample_bs_global = args.sample_batch_size * dp
    train_bs = args.train_batch_size * local_dp
    train_bs_global = args.train_batch_size * dp
    train_effective_bs = train_bs * args.train_accumulation_steps
    total_samples_per_epoch = args.num_sample_batches_per_epoch * sample_bs
    print(
        f"[ pg ] mesh: dp={dp} sp={mesh.shape['sp']} tp={mesh.shape['tp']} "
        f"({n_devices} devices, {jax.process_count()} processes)"
    )
    print(
        f"[ pg ] sample batch: {sample_bs} | train batch: {train_bs} | "
        f"effective: {train_effective_bs} | samples/epoch: {total_samples_per_epoch}"
    )
    assert args.sample_batch_size >= args.train_batch_size
    assert args.sample_batch_size % args.train_batch_size == 0
    assert total_samples_per_epoch % train_effective_bs == 0

    worker_id = jax.process_index()
    # the PG driver mirrors ALL artifacts under logs/ regardless of whether
    # savepath is remote (reference pipeline/policy_gradient.py layout);
    # metrics stream with the rest of them
    localpath = "logs/" + args.savepath.replace("gs://", "")
    os.makedirs(localpath, exist_ok=True)
    metrics = MetricsLogger(localpath, enabled=worker_id == 0)

    # --------------------------------- models --------------------------------- #
    sample_dtype = _dtype(getattr(args, "sample_dtype", "bfloat16"))
    models, params = load_unet(
        args.loadpath or None,
        epoch=args.load_epoch,
        pretrained_model=args.pretrained_model,
        dtype=_dtype(args.dtype),
        activation_dtype=sample_dtype,
        cache=args.cache,
        # base_seed, NOT the per-process seed: random-init params are
        # REPLICATED over the global mesh and must be identical on every
        # process (place_train_state device_puts them; jax asserts
        # cross-process equality of replicated values)
        seed=getattr(args, "base_seed", args.seed),
        model_preset=getattr(args, "model_preset", "sd14"),
    )
    print(f"[ pg ] unet params: {n_params(params['unet'])/1e6:.1f}M")

    scheduler = models.scheduler
    sched_state = scheduler.set_timesteps(
        scheduler.create_state(), args.n_inference_steps
    )

    def unet_apply(p, latents, t, context):
        return models.unet.apply({"params": p}, latents, t, context)

    # train_dtype is the COMPUTE dtype of the PPO recompute; master params
    # (and the optimizer) stay in args.dtype (fp32 default — bf16 master
    # weights cannot absorb lr~1e-5 updates: relative precision ~4e-3).
    # flax casts fp32 params to the compute dtype at use, which produces the
    # same bf16 values the sampler's once-per-epoch cast does — matching the
    # two passes kernel-for-kernel is what keeps |dlogp| noise below the
    # ppo clip range (bench_logp.py; VERDICT round-2 item #1)
    train_dtype = _dtype(getattr(args, "train_dtype", args.dtype))
    train_model = type(models.unet)(models.unet.config, dtype=train_dtype)

    def train_unet_apply(p, latents, t, context):
        return train_model.apply({"params": p}, latents, t, context)

    sp_spatial = mesh.shape["sp"] > 1 and (
        getattr(args, "sp_mode", "spatial") == "spatial"
    )
    if sp_spatial:
        # the spatial mode needs H divisible at every UNet level; fall back
        # to the attention mode (valid at any geometry, just slower — see
        # config/base.py sp_mode) rather than rejecting the run
        from ddpo_tpu.ops.spatial import validate_spatial_geometry

        try:
            validate_spatial_geometry(
                args.resolution // 8, "sp", mesh.shape["sp"],
                levels=len(models.unet.config.block_out_channels) - 1,
            )
        except ValueError as e:
            print(f"[ pg ] sp_mode=spatial rejected ({e}); "
                  "falling back to sp_mode=attention")
            sp_spatial = False
    if sp_spatial:
        # --sp_mode spatial (the measured default — bench_sp_comms.py): ONE
        # shard_map around the whole UNet forward with the latent H sharded
        # over sp — convs halo-exchange a single boundary row (FLOPs divided
        # by sp), GroupNorm psums its moments, self-attention gathers K/V
        # (parallel/spatial.py). --sp_mode attention instead shard_maps each
        # attention call only: convs compute replicated over sp and the
        # train step moves 8.1x more sp-axis bytes.
        from ddpo_tpu.parallel.spatial import make_spatial_unet_apply

        unet_apply = make_spatial_unet_apply(mesh, models.unet)
        train_unet_apply = make_spatial_unet_apply(mesh, train_model)

    lora_rank = int(getattr(args, "lora_rank", 0) or 0)
    if lora_rank:
        # LoRA: freeze the base UNet, train rank-r adapters on the attention
        # projections (models/lora.py). The TrainState holds ONLY the small
        # adapter tree — at r=8 the train state is 180x smaller and the
        # step 1.25x faster than full finetune (bench_lora.py). The merge
        # (kernel + A@B*scale) happens inside the jitted step, so gradients
        # flow to the adapters through the unchanged apply/step code paths.
        assert mesh.shape["tp"] == 1, (
            "lora_rank requires tp=1: adapters replicate and the frozen base "
            "stays whole (tp shards full-finetune states instead)"
        )
        from ddpo_tpu.models.lora import init_lora, merge_lora, n_lora_params

        # frozen weights never take an optimizer update, so they need no
        # fp32 master copy: when sampling and training share a compute dtype
        # (the shipped bf16 default) store the base AT that dtype — 1.7GB
        # instead of 3.4GB at SD scale. Both the sampler's merge and the
        # trainer's merge then read the SAME base values, preserving the
        # matched-numerics on-policy invariant. Mixed-dtype configs keep the
        # master-dtype base and cast at use, exactly like full finetuning.
        base_store_dtype = (
            train_dtype if train_dtype == sample_dtype else _dtype(args.dtype)
        )
        base_unet_params = jax.device_put(
            jax.tree_util.tree_map(
                lambda x: x.astype(base_store_dtype), params["unet"]
            ),
            replicated(mesh),
        )
        lora_params0 = init_lora(
            base_unet_params, lora_rank,
            # replicated across processes -> base_seed (see load_unet above)
            jax.random.PRNGKey(getattr(args, "base_seed", args.seed)),
        )
        print(
            f"[ pg ] lora: rank {lora_rank}, "
            f"{n_lora_params(lora_params0)/1e6:.2f}M trainable "
            f"(base {n_params(params['unet'])/1e6:.1f}M frozen)"
        )
        _full_train_apply = train_unet_apply
        _full_sample_apply = unet_apply
        if getattr(args, "remat", True):
            # remat ONLY the UNet body: the (base + A@B) merge stays OUTSIDE
            # the checkpoint boundary, so it is a saved loop-invariant XLA
            # hoists out of the fused timestep scan — one merge per train
            # step instead of 2T rematerialized copies.
            _full_train_apply = jax.checkpoint(_full_train_apply)

        # CRITICAL: the frozen base reaches both programs as a RUNTIME
        # ARGUMENT (trainer: the steps' `frozen` kwarg; sampler: a
        # (base, adapters) params tuple). A python closure over the concrete
        # base tree embeds ~1.7GB of bf16 literals in the lowered module at
        # SD scale — lowering alone took >15 min and the multi-GB program
        # crashed the XLA compile service (bench_lora, round 4; same failure
        # mode as the CLIP-tower note at the text_encode jit below).
        def train_unet_apply(base, p, latents, t, context):
            return _full_train_apply(
                merge_lora(base, p), latents, t, context
            )

        # the SAMPLER also merges in-graph (params = (base, adapter) trees),
        # NOT from a pre-merged tree, so both programs compute (base + A@B)
        # at the parameter boundary and any merge-op rounding applies to
        # both sides symmetrically. XLA hoists the scan-invariant merge out
        # of the denoising loop, so it runs once per sampler call. (Residual
        # bf16 recompute noise between the shard_map sampler and the GSPMD
        # trainer remains — program-structure rounding, quantified in
        # tests/test_lora.py's bf16 test note and by bench_logp.py on
        # hardware; fp32 LoRA is bit-exact end-to-end.)
        def unet_apply(p, latents, t, context):
            base, adapters = p
            return _full_sample_apply(
                merge_lora(base, adapters), latents, t, context
            )

    if getattr(args, "remat", True) and not lora_rank:
        # trade recompute for activation memory: the full SD UNet fwd+bwd at
        # 512px does not fit a 16GB chip without it (the LoRA branch already
        # checkpointed its UNet body above, keeping the merge outside)
        train_unet_apply = jax.checkpoint(train_unet_apply)

    # CFG as one 2B-batch apply for bf16 training (1.29x the two-apply step
    # on v5e); fp32 keeps the reference's two-apply form, which is faster
    # under whole-model remat at fp32 (see training/policy_gradient.ppo_loss)
    cfg_concat = train_dtype == jnp.bfloat16

    # ------------------------------- train state ------------------------------ #
    optimizer = build_optimizer(args)
    state = AccumulatingTrainState.create(
        apply_fn=train_unet_apply,
        params=lora_params0 if lora_rank else params["unet"],
        tx=optimizer,
        # the fp32 accumulation buffer (3.4GB at SD-1.4 scale) only exists
        # when something actually accumulates: explicit accumulation steps,
        # or the non-fused non-resident host loop, which accumulates across
        # the trained timesteps of each minibatch (one dispatch per
        # timestep, update on the last — reference pipeline loop semantics)
        accumulate=(
            args.train_accumulation_steps > 1
            or not (
                getattr(args, "fused_train_loop", False)
                or getattr(args, "resident_inner_loop", False)
            )
        ),
    )
    ckpt_root = args.savepath if not fs.is_remote(args.savepath) else localpath
    start_epoch = 0
    restored_host = None
    if getattr(args, "resume", False):
        if fs.is_remote(args.savepath) and not os.path.isdir(
            os.path.join(ckpt_root, "checkpoints")
        ):
            # pod restart on a fresh host: pull checkpoints back from the bucket
            n = fs.get_dir(
                os.path.join(args.savepath, "checkpoints"),
                os.path.join(ckpt_root, "checkpoints"),
            )
            if n:
                print(f"[ pg ] fetched remote checkpoints from {args.savepath}")
        restored, step = restore_train_state(
            ckpt_root,
            target={
                "state": jax.tree_util.tree_map(np.asarray, jax.device_get(state)),
                "epoch": 0,
                "rng": np.zeros(2, np.uint32),
            },
        )
        if restored is not None:
            state = restored["state"]
            start_epoch = int(restored["epoch"]) + 1
            restored_host = restored.get("host")
            print(f"[ pg ] resumed from checkpoint at epoch {restored['epoch']}")

    from ddpo_tpu.parallel.sharding import place_train_state
    from ddpo_tpu.ops import set_attention_sharding

    tp, sp = mesh.shape["tp"], mesh.shape["sp"]
    assert not (tp > 1 and sp > 1), (
        "mesh_sp and mesh_tp cannot be combined for training: XLA's "
        "manual<->auto partitioner boundary miscounts 3x3 conv weight grads "
        "exactly 2x with two manual attention axes (ops/attention.py "
        "docstring). Version-gated: when tests/test_parallel.py::"
        "test_sp_tp_combined_conv_grad_miscount_canary goes red, a jax "
        "upgrade fixed the boundary — remove this assert per the canary's "
        "docstring."
    )
    if sp_spatial:
        print(
            f"[ pg ] sp={sp} spatial: whole-UNet shard_map, latent H sharded "
            "(halo convs + psum GroupNorm + gather attention)"
        )
    elif tp > 1 or sp > 1:
        # GSPMD cannot partition pallas_call operands, so self-attention runs
        # inside an inner shard_map over the tp (heads) / sp (sequence) axes:
        # per-device programs see concrete local shards and the Pallas flash
        # kernel stays live (round 2 forced XLA here — VERDICT items #3/#6)
        set_attention_sharding(
            mesh,
            batch_axis="dp",
            heads_axis="tp" if tp > 1 else None,
            seq_axis="sp" if sp > 1 else None,
        )
        print(
            f"[ pg ] tp={tp} sp={sp}: self-attention shard_mapped over mesh "
            "axes (Pallas kernel stays live); params tp-sharded per "
            "parallel/sharding.py"
        )
    # tp>1: params/opt-state/grad-acc shard over tp; tp=1: full replication
    state = place_train_state(mesh, state)
    sched_state = jax.device_put(sched_state, replicated(mesh))
    vae_params = jax.device_put(params["vae"], replicated(mesh))
    # text encoding is a HOST-SIDE producer (each process embeds its OWN
    # prompts before shard_batch assembles the global batch), so its params
    # stay process-local in multi-host runs: placing them on the global mesh
    # would turn every per-process text_encode into an inconsistent SPMD
    # program (different prompt ids per process through one global jit)
    text_params = (
        jax.device_put(params["text_encoder"], replicated(mesh))
        if jax.process_count() == 1
        else jax.device_put(params["text_encoder"], jax.local_devices()[0])
    )

    # ------------------------------ jitted programs --------------------------- #
    vae_scale = 2 ** (len(models.vae.config.block_out_channels) - 1)
    sampler_config = SamplerConfig(
        num_inference_steps=args.n_inference_steps,
        guidance_scale=args.guidance_scale,
        eta=args.eta,
        height=args.resolution,
        width=args.resolution,
        vae_scale_factor=vae_scale,
        latent_channels=models.vae.config.latent_channels,
    )

    if mesh.shape["tp"] == 1 and mesh.shape["sp"] == 1 and dp > 1:
        # shard_map path: pmap-equivalent batch parallelism; Pallas kernels
        # see local shards (GSPMD cannot partition pallas_call operands)
        from ddpo_tpu.sampling.sampler import sample_trajectories_sharded

        sample_fn = jax.jit(
            lambda params, scheduler_state, prompt_embeds, uncond_embeds, key:
            sample_trajectories_sharded(
                mesh, unet_apply, params, scheduler, scheduler_state,
                prompt_embeds, uncond_embeds, key, sampler_config,
            )
        )
    else:
        sample_fn = jax.jit(
            functools.partial(
                sample_trajectories, unet_apply, scheduler=scheduler,
                config=sampler_config,
            ),
        )
    decode_fn = jax.jit(functools.partial(vae_decode, models.vae))
    # params must be an argument, not a closure: captured params embed as
    # HLO constants (a ~0.5GB program for the CLIP tower)
    _text_encode = jax.jit(
        lambda p, ids: models.text_encoder.apply({"params": p}, ids)
    )
    text_encode = lambda ids: _text_encode(text_params, ids)

    resident = getattr(args, "resident_inner_loop", False)
    if resident:
        # the resident epoch runs on the GLOBAL device arrays: minibatch
        # size and count are global (the per-device dp factors cancel)
        n_batches_resident = (
            args.sample_batch_size * args.num_sample_batches_per_epoch
        ) // args.train_batch_size
        assert n_batches_resident % args.train_accumulation_steps == 0, (
            f"resident_inner_loop: {n_batches_resident} minibatches/epoch not "
            f"divisible by train_accumulation_steps={args.train_accumulation_steps}"
        )
        jit_inner_epoch = jax.jit(
            functools.partial(
                training.policy_gradient.inner_epoch_resident,
                scheduler=scheduler,
                train_batch_size=train_bs_global,
                num_train_ts=int(args.n_inference_steps * args.train_timestep_ratio),
                train_cfg=args.train_cfg,
                guidance_scale=args.guidance_scale,
                eta=args.eta,
                clip_range=args.ppo_clip_range,
                accumulation_steps=args.train_accumulation_steps,
                cfg_concat=cfg_concat,
            ),
            donate_argnums=(0,),
        )

    step_fn = (
        training.policy_gradient.train_step_fused
        if getattr(args, "fused_train_loop", False)
        else training.policy_gradient.train_step
    )
    # LoRA: the frozen base rides into every step as a runtime kwarg
    # (None otherwise — an empty pytree, free under jit)
    train_frozen = base_unet_params if lora_rank else None
    step_kwargs = {}
    grad_reduce = getattr(args, "grad_reduce_dtype", "none")
    if grad_reduce != "none":
        assert getattr(args, "fused_train_loop", False), (
            "--grad_reduce_dtype requires the fused train loop"
        )
        assert mesh.shape["tp"] == 1 and mesh.shape["sp"] == 1, (
            "--grad_reduce_dtype supports pure-dp meshes"
        )
        step_kwargs = {
            "grad_reduce_mesh": mesh,
            "grad_reduce_dtype": {
                "bfloat16": jnp.bfloat16, "float32": jnp.float32
            }[grad_reduce],
        }
        print(f"[ pg ] gradient all-reduce dtype: {grad_reduce}")
    jit_train_step = jax.jit(
        functools.partial(
            step_fn,
            scheduler=scheduler,
            train_cfg=args.train_cfg,
            guidance_scale=args.guidance_scale,
            eta=args.eta,
            clip_range=args.ppo_clip_range,
            cfg_concat=cfg_concat,
            **step_kwargs,
        ),
        static_argnames=("do_opt_update",),
        donate_argnums=(0,),
    )

    # ------------------------------ prompts/rewards --------------------------- #
    uncond_ids = make_uncond_ids(models.tokenizer, 1)
    uncond_embed = np.asarray(text_encode(jnp.asarray(uncond_ids)))[0]
    sample_uncond = np.broadcast_to(
        uncond_embed, (sample_bs, *uncond_embed.shape)
    )
    train_uncond = jnp.asarray(sample_uncond[: train_bs])

    assert args.filter_field in training.callback_fns, (
        f"filter_field {args.filter_field!r} is not a registered reward "
        f"(known: {sorted(training.callback_fns)}); unknown --dataset names "
        "fall back to base defaults with filter_field=None"
    )
    callback_fns = {
        args.filter_field: training.callback_fns[args.filter_field](
            vae=models.vae, vae_params=vae_params, cache=args.cache
        )
    }
    executor = futures.ThreadPoolExecutor(max_workers=2)

    per_prompt_stats = None
    if args.per_prompt_stats_bufsize is not None:
        per_prompt_stats = PerPromptStatTracker(
            args.per_prompt_stats_bufsize, args.per_prompt_stats_min_count
        )

    # device RNG from base_seed: the sampler key feeds a GLOBAL-mesh program
    # and must be identical on every process (the shard_map sampler folds in
    # the dp index for per-shard noise); same for the resident epoch's
    # shuffle key. Host-side RNGs (prompts, host-loop shuffles) keep the
    # per-process seed. Single process: base_seed == seed, nothing changes.
    rng = jax.random.PRNGKey(getattr(args, "base_seed", args.seed))
    train_rng, sample_rng = jax.random.split(rng)

    mean_rewards, std_rewards = [], []
    if restored_host is not None:
        # true resume: every stateful host object continues where it stopped
        # (the checkpoint docstring's contract; the reference restarts cold)
        import random as _py_random

        train_rng = jnp.asarray(restored_host["train_rng"])
        sample_rng = jnp.asarray(restored_host["sample_rng"])
        mean_rewards = list(restored_host["mean_rewards"])
        std_rewards = list(restored_host["std_rewards"])
        if per_prompt_stats is not None and restored_host.get("per_prompt_stats"):
            per_prompt_stats.load_state_dict(restored_host["per_prompt_stats"])
        if restored_host.get("py_random") is not None:
            _py_random.setstate(restored_host["py_random"])
        if restored_host.get("np_random") is not None:
            np.random.set_state(restored_host["np_random"])

    def host_checkpoint_state():
        import random as _py_random

        return {
            "train_rng": np.asarray(jax.device_get(train_rng)),
            "sample_rng": np.asarray(jax.device_get(sample_rng)),
            "mean_rewards": list(mean_rewards),
            "std_rewards": list(std_rewards),
            "per_prompt_stats": (
                per_prompt_stats.state_dict() if per_prompt_stats else None
            ),
            "py_random": _py_random.getstate(),
            "np_random": np.random.get_state(),
        }

    if lora_rank:
        # adapters stay fp32 for sampling too: the sampler's unet_apply
        # merges in-graph exactly like the trainer's (see the lora block
        # above), so casting a/b here would de-match the two programs.
        # Pair the frozen base with the live adapters — the sampler's
        # params argument is the (base, adapters) tuple (runtime argument,
        # never a closure constant).
        cast_params = lambda lp: (base_unet_params, lp)  # noqa: E731
    else:
        cast_params = jax.jit(
            lambda p: jax.tree_util.tree_map(
                lambda x: x.astype(sample_dtype), p
            )
        )

    profile_dir = getattr(args, "profile_dir", None)

    # Preemption safety (beyond the reference — SURVEY 5.3: "a worker crash
    # kills the run"): TPU VMs get preempted with a SIGTERM grace window.
    # The handler only sets a flag; the loop checkpoints the full state at
    # the next epoch boundary and exits cleanly, so --resume True continues
    # exactly where the preempted run stopped.
    import signal as _signal

    shutdown_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        shutdown_requested["flag"] = True
        print("[ pg ] SIGTERM: checkpointing at the epoch boundary, then exiting")

    try:
        prev_sigterm = _signal.signal(_signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (embedded use): skip the hook
        prev_sigterm = None

    timer = Timer()
    for epoch in range(start_epoch, args.num_train_epochs):
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.start_trace(profile_dir)

        # ============================ sampling phase =========================== #
        # host alignment at the epoch boundary (checkpoint/metrics work from
        # the previous epoch is per-host; see process_barrier)
        process_barrier(f"pg_sample_{epoch}")
        # sampling reads weights once per UNet call and is HBM-bandwidth
        # bound: cast the fp32 master params to the sampling dtype on device
        # (one cheap cast per epoch halves weight traffic for bf16)
        sampling_params = cast_params(state.params)
        samples = []
        sample_phase_time = 0.0
        for i in range(args.num_sample_batches_per_epoch):
            sample_prompts, training_prompts, prompt_metadata = training.make_prompts(
                args.prompt_fn, sample_bs, args.identical_batch,
                evaluate=args.evaluate, **args.prompt_kwargs,
            )

            prompt_ids = models.tokenizer(sample_prompts)
            prompt_embeds = text_encode(jnp.asarray(prompt_ids))
            # local (per-process) embeds -> global dp-sharded arrays
            global_prompt_embeds = shard_batch(mesh, prompt_embeds)

            sample_rng, sample_seed = jax.random.split(sample_rng)
            timer()
            traj = sample_fn(
                sampling_params,
                scheduler_state=sched_state,
                prompt_embeds=global_prompt_embeds,
                uncond_embeds=shard_batch(mesh, np.asarray(sample_uncond)),
                key=sample_seed,
            )
            images = decode_fn(vae_params, traj["final_latents"])
            images = local_shard(images)
            sample_time = timer()
            sample_phase_time += sample_time

            callbacks = executor.submit(
                training.evaluate_callbacks, callback_fns, images,
                sample_prompts, prompt_metadata,
            )
            time.sleep(0)

            if resident:
                # trajectories never leave the device (SURVEY.md section 7.3)
                entry = {
                    "embeds": global_prompt_embeds,
                    "latents": traj["latents"],
                    "next_latents": traj["next_latents"],
                    "log_probs": traj["log_probs"],
                    "ts": traj["ts"],
                }
            else:
                # host copy of the process-LOCAL rows (reference per-worker
                # trajectories); single process: the whole batch
                entry = {
                    "embeds": np.asarray(prompt_embeds),
                    "latents": local_shard(traj["latents"]),
                    "next_latents": local_shard(traj["next_latents"]),
                    "log_probs": local_shard(traj["log_probs"]),
                    "ts": local_shard(traj["ts"]),
                }
            entry["prompts"] = np.array(sample_prompts)
            entry["callbacks"] = callbacks
            samples.append(entry)
            print(
                f"[ pg ] epoch {epoch} sample batch {i}: {sample_bs} samples "
                f"in {sample_time:.2f}s ({sample_bs / sample_time:.3f}/s)"
            )
            from ddpo_tpu.utils.images import save_image

            save_image(
                fs.join_and_create(localpath, f"samples/{worker_id}_{epoch}_{i}.png"),
                images[0],
            )

        # collect rewards
        for sample in samples:
            sample["rewards"], sample["callback_info"] = sample["callbacks"].result()[
                args.filter_field
            ]
            del sample["callbacks"]
        device_keys = (
            ("embeds", "latents", "next_latents", "log_probs", "ts")
            if resident
            else ()
        )
        device_samples = {
            # jitted concat: resident entries are global (possibly
            # non-addressable) arrays — eager concat is illegal multi-host
            k: jit_concat([s.pop(k) for s in samples]) for k in device_keys
        }
        samples = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs), *samples
        )
        samples["rewards"] = np.asarray(samples["rewards"], dtype=np.float64).reshape(
            len(samples["prompts"]), -1
        )[:, 0]

        # cross-host gather so every process computes identical advantages
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            rewards = np.asarray(
                multihost_utils.process_allgather(samples["rewards"], tiled=True)
            )
            # Prompts are gathered as a fixed-width uint8 view of their UTF-8
            # bytes: JAX collectives reject numpy |S byte-string dtypes, so we
            # first agree on a global pad width with an int gather, then gather
            # NUL-padded byte rows (valid UTF-8 text never contains NUL).
            # Reference gathers tokenized int ids for the same reason
            # (pipeline/policy_gradient.py:329-334); a raw-byte gather is
            # tokenizer-independent and lossless.
            encoded = [p.encode("utf-8") for p in samples["prompts"].tolist()]
            local_width = max((len(e) for e in encoded), default=0)
            width = int(
                multihost_utils.process_allgather(
                    np.asarray(local_width, dtype=np.int32)
                ).max()
            )
            buf = np.zeros((len(encoded), max(width, 1)), dtype=np.uint8)
            for i, e in enumerate(encoded):
                buf[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
            gathered = np.asarray(
                multihost_utils.process_allgather(buf, tiled=True)
            )
            all_prompts = np.array(
                [bytes(row).rstrip(b"\x00").decode("utf-8") for row in gathered]
            )
        else:
            rewards = samples["rewards"]
            all_prompts = samples["prompts"]

        if per_prompt_stats is not None:
            advantages = per_prompt_stats.update(all_prompts, rewards)
            if worker_id == 0:
                np.save(
                    fs.join_and_create(
                        localpath, f"per_prompt_stats/{worker_id}_{epoch}.npy"
                    ),
                    per_prompt_stats.get_stats(),
                )
        else:
            advantages = (rewards - rewards.mean()) / (rewards.std() + 1e-8)

        samples["advantages"] = advantages.reshape(jax.process_count(), -1)[worker_id]
        mean_rewards.append(float(rewards.mean()))
        std_rewards.append(float(rewards.std()))
        print(f"[ pg ] epoch {epoch} mean reward: {rewards.mean():.4f}")
        metrics.log(
            epoch,
            phase="sample",
            mean_reward=float(rewards.mean()),
            std_reward=float(rewards.std()),
            n_samples=int(rewards.shape[0]),
            sample_time_s=float(sample_phase_time),
        )

        for name in ("rewards", "prompts", "callback_info"):
            np.save(
                fs.join_and_create(localpath, f"{name}/{worker_id}_{epoch}.npy"),
                samples[name],
            )
            if name != "rewards":
                del samples[name]

        # ============================ training phase =========================== #
        # align hosts before the phase's first global-mesh program executes:
        # a host >30s late at a NEW cross-process collective (per-host work
        # above: callbacks, np.save, metrics) hits the runtime's hard gloo
        # rendezvous deadline (see process_barrier)
        process_barrier(f"pg_train_{epoch}")
        if resident:
            device_samples["advantages"] = shard_batch(
                mesh, jnp.asarray(samples["advantages"], dtype=jnp.float32)
            )
            device_samples["uncond_embeds"] = shard_batch(
                mesh, jnp.asarray(sample_uncond)
            )
            timer()
            for inner_epoch in range(args.num_inner_epochs):
                train_rng, epoch_rng = jax.random.split(train_rng)
                state, infos_dev = jit_inner_epoch(
                    state, device_samples, sched_state, epoch_rng,
                    frozen=train_frozen,
                )
                infos = jax.tree_util.tree_map(
                    lambda x: np.asarray(jax.device_get(x)), infos_dev
                )
                # same cross-process divergence check as the host loop
                # (reference pipeline/policy_gradient.py:442)
                all_processes_equal(
                    {k: v.mean() for k, v in infos.items()}, "train infos"
                )
                train_time = timer()
                print(
                    f"[ pg ] epoch {epoch}.{inner_epoch} (resident): "
                    f"loss {infos['loss'].mean():.5f} | "
                    f"kl {infos['approx_kl'].mean():.2e} | "
                    f"clipfrac {infos['clipfrac'].mean():.3f} | {train_time:.2f}s"
                )
                metrics.log(
                    epoch,
                    phase="train",
                    inner_epoch=inner_epoch,
                    loss=float(infos["loss"].mean()),
                    approx_kl=float(infos["approx_kl"].mean()),
                    clipfrac=float(infos["clipfrac"].mean()),
                    train_time_s=float(train_time),
                )
                if worker_id == 0:
                    np.save(
                        fs.join_and_create(
                            localpath,
                            f"train_info/{worker_id}_{epoch}_{inner_epoch}.npy",
                        ),
                        infos,
                    )
        # host-loop training path (resident mode handled above)
        for inner_epoch in range(0 if resident else args.num_inner_epochs):
            total_bs, num_timesteps = samples["log_probs"].shape
            assert num_timesteps == args.n_inference_steps

            perm = np.random.permutation(total_bs)
            keys = ["embeds", "latents", "next_latents", "log_probs", "ts", "advantages"]
            shuffled = {k: samples[k][perm] for k in keys}

            # independent per-sample timestep permutation (reference :389-393)
            perms = np.stack(
                [np.random.permutation(num_timesteps) for _ in range(total_bs)]
            )
            row = np.arange(total_bs)[:, None]
            for key in ("latents", "next_latents", "log_probs", "ts"):
                shuffled[key] = shuffled[key][row, perms]

            # rebatch to (n_batches, train_bs, ...)
            n_batches = total_bs // train_bs
            batched = {
                k: v.reshape(n_batches, train_bs, *v.shape[1:])
                for k, v in shuffled.items()
            }

            num_train_ts = int(num_timesteps * args.train_timestep_ratio)
            infos = []
            timer()
            for i in range(n_batches):
                base = {
                    "prompt_embeds": batched["embeds"][i],
                    "uncond_embeds": np.asarray(train_uncond),
                    "advantages": batched["advantages"][i],
                }
                do_opt_update = (i + 1) % args.train_accumulation_steps == 0
                if getattr(args, "fused_train_loop", False):
                    batch = dict(
                        base,
                        latents=batched["latents"][i][:, :num_train_ts].swapaxes(0, 1),
                        next_latents=batched["next_latents"][i][:, :num_train_ts].swapaxes(0, 1),
                        log_probs=batched["log_probs"][i][:, :num_train_ts].swapaxes(0, 1),
                        ts=batched["ts"][i][:, :num_train_ts].swapaxes(0, 1),
                    )
                    sharded = {
                        # per-timestep tensors carry the batch on axis 1
                        # ((T, B, ...) fused layout); both calls assemble
                        # global arrays from the per-process local batch
                        k: shard_batch(
                            mesh, v, batch_axis=0 if k in base else 1
                        )
                        for k, v in batch.items()
                    }
                    state, info = jit_train_step(
                        state, sharded, sched_state,
                        do_opt_update=do_opt_update, frozen=train_frozen,
                    )
                    infos.append(jax.tree_util.tree_map(np.asarray, jax.device_get(info)))
                else:
                    for j in range(num_train_ts):
                        batch = dict(
                            base,
                            latents=batched["latents"][i][:, j],
                            next_latents=batched["next_latents"][i][:, j],
                            log_probs=batched["log_probs"][i][:, j],
                            ts=batched["ts"][i][:, j],
                        )
                        upd = do_opt_update and (j == num_train_ts - 1)
                        state, info = jit_train_step(
                            state, shard_batch(mesh, batch), sched_state,
                            do_opt_update=upd, frozen=train_frozen,
                        )
                        infos.append(
                            jax.tree_util.tree_map(np.asarray, jax.device_get(info))
                        )
            train_time = timer()
            all_processes_equal(infos[-1], "train infos")
            infos = {k: np.stack([i[k] for i in infos]) for k in infos[0]}
            print(
                f"[ pg ] epoch {epoch}.{inner_epoch}: "
                f"loss {infos['loss'].mean():.5f} | kl {infos['approx_kl'].mean():.2e} "
                f"| clipfrac {infos['clipfrac'].mean():.3f} | {train_time:.2f}s"
            )
            metrics.log(
                epoch,
                phase="train",
                inner_epoch=inner_epoch,
                loss=float(infos["loss"].mean()),
                approx_kl=float(infos["approx_kl"].mean()),
                clipfrac=float(infos["clipfrac"].mean()),
                train_time_s=float(train_time),
            )
            if worker_id == 0:
                np.save(
                    fs.join_and_create(
                        localpath, f"train_info/{worker_id}_{epoch}_{inner_epoch}.npy"
                    ),
                    infos,
                )

        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()

        # ============================ checkpointing ============================ #
        if (
            (epoch + 1) % args.save_freq == 0
            or epoch == args.num_train_epochs - 1
            or shutdown_requested["flag"]
        ):
            # device->host copy is synchronous (the next train step donates
            # the state buffers); the ~8.5GB serialization + disk write
            # overlaps the next epoch (SURVEY 5.4: async full-state save)
            save_train_state(
                ckpt_root,
                epoch,
                {
                    "state": jax.device_get(state),
                    "epoch": epoch,
                    "rng": jax.device_get(jax.random.key_data(sample_rng)),
                },
                host_state=host_checkpoint_state(),
                block=False,
            )
            if getattr(args, "keep_checkpoints", 0) > 0:
                from ddpo_tpu.utils.checkpoints import prune_checkpoints

                prune_checkpoints(ckpt_root, args.keep_checkpoints)

        if worker_id == 0:
            _plot_rewards(mean_rewards, std_rewards, localpath, worker_id)
            with open(os.path.join(localpath, "reward_curve.json"), "w") as f:
                json.dump({"mean": mean_rewards, "std": std_rewards}, f)

        if fs.is_remote(args.savepath):
            # durable artifacts: stream everything under localpath (npy/png/
            # curves/checkpoints) to the bucket, asynchronously, process 0
            # (reference async_to_bucket, utils/serialization.py:383-399).
            # Join in-flight checkpoint writes first so the sync never ships
            # a half-written Orbax dir.
            from ddpo_tpu.utils.serialization import async_to_bucket

            wait_for_pending_saves()
            async_to_bucket(localpath, args.savepath)

        if shutdown_requested["flag"]:
            print(f"[ pg ] graceful shutdown after epoch {epoch} (checkpointed)")
            break

    if prev_sigterm is not None:
        _signal.signal(_signal.SIGTERM, prev_sigterm)
    if lora_rank and worker_id == 0:
        # export the MERGED UNet in the reference pkl format so downstream
        # drivers (generate/sample/finetune) consume the LoRA-trained model
        # without any adapter knowledge; resume still uses the small
        # adapter-tree Orbax checkpoints
        from ddpo_tpu.utils.checkpoints import save_unet

        merged = jax.jit(merge_lora)(base_unet_params, state.params)
        save_unet(localpath, merged, epoch=args.num_train_epochs - 1)
        print(f"[ pg ] lora: merged unet exported to {localpath}")
    wait_for_pending_saves()
    if fs.is_remote(args.savepath):
        from ddpo_tpu.utils.serialization import async_to_bucket

        async_to_bucket(localpath, args.savepath, wait=True)  # final full sync
    return mean_rewards


def _plot_rewards(mean_rewards, std_rewards, localpath, worker_id):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.clf()
    mean, std = np.array(mean_rewards), np.array(std_rewards)
    plt.plot(mean, color="black")
    plt.fill_between(range(len(mean)), mean - std, mean + std, alpha=0.4, color="blue")
    plt.savefig(os.path.join(localpath, f"log_{worker_id}.png"))
    plt.close()


if __name__ == "__main__":
    main()
