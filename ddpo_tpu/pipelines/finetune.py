"""RWR supervised finetuning over a sampled HDF5 dataset.

Rebuilds /root/reference/pipeline/finetune.py: bucket loader with per-host
sharding, optional softmax dataset/batch weighting (incl. per-prompt), adamw
+ global-norm clip, jitted diffusion train step over the dp mesh, unet pickle
saves every save_freq epochs (same artifact the next RWR iteration loads).

Run: python -m ddpo_tpu.pipelines.finetune --dataset compressed-animals-rwr
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax.training.train_state import TrainState

from ddpo_tpu import training
from ddpo_tpu.core.scheduler import DDPMScheduler
from ddpo_tpu.data import get_bucket_loader
from ddpo_tpu.parallel import MeshConfig, create_mesh, replicated, shard_batch
from ddpo_tpu.parallel.collectives import n_params, sharded_softmax
from ddpo_tpu.utils import Progress
from ddpo_tpu.utils.checkpoints import save_unet
from ddpo_tpu.utils.metrics import MetricsLogger
from ddpo_tpu.parallel.mesh import maybe_initialize_distributed
from ddpo_tpu.utils.parser import Parser as BaseParser
from ddpo_tpu.utils.serialization import load_unet


class Parser(BaseParser):
    config: str = "ddpo_tpu.config.base"
    dataset: str = "compressed_animals_rwr"


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def main(argv=None):
    maybe_initialize_distributed()
    # clear any attention-sharding context left by a previous driver
    # main() in this process (e.g. a tp/sp policy-gradient run in the
    # test suite) before any model trace
    from ddpo_tpu.ops import set_attention_sharding as _reset_attn

    _reset_attn(None)
    args = Parser().parse_args("train", argv)
    mesh = create_mesh(MeshConfig(tp=1))
    dp = mesh.shape["dp"]

    modelpath = None if args.iteration == 0 else args.modelpath
    models, params = load_unet(
        modelpath,
        epoch=args.load_epoch,
        pretrained_model=args.pretrained_model,
        dtype=_dtype(args.dtype),
        cache=args.cache,
        seed=args.seed,
        model_preset=getattr(args, "model_preset", "sd14"),
    )
    print(f"[ finetune ] unet params: {n_params(params['unet'])/1e6:.1f}M")

    worker_batch_size = args.train_batch_size * dp
    pod_batch_size = worker_batch_size * jax.process_count()

    train_dataset, train_loader = get_bucket_loader(
        args.loadpath,
        models.tokenizer,
        batch_size=worker_batch_size,
        resolution=args.resolution,
        max_train_samples=args.max_train_samples,
        num_workers=getattr(args, "num_workers", 2),
    )

    assert not (args.weighted_batch and args.weighted_dataset)
    if args.weighted_dataset:
        train_dataset.make_weights(
            args.filter_field, args.temperature, args.per_prompt_weights
        )

    from ddpo_tpu.training.optim import build_optimizer

    optimizer = build_optimizer(args)

    def unet_apply(p, latents, t, context):
        return models.unet.apply({"params": p}, latents, t, context)

    lora_rank = int(getattr(args, "lora_rank", 0) or 0)
    if lora_rank:
        # rank-r adapters on the attention projections; base UNet frozen.
        # Same merge-at-apply mechanism as the pg driver (models/lora.py) —
        # the TrainState holds only the small adapter tree.
        from ddpo_tpu.models.lora import init_lora, merge_lora, n_lora_params

        base_unet_params = jax.device_put(params["unet"], replicated(mesh))
        lora_params0 = init_lora(
            base_unet_params, lora_rank, jax.random.PRNGKey(args.seed or 0)
        )
        print(
            f"[ finetune ] lora: rank {lora_rank}, "
            f"{n_lora_params(lora_params0)/1e6:.2f}M trainable (base frozen)"
        )
        _full_unet_apply = unet_apply
        if getattr(args, "remat", True):
            # remat only the UNet body: the (base + A@B) merge stays outside
            # the checkpoint boundary so it is computed once per step, not
            # rematerialized per backward segment (same structure as the pg
            # driver)
            _full_unet_apply = jax.checkpoint(_full_unet_apply)

        # the frozen base reaches the step as a RUNTIME kwarg (train_step's
        # `frozen`), never a closure: closed-over concrete arrays embed as
        # HLO constants — ~1.7GB of literals at SD scale blew up lowering
        # and crashed the XLA compile service (see pg driver lora block)
        def unet_apply(base, p, latents, t, context):
            return _full_unet_apply(
                merge_lora(base, p), latents, t, context
            )

    if getattr(args, "remat", True) and not lora_rank:
        unet_apply = jax.checkpoint(unet_apply)

    def text_apply(p, ids):
        return models.text_encoder.apply({"params": p}, ids)

    state = TrainState.create(
        apply_fn=unet_apply,
        params=lora_params0 if lora_rank else params["unet"],
        tx=optimizer,
    )
    state = jax.device_put(state, replicated(mesh))
    text_params = jax.device_put(params["text_encoder"], replicated(mesh))

    scheduler = DDPMScheduler()
    sched_state = jax.device_put(scheduler.create_state(), replicated(mesh))

    jit_step = jax.jit(
        functools.partial(
            training.diffusion.train_step,
            text_encoder_apply=text_apply,
            scheduler=scheduler,
            train_cfg=args.train_cfg,
            guidance_scale=args.guidance_scale,
            # CFG as one 2B-batch apply for bf16 (see policy_gradient driver)
            cfg_concat=args.dtype == "bfloat16",
        ),
        donate_argnums=(0,),
    )

    steps_per_epoch = max(1, len(train_dataset) // worker_batch_size)
    max_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch
    num_epochs = (
        args.num_train_epochs
        if args.max_train_steps is None
        else math.ceil(max_steps / steps_per_epoch)
    )
    print(
        f"[ finetune ] dataset {len(train_dataset)} | worker bs "
        f"{worker_batch_size} | pod bs {pod_batch_size} | steps {max_steps}"
    )

    from ddpo_tpu.utils.metrics import run_dir

    metrics = MetricsLogger(run_dir(args.savepath), enabled=jax.process_index() == 0)

    rng = jax.random.PRNGKey(args.seed)
    global_step = 0
    for epoch in range(num_epochs):
        losses = []
        progress = Progress(steps_per_epoch, name=f"epoch {epoch}")
        for batch in train_loader:
            if args.weighted_batch:
                rewards = jnp.asarray(batch[args.filter_field]).squeeze()
                weights = sharded_softmax(
                    mesh, shard_batch(mesh, rewards), temperature=args.temperature
                )
            elif args.weighted_dataset:
                weights = shard_batch(
                    mesh,
                    jnp.asarray(batch["weights"]).squeeze() / pod_batch_size,
                )
            else:
                weights = None

            device_batch = shard_batch(
                mesh,
                {
                    "vae": jnp.asarray(batch["vae"]),
                    "input_ids": jnp.asarray(batch["input_ids"]),
                    "uncond_text": jnp.asarray(batch["uncond_text"]),
                },
            )
            rng, step_rng = jax.random.split(rng)
            state, loss, _ = jit_step(
                state,
                text_encoder_params=text_params,
                batch=device_batch,
                rng=step_rng,
                scheduler_state=sched_state,
                frozen=base_unet_params if lora_rank else None,
                weights=weights,
            )
            losses.append(float(loss))
            progress(
                {
                    "loss": losses[-1],
                    "idx_max": int(np.max(batch["idxs"])),
                    "cfg": args.train_cfg,
                }
            )
            global_step += 1
            if global_step >= max_steps:
                break
        progress.stamp()
        print(f"[ finetune ] epoch {epoch} loss {np.mean(losses):.5f}")
        metrics.log(
            epoch,
            phase="finetune",
            loss=float(np.mean(losses)),
            global_step=int(global_step),
        )

        if (epoch + 1) % args.save_freq == 0 or epoch == num_epochs - 1:
            # lora: export the MERGED full UNet so the next RWR iteration's
            # sampler loads it with no adapter knowledge (reference handoff
            # format, pipeline/sample.py load path)
            export_params = (
                jax.jit(merge_lora)(base_unet_params, state.params)
                if lora_rank else state.params
            )
            save_unet(
                args.savepath, export_params, all_workers=True,
                epoch=(epoch + 1) // args.save_freq * args.save_freq,
            )
        if global_step >= max_steps:
            break
    return state


if __name__ == "__main__":
    main()
