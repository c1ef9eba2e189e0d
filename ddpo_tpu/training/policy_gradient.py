"""DDPO: PPO-style clipped policy gradient over the denoising chain.

Re-implements the reference's training step (/root/reference/ddpo/training/
policy_gradient.py:60-146) for a jit+mesh world:

  - recompute eps at stored (latent, t) under current params (optional CFG
    double forward, ref :86-107),
  - score stored next_latents through the DDIM step in score mode to get the
    new log-prob (ref :110-118),
  - PPO clipped surrogate on exp(logp_new - logp_old) with advantages clipped
    to +-ADV_CLIP_MAX (ref :120-125), info = approx_kl / clipfrac / loss,
  - gradient accumulation with a *static* do_update flag: two jit
    specializations instead of optax.MultiSteps' extra opt-state buffer
    (ref AccumulatingTrainState :13-57).

No jax.lax.pmean: callers jit this with the batch sharded over the mesh's
'dp' axis and params replicated — XLA inserts the gradient all-reduce.

``train_step_fused`` additionally scans over the timestep axis on device so
one dispatch covers a whole trajectory's updates (the reference pays one pmap
dispatch per (batch, timestep) pair, pipeline/policy_gradient.py:414-441).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.training.train_state import TrainState

from ddpo_tpu.core.scheduler import DDIMScheduler, DDIMState

ADV_CLIP_MAX = 10.0


def _bind_frozen(apply_fn: Callable, frozen: Any) -> Callable:
    """Prepend a frozen (non-trainable) param tree to ``apply_fn``.

    LoRA-style training freezes the 860M-param base UNet and trains only
    the adapters, so the base tree must reach the apply as a RUNTIME
    ARGUMENT of the jitted step: a python closure over concrete device
    arrays embeds them as constants in the lowered module (for SD-1.4,
    ~1.7GB of bf16 literals — lowering alone took >15 min and the
    multi-GB program crashed the XLA compile service; same failure mode
    the pg driver documents for the CLIP tower). ``frozen`` here is a
    tracer inside jit, so the closure below adds graph edges, not bytes.
    """
    if frozen is None:
        return apply_fn
    return lambda p, *args: apply_fn(frozen, p, *args)


class AccumulatingTrainState(TrainState):
    """TrainState with a gradient-accumulation buffer.

    ``do_update`` is a static python bool: each branch compiles separately, so
    no extra opt_state-sized buffer is ever allocated (the reference documents
    the same trade at training/policy_gradient.py:14-27).
    """

    grad_acc: Any = None
    n_acc: int = 0

    def apply_gradients(self, *, grads, do_update: bool = True, **kwargs):
        if self.grad_acc is None:
            # no accumulation buffer allocated (accumulate=False at create):
            # a params-sized fp32 buffer is 3.4GB for SD-1.4 — dead weight
            # whenever train_accumulation_steps == 1 (the default)
            assert do_update, "created without an accumulation buffer"
            return super().apply_gradients(grads=grads, **kwargs)
        if do_update:
            mean_grads = jax.tree_util.tree_map(
                lambda ga, g: (ga + g) / (self.n_acc + 1), self.grad_acc, grads
            )
            new_state = super().apply_gradients(grads=mean_grads, **kwargs)
            return new_state.replace(
                grad_acc=jax.tree_util.tree_map(jnp.zeros_like, self.grad_acc),
                n_acc=0,
            )
        return self.replace(
            grad_acc=jax.tree_util.tree_map(jnp.add, self.grad_acc, grads),
            n_acc=self.n_acc + 1,
        )

    @classmethod
    def create(cls, *, params, accumulate: bool = True, **kwargs):
        return super().create(
            params=params,
            grad_acc=(
                jax.tree_util.tree_map(jnp.zeros_like, params)
                if accumulate
                else None
            ),
            n_acc=0,
            **kwargs,
        )


def ppo_loss(
    params,
    apply_fn: Callable,
    batch: Dict[str, jnp.ndarray],
    scheduler: DDIMScheduler,
    scheduler_state: DDIMState,
    train_cfg: bool,
    guidance_scale: float,
    eta: float,
    clip_range: float,
    cfg_concat: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Clipped-surrogate loss for one (batch, timestep) slice.

    batch keys: latents (B,4,h,w), next_latents, ts (B,), log_probs (B,),
    advantages (B,), prompt_embeds (B,77,D), uncond_embeds (B,77,D).

    cfg_concat runs CFG as one 2B-batch apply instead of the reference's two
    B-batch applies (training/policy_gradient.py:86-107) — the UNet is
    pointwise across batch (GN/LN/attention stats are per-sample), so the
    math is identical while matching the sampler's concat compute pattern.
    Measured on v5e at 512px (BENCHLOG.md): 1.29x for the bf16 fused step
    (121.8 -> 94.6 ms per sample-timestep), but SLOWER for fp32 under
    whole-model remat (175 -> 211 ms: the 2B fp32 recompute spills), so the
    driver enables it for bf16 training only.
    """
    if train_cfg and cfg_concat:
        eps = apply_fn(
            params,
            jnp.concatenate([batch["latents"], batch["latents"]]),
            jnp.concatenate([batch["ts"], batch["ts"]]),
            jnp.concatenate([batch["uncond_embeds"], batch["prompt_embeds"]]),
        )
        eps_uncond, eps_text = jnp.split(eps, 2)
        noise_pred = eps_uncond + guidance_scale * (eps_text - eps_uncond)
    elif train_cfg:
        eps_text = apply_fn(
            params, batch["latents"], batch["ts"], batch["prompt_embeds"]
        )
        eps_uncond = apply_fn(
            params, batch["latents"], batch["ts"], batch["uncond_embeds"]
        )
        noise_pred = eps_uncond + guidance_scale * (eps_text - eps_uncond)
    else:
        noise_pred = apply_fn(
            params, batch["latents"], batch["ts"], batch["prompt_embeds"]
        )

    _, log_prob = scheduler.step(
        scheduler_state,
        noise_pred,
        batch["ts"],
        batch["latents"],
        prev_sample=batch["next_latents"],
        eta=eta,
    )

    advantages = jnp.clip(batch["advantages"], -ADV_CLIP_MAX, ADV_CLIP_MAX)
    ratio = jnp.exp(log_prob - batch["log_probs"])
    unclipped = -advantages * ratio
    clipped = -advantages * jnp.clip(ratio, 1.0 - clip_range, 1.0 + clip_range)
    loss = jnp.mean(jnp.maximum(unclipped, clipped))

    info = {
        # http://joschu.net/blog/kl-approx.html (same estimator as reference)
        "approx_kl": 0.5 * jnp.mean((log_prob - batch["log_probs"]) ** 2),
        "clipfrac": jnp.mean((jnp.abs(ratio - 1.0) > clip_range).astype(jnp.float32)),
        "loss": loss,
    }
    return loss, info


def train_step(
    state: AccumulatingTrainState,
    batch: Dict[str, jnp.ndarray],
    scheduler_state: DDIMState,
    scheduler: DDIMScheduler,
    train_cfg: bool,
    guidance_scale: float,
    eta: float,
    clip_range: float,
    do_opt_update: bool,
    cfg_concat: bool = False,
    frozen: Any = None,
) -> Tuple[AccumulatingTrainState, Dict[str, jnp.ndarray]]:
    """One PPO update/accumulation step. Jit with scheduler/flags static.

    ``frozen``: optional non-trainable param tree (e.g. the LoRA base UNet)
    passed through to ``state.apply_fn(frozen, params, ...)`` — a runtime
    argument so it never embeds as HLO constants (see _bind_frozen).
    """
    apply_fn = _bind_frozen(state.apply_fn, frozen)

    def compute_loss(params):
        return ppo_loss(
            params, apply_fn, batch, scheduler, scheduler_state,
            train_cfg, guidance_scale, eta, clip_range, cfg_concat,
        )

    grads, info = jax.grad(compute_loss, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads=grads, do_update=do_opt_update)
    return new_state, info


def _fused_grads(
    params,
    apply_fn: Callable,
    per_t: Dict[str, jnp.ndarray],
    shared: Dict[str, jnp.ndarray],
    scheduler: DDIMScheduler,
    scheduler_state: DDIMState,
    train_cfg: bool,
    guidance_scale: float,
    eta: float,
    clip_range: float,
    cfg_concat: bool,
) -> Tuple[Any, Dict[str, jnp.ndarray]]:
    """Timestep-scanned PPO gradients, averaged over T (see train_step_fused)."""
    num_t = per_t["ts"].shape[0]

    def one_t(carry, slice_t):
        grad_sum, info_sum = carry
        full = dict(slice_t, **shared)

        def compute_loss(p):
            return ppo_loss(
                p, apply_fn, full, scheduler, scheduler_state,
                train_cfg, guidance_scale, eta, clip_range, cfg_concat,
            )

        grads, info = jax.grad(compute_loss, has_aux=True)(params)
        grad_sum = jax.tree_util.tree_map(jnp.add, grad_sum, grads)
        info_sum = jax.tree_util.tree_map(jnp.add, info_sum, info)
        return (grad_sum, info_sum), None

    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    zero_info = {
        "approx_kl": jnp.zeros(()),
        "clipfrac": jnp.zeros(()),
        "loss": jnp.zeros(()),
    }
    (grad_sum, info_sum), _ = jax.lax.scan(one_t, (zero_grads, zero_info), per_t)

    grads = jax.tree_util.tree_map(lambda g: g / num_t, grad_sum)
    info = jax.tree_util.tree_map(lambda x: x / num_t, info_sum)
    return grads, info


def train_step_fused(
    state: AccumulatingTrainState,
    batch: Dict[str, jnp.ndarray],
    scheduler_state: DDIMState,
    scheduler: DDIMScheduler,
    train_cfg: bool,
    guidance_scale: float,
    eta: float,
    clip_range: float,
    do_opt_update: bool,
    cfg_concat: bool = False,
    frozen: Any = None,
    grad_reduce_mesh: Any = None,
    grad_reduce_dtype: Any = None,
) -> Tuple[AccumulatingTrainState, Dict[str, jnp.ndarray]]:
    """Scan over the timestep axis on device: one dispatch per trajectory.

    batch carries a leading timestep axis on latents/next_latents/ts/
    log_probs: (T, B, ...). Gradients from every timestep are averaged (same
    effective update as the reference's T sequential accumulation steps with
    the optimizer firing on the last), then applied once. ``frozen`` as in
    ``train_step`` (runtime argument; closed-over tracer inside the scan —
    XLA hoists the loop-invariant merge out of the while loop).

    grad_reduce_mesh/grad_reduce_dtype: optional reduced-precision gradient
    all-reduce. The default GSPMD path reduces gradients at the parameter
    dtype — fp32 masters mean a 3.28 GB fp32 all-reduce per update at
    SD-1.4 scale (compile-measured, bench_scaling_model.py). With a mesh
    and a dtype (e.g. bf16), the grad computation runs inside a shard_map
    over the 'dp' axis, casts the local grads to that dtype BEFORE the
    psum, and casts back to the param dtype after — halving dp traffic
    (the reference all-reduces fp32 via pmean,
    /root/reference/ddpo/training/policy_gradient.py:141-142). Requires a
    pure-dp mesh (sp=tp=1); batch must divide by dp.
    """
    apply_fn = _bind_frozen(state.apply_fn, frozen)
    per_t = {
        k: batch[k] for k in ("latents", "next_latents", "ts", "log_probs")
    }
    shared = {
        k: batch[k] for k in ("advantages", "prompt_embeds", "uncond_embeds")
    }

    if grad_reduce_dtype is not None:
        assert grad_reduce_mesh is not None
        mesh = grad_reduce_mesh
        assert mesh.shape.get("sp", 1) == 1 and mesh.shape.get("tp", 1) == 1, (
            "grad_reduce_dtype supports pure-dp meshes (sp=tp=1): with tp/sp "
            "the gradient reduction is not a single dp psum"
        )
        from jax.sharding import PartitionSpec as P

        from ddpo_tpu.parallel.mesh import shard_map_compat

        def local_grads(params, sched_state, per_t_l, shared_l, frozen_l):
            afn = _bind_frozen(state.apply_fn, frozen_l)
            grads, info = _fused_grads(
                params, afn, per_t_l, shared_l, scheduler, sched_state,
                train_cfg, guidance_scale, eta, clip_range, cfg_concat,
            )
            # local mean grads -> dtype-reduced psum -> global mean grads:
            # pmean of per-shard means == the GSPMD global-batch mean
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(grad_reduce_dtype), grads
            )
            grads = jax.lax.pmean(grads, "dp")
            grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), grads, params
            )
            info = jax.lax.pmean(info, "dp")
            return grads, info

        grads, info = shard_map_compat(
            local_grads,
            mesh,
            in_specs=(
                P(),                                     # params: replicated
                P(),                                     # scheduler state
                {k: P(None, "dp") for k in per_t},       # (T, B, ...)
                {k: P("dp") for k in shared},            # (B, ...)
                P(),                                     # frozen tree
            ),
            out_specs=(P(), P()),
        )(state.params, scheduler_state, per_t, shared, frozen)
    else:
        grads, info = _fused_grads(
            state.params, apply_fn, per_t, shared, scheduler,
            scheduler_state, train_cfg, guidance_scale, eta, clip_range,
            cfg_concat,
        )

    new_state = state.apply_gradients(grads=grads, do_update=do_opt_update)
    return new_state, info


def inner_epoch_resident(
    state: AccumulatingTrainState,
    samples: Dict[str, jnp.ndarray],
    scheduler_state: DDIMState,
    rng: jax.Array,
    scheduler: DDIMScheduler,
    train_batch_size: int,
    num_train_ts: int,
    train_cfg: bool,
    guidance_scale: float,
    eta: float,
    clip_range: float,
    accumulation_steps: int = 1,
    cfg_concat: bool = False,
    frozen: Any = None,
) -> Tuple[AccumulatingTrainState, Dict[str, jnp.ndarray]]:
    """One full PPO inner epoch as a single on-device program.

    The reference round-trips every trajectory through host numpy for the
    shuffle/rebatch (pipeline/policy_gradient.py:385-404) and dispatches one
    pmap per (batch, timestep). Here everything stays device-resident:

      - batch shuffle: jax.random.permutation gather,
      - independent per-sample timestep permutation: vmapped permutation +
        take_along_axis (ref :389-393 semantics),
      - rebatch to (n_batches, train_batch_size, ...) and lax.scan over
        minibatches, scanning timesteps inside (grads averaged over
        timesteps, optimizer applied once per minibatch — equivalent to the
        reference's accumulate-then-update at the last timestep).
      - gradient accumulation (accumulation_steps > 1): minibatches are
        grouped (n_groups, accumulation_steps); the first A-1 of each group
        run the statically-compiled accumulate-only branch, the last applies
        the update — the same two-program structure as the host loop
        (reference pipeline/policy_gradient.py:426-441), expressed as a
        nested scan so do_opt_update stays a static bool.

    samples keys: latents/next_latents (B, T, 4, h, w), ts/log_probs (B, T),
    advantages (B,), embeds (B, 77, D), uncond_embeds (B, 77, D).
    Jit with everything from `scheduler` on static; B % train_batch_size == 0.
    """
    total_b, num_timesteps = samples["log_probs"].shape
    n_batches = total_b // train_batch_size

    perm_key, ts_key = jax.random.split(rng)
    perm = jax.random.permutation(perm_key, total_b)
    shuffled = jax.tree_util.tree_map(lambda x: x[perm], samples)

    t_perms = jax.vmap(lambda k: jax.random.permutation(k, num_timesteps))(
        jax.random.split(ts_key, total_b)
    )  # (B, T)
    for key in ("latents", "next_latents", "log_probs", "ts"):
        x = shuffled[key]
        idx = t_perms.reshape(t_perms.shape + (1,) * (x.ndim - 2))
        shuffled[key] = jnp.take_along_axis(x, idx, axis=1)

    def rebatch(x):
        return x.reshape(n_batches, train_batch_size, *x.shape[1:])

    batched = {k: rebatch(v) for k, v in shuffled.items()}

    def make_minibatch_step(do_opt_update: bool):
        def per_minibatch(state, mb):
            fused = {
                "latents": jnp.swapaxes(mb["latents"][:, :num_train_ts], 0, 1),
                "next_latents": jnp.swapaxes(
                    mb["next_latents"][:, :num_train_ts], 0, 1
                ),
                "ts": jnp.swapaxes(mb["ts"][:, :num_train_ts], 0, 1),
                "log_probs": jnp.swapaxes(mb["log_probs"][:, :num_train_ts], 0, 1),
                "advantages": mb["advantages"],
                "prompt_embeds": mb["embeds"],
                "uncond_embeds": mb["uncond_embeds"],
            }
            state, info = train_step_fused(
                state, fused, scheduler_state, scheduler, train_cfg,
                guidance_scale, eta, clip_range, do_opt_update=do_opt_update,
                cfg_concat=cfg_concat, frozen=frozen,
            )
            return state, info

        return per_minibatch

    if accumulation_steps <= 1:
        state, infos = jax.lax.scan(make_minibatch_step(True), state, batched)
        return state, infos  # infos: (n_batches,) per metric

    assert n_batches % accumulation_steps == 0, (
        f"n_batches {n_batches} not divisible by accumulation_steps "
        f"{accumulation_steps}"
    )
    grouped = {
        k: v.reshape(-1, accumulation_steps, *v.shape[1:])
        for k, v in batched.items()
    }

    def per_group(state, grp):
        head = {k: v[:-1] for k, v in grp.items()}
        tail = {k: v[-1] for k, v in grp.items()}
        state, infos_head = jax.lax.scan(make_minibatch_step(False), state, head)
        state, info_tail = make_minibatch_step(True)(state, tail)
        infos = jax.tree_util.tree_map(
            lambda h, t: jnp.concatenate([h, t[None]], axis=0),
            infos_head, info_tail,
        )
        return state, infos

    state, infos = jax.lax.scan(per_group, state, grouped)
    # (n_groups, accumulation_steps) -> (n_batches,) per metric
    infos = jax.tree_util.tree_map(
        lambda x: x.reshape(n_batches, *x.shape[2:]), infos
    )
    return state, infos
