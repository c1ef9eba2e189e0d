"""Measure PPO log-prob recomputation noise across dtype configurations.

The DDPO ratio exp(logp_new - logp_old) compares the TRAIN-path recompute of
the per-step Gaussian log-prob against the SAMPLE-path value stored during
rollout (reference training/policy_gradient.py:110-125). At sampling params
the two should agree exactly; any |dlogp| is pure numerics — the train/sample
compute paths disagreeing — and it feeds straight into the clipped surrogate
(ppo_clip_range defaults to 1e-4, reference config/base.py:84).

Round-1 measured |dlogp| ~ 1e-2 for bf16 sampling + fp32 training (different
kernels in the two passes) and set the slow fp32 sampling default. This
script measures the MATCHED configuration — bf16 sample + bf16-compute train
(fp32 master params, flax casts at use) — at production geometry on the real
chip, against the fp32/fp32 floor and the mismatched configs, and reports the
implied clipfrac at candidate clip ranges. VERDICT round-2 item #1.

Run (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python bench_logp.py
Env knobs: LOGP_BATCH (8), LOGP_STEPS (50), LOGP_RES (512), LOGP_TRAIN_BS (2).
"""

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpo_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from ddpo_tpu.core.scheduler import DDIMScheduler
from ddpo_tpu.sampling import SamplerConfig, sample_trajectories
from ddpo_tpu.utils.serialization import load_unet

BATCH = int(os.environ.get("LOGP_BATCH", 8))
STEPS = int(os.environ.get("LOGP_STEPS", 50))
RES = int(os.environ.get("LOGP_RES", 512))
TRAIN_BS = int(os.environ.get("LOGP_TRAIN_BS", 2))
GUIDANCE = 5.0
ETA = 1.0
CLIP_CANDIDATES = (1e-4, 1e-3, 1e-2, 0.1)


def recompute_logp(unet_model, scheduler, sched_state, params, traj,
                   context, uncond, train_bs=2, cfg_concat=True):
    """Train-path log-prob of a stored trajectory under `params`.

    Mirrors training.policy_gradient.ppo_loss's noise-pred + score-mode
    scheduler step, scanning (T, n_chunks) on device: one dispatch total.
    Returns (B, T) log-probs.
    """
    B, T = traj["log_probs"].shape
    n_chunks = B // train_bs

    def chunked(x):  # (B, T, ...) -> (T, n_chunks, train_bs, ...)
        x = jnp.moveaxis(x, 1, 0)
        return x.reshape(T, n_chunks, train_bs, *x.shape[2:])

    lat = chunked(traj["latents"])
    nxt = chunked(traj["next_latents"])
    ts = chunked(traj["ts"])
    ctx = context.reshape(n_chunks, train_bs, *context.shape[1:])
    unc = uncond.reshape(n_chunks, train_bs, *uncond.shape[1:])

    def apply_fn(p, x, t, c):
        return unet_model.apply({"params": p}, x, t, c)

    def one_chunk(_, args):
        lat_c, nxt_c, ts_c, ctx_c, unc_c = args
        if cfg_concat:
            eps = apply_fn(
                params,
                jnp.concatenate([lat_c, lat_c]),
                jnp.concatenate([ts_c, ts_c]),
                jnp.concatenate([unc_c, ctx_c]),
            )
            eps_u, eps_t = jnp.split(eps, 2)
        else:
            eps_t = apply_fn(params, lat_c, ts_c, ctx_c)
            eps_u = apply_fn(params, lat_c, ts_c, unc_c)
        noise_pred = eps_u + GUIDANCE * (eps_t - eps_u)
        _, logp = scheduler.step(
            sched_state, noise_pred, ts_c, lat_c, prev_sample=nxt_c, eta=ETA
        )
        return None, logp

    def one_t(_, args):
        lat_t, nxt_t, ts_t = args
        _, logp = jax.lax.scan(one_chunk, None, (lat_t, nxt_t, ts_t, ctx, unc))
        return None, logp.reshape(B)

    _, logps = jax.lax.scan(one_t, None, (lat, nxt, ts))  # (T, B)
    return logps.T


def stats(name, logp_new, logp_old):
    d = np.abs(np.asarray(logp_new, np.float64) - np.asarray(logp_old, np.float64))
    ratio_dev = np.abs(np.exp(np.asarray(logp_new, np.float64)
                              - np.asarray(logp_old, np.float64)) - 1.0)
    out = {
        "config": name,
        "dlogp_mean": float(d.mean()),
        "dlogp_median": float(np.median(d)),
        "dlogp_p90": float(np.percentile(d, 90)),
        "dlogp_max": float(d.max()),
        "approx_kl": float(0.5 * (d ** 2).mean()),
        "clipfrac": {
            f"{c:g}": float((ratio_dev > c).mean()) for c in CLIP_CANDIDATES
        },
    }
    print(json.dumps(out))
    return out


def main():
    print(f"[ bench_logp ] devices: {jax.devices()}")
    models, params = load_unet(
        None, pretrained_model="duongna/stable-diffusion-v1-4-flax",
        dtype=jnp.float32, activation_dtype=jnp.bfloat16,
        model_preset=os.environ.get("LOGP_PRESET", "sd14"), seed=0,
    )
    unet_bf16 = models.unet
    unet_fp32 = type(models.unet)(models.unet.config, dtype=jnp.float32)
    scheduler = models.scheduler
    sched_state = scheduler.set_timesteps(scheduler.create_state(), STEPS)

    params_f32 = params["unet"]
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params_f32
    )

    key = jax.random.PRNGKey(0)
    ctx_key, unc_key, sample_key = jax.random.split(key, 3)
    embed_dim = unet_bf16.config.cross_attention_dim
    context = jax.random.normal(ctx_key, (BATCH, 77, embed_dim), jnp.float32)
    uncond = jnp.broadcast_to(
        jax.random.normal(unc_key, (1, 77, embed_dim), jnp.float32),
        context.shape,
    )

    cfg = SamplerConfig(
        num_inference_steps=STEPS, guidance_scale=GUIDANCE, eta=ETA,
        height=RES, width=RES,
        vae_scale_factor=2 ** (len(models.vae.config.block_out_channels) - 1),
        latent_channels=models.vae.config.latent_channels,
    )

    def sample_with(unet_model, p):
        fn = jax.jit(functools.partial(
            sample_trajectories,
            lambda pp, x, t, c: unet_model.apply({"params": pp}, x, t, c),
            scheduler=scheduler, config=cfg,
        ))
        traj = fn(p, scheduler_state=sched_state, prompt_embeds=context,
                  uncond_embeds=uncond, key=sample_key)
        jax.device_get(traj["log_probs"])  # sync (relay-safe)
        return jax.tree_util.tree_map(jax.device_get, traj)

    print("[ bench_logp ] sampling bf16 trajectory...")
    traj_bf16 = sample_with(unet_bf16, params_bf16)
    print("[ bench_logp ] sampling fp32 trajectory...")
    traj_f32 = sample_with(unet_fp32, params_f32)

    results = []
    runs = [
        # (name, unet, params, traj, train_bs, cfg_concat)
        ("fp32_sample/fp32_train_twoapply", unet_fp32, params_f32, traj_f32,
         TRAIN_BS, False),
        ("bf16_sample/fp32_train_twoapply", unet_fp32, params_f32, traj_bf16,
         TRAIN_BS, False),
        ("bf16_sample/bf16_train_concat_bs%d" % TRAIN_BS, unet_bf16,
         params_f32, traj_bf16, TRAIN_BS, True),
    ]
    if os.environ.get("LOGP_ALL_CONFIGS"):
        runs += [
            ("bf16_sample/bf16_train_concat_bs%d" % BATCH, unet_bf16,
             params_f32, traj_bf16, BATCH, True),
            ("bf16_sample/bf16_train_twoapply_bs%d" % TRAIN_BS, unet_bf16,
             params_f32, traj_bf16, TRAIN_BS, False),
        ]
    for name, model, p, traj, bs, concat in runs:
        traj_dev = {k: jnp.asarray(v) for k, v in traj.items()
                    if k in ("latents", "next_latents", "ts", "log_probs")}
        recompute = jax.jit(functools.partial(
            recompute_logp, model, scheduler, sched_state,
            train_bs=bs, cfg_concat=concat,
        ))
        logp = recompute(p, traj_dev, context, uncond)
        logp = np.asarray(jax.device_get(logp))
        results.append(stats(name, logp, traj["log_probs"]))

    with open("bench_logp_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("[ bench_logp ] wrote bench_logp_results.json")


if __name__ == "__main__":
    main()
