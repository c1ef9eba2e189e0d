"""Functional DDIM / DDPM schedulers with differentiable step log-probs.

This is the algorithmic core of DDPO: the DDIM reverse-process step doubles as
a Gaussian policy. Calling ``step`` with an RNG key samples ``x_{t-1}`` and
returns the log-density of the sample; calling it with a stored ``prev_sample``
just scores that transition under the current model, with gradients flowing
through the mean (the sample itself is treated as a constant action).

Behavioral parity (checked by tests against closed forms):
  - reference DDIM step + log-prob: /root/reference/ddpo/diffusers_patch/
    scheduling_ddim_flax.py:229-361 (sigma clipped at 1e-6, stop-gradient on
    the sample, log-prob averaged over all non-batch dims)
  - timestep grid: scheduling_ddim_flax.py:189-211 (stride =
    num_train_timesteps // num_inference_steps, descending, + steps_offset)
  - forward noising for RWR: diffusers' add_noise_common, used at
    /root/reference/ddpo/training/diffusion.py:39-44

Design differences from the reference (TPU-first):
  - pure functions over a small immutable state pytree; no ConfigMixin class
    machinery. Everything is jit/scan/vmap friendly and dtype-explicit.
  - ``step`` accepts scalar *or* per-sample batched timesteps, so the PPO
    trainer can score shuffled (latent, t, next_latent) triples in one call.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Noise schedule. Defaults are Stable Diffusion v1.x (scaled_linear).

    Mirrors the schedules accepted by the reference scheduler config
    (scheduling_ddim_flax.py:117-128 via diffusers CommonSchedulerState).
    """
    if beta_schedule == "linear":
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=dtype)
    elif beta_schedule == "scaled_linear":
        betas = (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=dtype
            )
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        # cosine schedule (Nichol & Dhariwal 2021)
        t = jnp.arange(num_train_timesteps, dtype=dtype)

        def alpha_bar(x):
            return jnp.cos((x + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = jnp.minimum(
            1.0 - alpha_bar((t + 1) / num_train_timesteps) / alpha_bar(t / num_train_timesteps),
            0.999,
        ).astype(dtype)
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")
    return betas


def _left_broadcast(x: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Broadcast ``x`` against ``shape`` by appending singleton dims.

    E.g. (B,) against (B, C, H, W) -> (B, 1, 1, 1). Scalars pass through.
    """
    assert x.ndim <= len(shape)
    return x.reshape(x.shape + (1,) * (len(shape) - x.ndim))


@flax.struct.dataclass
class DDIMState:
    """Immutable scheduler state.

    alphas_cumprod: (num_train_timesteps,) cumulative product of (1 - beta).
    final_alpha_cumprod: alpha-bar used when the previous timestep is < 0.
    timesteps: descending inference-time timestep grid (set by set_timesteps).
    num_inference_steps: static python int once set_timesteps has run.
    """

    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    init_noise_sigma: jnp.ndarray
    timesteps: jnp.ndarray
    num_inference_steps: Optional[int] = flax.struct.field(
        pytree_node=False, default=None
    )


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """DDIM reverse process with per-step Gaussian log-probs.

    Static configuration object; all state lives in DDIMState. Stable
    Diffusion v1.4 uses num_train_timesteps=1000, scaled_linear betas in
    [0.00085, 0.012], set_alpha_to_one=False, steps_offset=1,
    prediction_type="epsilon".
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    prediction_type: str = "epsilon"
    dtype: jnp.dtype = jnp.float32

    def create_state(self) -> DDIMState:
        betas = make_betas(
            self.num_train_timesteps,
            self.beta_start,
            self.beta_end,
            self.beta_schedule,
            self.dtype,
        )
        alphas_cumprod = jnp.cumprod(1.0 - betas, axis=0)
        final_alpha_cumprod = (
            jnp.array(1.0, dtype=self.dtype)
            if self.set_alpha_to_one
            else alphas_cumprod[0]
        )
        timesteps = jnp.arange(self.num_train_timesteps)[::-1]
        return DDIMState(
            alphas_cumprod=alphas_cumprod,
            final_alpha_cumprod=final_alpha_cumprod,
            init_noise_sigma=jnp.array(1.0, dtype=self.dtype),
            timesteps=timesteps,
        )

    def set_timesteps(self, state: DDIMState, num_inference_steps: int) -> DDIMState:
        """Descending stride grid (scheduling_ddim_flax.py:189-211)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        timesteps = (
            (jnp.arange(0, num_inference_steps) * step_ratio).round()[::-1]
            + self.steps_offset
        )
        return state.replace(
            num_inference_steps=num_inference_steps,
            timesteps=timesteps.astype(jnp.int32),
        )

    def _alpha_pair(self, state: DDIMState, timestep, prev_timestep):
        alpha_prod_t = state.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            state.alphas_cumprod[jnp.clip(prev_timestep, 0)],
            state.final_alpha_cumprod,
        )
        return alpha_prod_t, alpha_prod_t_prev

    def variance(self, state: DDIMState, timestep, prev_timestep) -> jnp.ndarray:
        """sigma_t^2(eta=1): (1-a_prev)/(1-a_t) * (1 - a_t/a_prev).

        scheduling_ddim_flax.py:213-227.
        """
        alpha_prod_t, alpha_prod_t_prev = self._alpha_pair(
            state, timestep, prev_timestep
        )
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_t_prev = 1.0 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)

    def step_mean_std(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        timestep: jnp.ndarray,
        sample: jnp.ndarray,
        eta: float,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior mean and std of x_{t-1} given (x_t, model_output).

        DDIM paper eq. (12); scheduling_ddim_flax.py:278-337. ``timestep`` may
        be a scalar or a (B,)-shaped array of per-sample timesteps.
        """
        if state.num_inference_steps is None:
            raise ValueError("call set_timesteps before step")
        prev_timestep = timestep - self.num_train_timesteps // state.num_inference_steps

        alpha_prod_t, alpha_prod_t_prev = self._alpha_pair(
            state, timestep, prev_timestep
        )
        beta_prod_t = 1.0 - alpha_prod_t

        alpha_prod_t = _left_broadcast(alpha_prod_t, sample.shape)
        alpha_prod_t_prev = _left_broadcast(alpha_prod_t_prev, sample.shape)
        beta_prod_t = _left_broadcast(beta_prod_t, sample.shape)

        if self.prediction_type == "epsilon":
            pred_original = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
            pred_epsilon = model_output
        elif self.prediction_type == "sample":
            pred_original = model_output
            pred_epsilon = (sample - alpha_prod_t**0.5 * pred_original) / beta_prod_t**0.5
        elif self.prediction_type == "v_prediction":
            pred_original = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
            pred_epsilon = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
        else:
            raise ValueError(f"unknown prediction_type: {self.prediction_type}")

        var = self.variance(state, timestep, prev_timestep)
        std_dev_t = eta * var**0.5
        std_dev_t = _left_broadcast(std_dev_t, sample.shape)

        direction = (1.0 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * pred_epsilon
        mean = alpha_prod_t_prev**0.5 * pred_original + direction
        return mean, std_dev_t

    def step(
        self,
        state: DDIMState,
        model_output: jnp.ndarray,
        timestep: jnp.ndarray,
        sample: jnp.ndarray,
        key: Optional[jax.Array] = None,
        prev_sample: Optional[jnp.ndarray] = None,
        eta: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One reverse step, returning ``(prev_sample, log_prob)``.

        Two modes (exactly one of ``key`` / ``prev_sample`` may be given;
        scheduling_ddim_flax.py:340-361):
          - sample mode (key given): draws x_{t-1} = mean + sigma * z.
          - score mode (prev_sample given): returns the stored sample
            unchanged and its log-prob under the current-parameter Gaussian.

        log_prob is the Gaussian log-density with sigma clipped at 1e-6,
        averaged over all non-batch dims, with stop-gradient on the sample so
        that policy gradients flow through the mean only.
        """
        if key is not None and prev_sample is not None:
            raise ValueError("pass either key or prev_sample, not both")

        mean, std = self.step_mean_std(state, model_output, timestep, sample, eta)

        if prev_sample is None:
            if key is None:
                prev_sample = mean
            else:
                prev_sample = mean + std * jax.random.normal(
                    key, sample.shape, dtype=mean.dtype
                )

        std = jnp.clip(std, 1e-6)
        log_prob = (
            -((jax.lax.stop_gradient(prev_sample) - mean) ** 2) / (2.0 * std**2)
            - jnp.log(std)
            - _LOG_SQRT_2PI
        )
        log_prob = jnp.mean(log_prob, axis=tuple(range(1, log_prob.ndim)))
        return prev_sample, log_prob

    def add_noise(
        self,
        state: DDIMState,
        original_samples: jnp.ndarray,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
    ) -> jnp.ndarray:
        """Forward process q(x_t | x_0) (diffusers add_noise_common)."""
        sqrt_alpha = _left_broadcast(
            state.alphas_cumprod[timesteps] ** 0.5, original_samples.shape
        )
        sqrt_one_minus = _left_broadcast(
            (1.0 - state.alphas_cumprod[timesteps]) ** 0.5, original_samples.shape
        )
        return sqrt_alpha * original_samples + sqrt_one_minus * noise

    def get_velocity(
        self,
        state: DDIMState,
        sample: jnp.ndarray,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
    ) -> jnp.ndarray:
        sqrt_alpha = _left_broadcast(
            state.alphas_cumprod[timesteps] ** 0.5, sample.shape
        )
        sqrt_one_minus = _left_broadcast(
            (1.0 - state.alphas_cumprod[timesteps]) ** 0.5, sample.shape
        )
        return sqrt_alpha * noise - sqrt_one_minus * sample


@flax.struct.dataclass
class DPMSolverState:
    """Immutable DPM-Solver++ state.

    Boundary arrays have ``num_inference_steps + 1`` entries: index ``i`` is
    the noise level the i-th model call starts from; the final entry is the
    t=0 target level. ``timesteps`` (length T) is the descending model-call
    grid in train-timestep units.
    """

    alphas_cumprod: jnp.ndarray
    timesteps: jnp.ndarray
    lambdas: jnp.ndarray  # log(alpha/sigma) per boundary, ascending
    alphas: jnp.ndarray  # sqrt(alpha_bar) per boundary
    sigmas: jnp.ndarray  # sqrt(1 - alpha_bar) per boundary
    init_noise_sigma: jnp.ndarray
    num_inference_steps: Optional[int] = flax.struct.field(
        pytree_node=False, default=None
    )


@dataclasses.dataclass(frozen=True)
class DPMSolverPlusPlus:
    """DPM-Solver++(2M): deterministic second-order multistep ODE sampler.

    Lu et al. 2022 (arXiv:2211.01095), data-prediction multistep variant —
    the standard few-step *inference* sampler for latent diffusion (~20
    steps match 50-step DDIM quality). This is an inference-only capability
    beyond the reference (which samples exclusively with 50-step stochastic
    DDIM, scheduling_ddim_flax.py): DDPO *training* needs the DDIM
    Gaussian-policy log-probs and keeps DDIMScheduler; generation/eval
    drivers can cut model calls ~2.5x with this solver.

    Functional API mirrors DDIMScheduler (create_state / set_timesteps /
    step) but ``step`` is multistep: it takes the *step index* into the
    inference grid plus the previous step's x0 estimate, and returns the
    new sample together with this step's x0 estimate for the caller's scan
    carry. First step — and, following standard practice for short grids,
    the final step when num_inference_steps < 15 — falls back to first
    order (which equals eta=0 DDIM in x0 form).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    grid: str = "karras"  # or "linspace"
    karras_rho: float = 7.0
    dtype: jnp.dtype = jnp.float32

    def create_state(self) -> DPMSolverState:
        betas = make_betas(
            self.num_train_timesteps,
            self.beta_start,
            self.beta_end,
            self.beta_schedule,
            self.dtype,
        )
        alphas_cumprod = jnp.cumprod(1.0 - betas, axis=0)
        timesteps = jnp.arange(self.num_train_timesteps)[::-1]
        empty = jnp.zeros((0,), self.dtype)
        return DPMSolverState(
            alphas_cumprod=alphas_cumprod,
            timesteps=timesteps,
            lambdas=empty,
            alphas=empty,
            sigmas=empty,
            init_noise_sigma=jnp.array(1.0, dtype=self.dtype),
        )

    def set_timesteps(
        self, state: DPMSolverState, num_inference_steps: int
    ) -> DPMSolverState:
        """Build the inference grid; both variants start at t = T-1.

        grid="karras" (default): boundaries geometric-ish in noise-to-signal
        sigma (Karras et al. 2022, rho=7), which concentrates steps at low
        noise where the x0-prediction still changes fastest. On the Gaussian
        analytic toy (tests/test_dpm.py) 8 Karras steps beat 32 uniform-t
        DDIM steps by ~7x in endpoint error — uniform-t grids under-resolve
        the final log-SNR stretch, which is exactly the few-step regime this
        solver exists for. Model calls use the nearest integer train
        timestep per boundary.

        grid="linspace": evenly-spaced timesteps over [0, T-1] (the common
        multistep-solver default elsewhere), kept for comparison.
        """
        n = num_inference_steps
        if self.grid == "linspace":
            grid = (
                jnp.linspace(0.0, self.num_train_timesteps - 1, n + 1)
                .round()
                .astype(jnp.int32)[::-1]
            )  # (n+1,) descending, grid[-1] == 0
            ac = state.alphas_cumprod[grid]
            alphas = ac**0.5
            sigmas = (1.0 - ac) ** 0.5
            lambdas = jnp.log(alphas) - jnp.log(sigmas)
            timesteps = grid[:-1]
        elif self.grid == "karras":
            rho = self.karras_rho
            sig_kd = ((1.0 - state.alphas_cumprod) / state.alphas_cumprod) ** 0.5
            smax, smin = sig_kd[-1], sig_kd[0]
            ramp = jnp.linspace(0.0, 1.0, n + 1)
            s = (
                smax ** (1.0 / rho) + ramp * (smin ** (1.0 / rho) - smax ** (1.0 / rho))
            ) ** rho  # (n+1,) descending noise-to-signal ratios
            alphas = 1.0 / (1.0 + s**2) ** 0.5
            sigmas = s * alphas
            lambdas = -jnp.log(s)
            # nearest train timestep per model-call boundary (sig_kd is
            # strictly increasing in t)
            idx = jnp.clip(
                jnp.searchsorted(sig_kd, s[:-1]), 1, self.num_train_timesteps - 1
            )
            pick_lo = (s[:-1] - sig_kd[idx - 1]) < (sig_kd[idx] - s[:-1])
            timesteps = jnp.where(pick_lo, idx - 1, idx).astype(jnp.int32)
        else:
            raise ValueError(f"unknown grid {self.grid!r} (karras|linspace)")
        return state.replace(
            timesteps=timesteps,
            lambdas=lambdas.astype(self.dtype),
            alphas=alphas.astype(self.dtype),
            sigmas=sigmas.astype(self.dtype),
            num_inference_steps=n,
        )

    def _pred_x0(self, eps_or_other, sample, alpha, sigma):
        if self.prediction_type == "epsilon":
            return (sample - sigma * eps_or_other) / alpha
        if self.prediction_type == "sample":
            return eps_or_other
        if self.prediction_type == "v_prediction":
            return alpha * sample - sigma * eps_or_other
        raise ValueError(f"unknown prediction_type: {self.prediction_type}")

    def step(
        self,
        state: DPMSolverState,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        prev_x0: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One solver step: ``(new_sample, x0_estimate)``.

        ``step_index`` is a (traced) index into the inference grid —
        scan-friendly, unlike timestep-keyed lookups. ``prev_x0`` is the x0
        estimate returned by the previous call (any value at step 0; ignored
        there).
        """
        if state.num_inference_steps is None:
            raise ValueError("call set_timesteps before step")
        i = step_index
        alpha_i = state.alphas[i]
        sigma_i = state.sigmas[i]
        x0 = self._pred_x0(model_output, sample, alpha_i, sigma_i)

        lam_i = state.lambdas[i]
        lam_next = state.lambdas[i + 1]
        lam_prev = state.lambdas[jnp.maximum(i - 1, 0)]
        h = lam_next - lam_i
        h_prev = lam_i - lam_prev
        r = jnp.where(h_prev == 0.0, 1.0, h_prev / h)

        ratio = state.sigmas[i + 1] / sigma_i
        phi = jnp.expm1(-h)  # exp(-h) - 1 < 0
        first = ratio * sample - state.alphas[i + 1] * phi * x0
        # 2M midpoint correction: D1 = (x0 - prev_x0) / r
        second = ratio * sample - state.alphas[i + 1] * phi * (
            x0 + 0.5 * (x0 - prev_x0) / r
        )

        use_first = i == 0
        if state.num_inference_steps < 15:
            use_first = use_first | (i == state.num_inference_steps - 1)
        return jnp.where(use_first, first, second), x0


@dataclasses.dataclass(frozen=True)
class DDPMScheduler:
    """Forward-noising schedule for RWR supervised finetuning.

    Only the pieces the finetune trainer needs (pipeline/finetune.py:117-124):
    create_state + add_noise. Shares DDIMState so both trainers use one pytree
    type.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    dtype: jnp.dtype = jnp.float32

    def create_state(self) -> DDIMState:
        return DDIMScheduler(
            num_train_timesteps=self.num_train_timesteps,
            beta_start=self.beta_start,
            beta_end=self.beta_end,
            beta_schedule=self.beta_schedule,
            dtype=self.dtype,
        ).create_state()

    def add_noise(self, state, original_samples, noise, timesteps):
        return DDIMScheduler(
            num_train_timesteps=self.num_train_timesteps,
            beta_start=self.beta_start,
            beta_end=self.beta_end,
            beta_schedule=self.beta_schedule,
            dtype=self.dtype,
        ).add_noise(state, original_samples, noise, timesteps)
