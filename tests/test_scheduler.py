"""Golden tests for the DDIM scheduler core (the DDPO policy density).

The reference has no tests; these pin the math to closed forms:
analytic Gaussian log-density, DDIM paper eq. (12), and the forward process.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpo_tpu.core import DDIMScheduler, DDPMScheduler


def sd_scheduler(**kw):
    # Stable Diffusion v1.4 configuration.
    return DDIMScheduler(
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
        beta_schedule="scaled_linear",
        set_alpha_to_one=False,
        steps_offset=1,
        prediction_type="epsilon",
        **kw,
    )


def test_betas_scaled_linear():
    sched = sd_scheduler()
    state = sched.create_state()
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    np.testing.assert_allclose(
        np.asarray(state.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
    )
    # set_alpha_to_one=False -> final alpha is alphas_cumprod[0]
    np.testing.assert_allclose(
        float(state.final_alpha_cumprod), float(state.alphas_cumprod[0]), rtol=1e-6
    )


def test_set_timesteps_grid():
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    ts = np.asarray(state.timesteps)
    # stride 20, descending, +1 offset: 981, 961, ..., 1
    assert ts.shape == (50,)
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)


def test_step_mean_matches_closed_form():
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = 981
    mean, std = sched.step_mean_std(state, eps, jnp.array(t), x, eta=1.0)

    ac = np.asarray(state.alphas_cumprod)
    a_t, a_prev = ac[t], ac[t - 20]
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    sigma = math.sqrt(var)
    x0 = (np.asarray(x) - math.sqrt(1 - a_t) * np.asarray(eps)) / math.sqrt(a_t)
    direction = math.sqrt(1 - a_prev - var) * np.asarray(eps)
    expected = math.sqrt(a_prev) * x0 + direction

    np.testing.assert_allclose(np.asarray(mean), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), sigma, rtol=1e-5)


def test_log_prob_matches_analytic_gaussian():
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 8, 8))
    prev = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 8, 8))
    t = jnp.array([981, 501, 21])

    mean, std = sched.step_mean_std(state, eps, t, x, eta=1.0)
    _, log_prob = sched.step(state, eps, t, x, prev_sample=prev, eta=1.0)

    mean, std, prev_np = map(np.asarray, (mean, std, prev))
    expected = (
        -((prev_np - mean) ** 2) / (2 * std**2)
        - np.log(std)
        - 0.5 * np.log(2 * np.pi)
    ).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(log_prob), expected, rtol=1e-4, atol=1e-5)


def test_score_mode_matches_sample_mode():
    """Re-scoring a sampled transition must reproduce the sampling log-prob.

    This is the invariant the PPO trainer relies on: ratio == 1 at the
    sampling parameters (training/policy_gradient.py:110-123 in the ref).
    """
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))

    prev, lp_sample = sched.step(
        state, eps, jnp.array(981), x, key=jax.random.PRNGKey(7), eta=1.0
    )
    _, lp_score = sched.step(
        state, eps, jnp.array(981), x, prev_sample=prev, eta=1.0
    )
    np.testing.assert_allclose(
        np.asarray(lp_sample), np.asarray(lp_score), rtol=1e-5
    )


def test_eta_zero_sigma_clipped():
    """eta=0 => sigma=0 => log-prob uses the 1e-6 clip (numerical trap)."""
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jnp.ones((1, 4, 4, 4))
    eps = jnp.zeros((1, 4, 4, 4))
    prev, lp = sched.step(state, eps, jnp.array(981), x, key=jax.random.PRNGKey(0), eta=0.0)
    mean, _ = sched.step_mean_std(state, eps, jnp.array(981), x, eta=0.0)
    # deterministic step
    np.testing.assert_allclose(np.asarray(prev), np.asarray(mean), rtol=1e-6)
    assert np.isfinite(np.asarray(lp)).all()
    # exact sample at the mean: log N(mean | mean, 1e-6)
    expected = -np.log(1e-6) - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)


def test_final_step_uses_final_alpha():
    """t=1 (last grid point): prev_timestep=-19 < 0 -> final_alpha_cumprod."""
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    mean, std = sched.step_mean_std(state, eps, jnp.array(1), x, eta=1.0)

    ac = np.asarray(state.alphas_cumprod)
    a_t, a_prev = ac[1], ac[0]  # final_alpha_cumprod == alphas_cumprod[0]
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    x0 = (np.asarray(x) - math.sqrt(1 - a_t) * np.asarray(eps)) / math.sqrt(a_t)
    expected = math.sqrt(a_prev) * x0 + math.sqrt(1 - a_prev - var) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(mean), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(std[0, 0, 0, 0]), math.sqrt(var), rtol=1e-4)


def test_batched_timesteps_match_scalar():
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 8, 8))
    ts = jnp.array([981, 481, 101])

    mean_b, std_b = sched.step_mean_std(state, eps, ts, x, eta=1.0)
    for i, t in enumerate([981, 481, 101]):
        mean_s, std_s = sched.step_mean_std(
            state, eps[i : i + 1], jnp.array(t), x[i : i + 1], eta=1.0
        )
        np.testing.assert_allclose(
            np.asarray(mean_b[i]), np.asarray(mean_s[0]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(std_b[i]), np.asarray(std_s[0]), rtol=1e-5
        )


def test_add_noise_forward_process():
    sched = DDPMScheduler()
    state = sched.create_state()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    ts = jnp.array([0, 999])
    noisy = sched.add_noise(state, x0, noise, ts)
    ac = np.asarray(state.alphas_cumprod)
    for i, t in enumerate([0, 999]):
        expected = math.sqrt(ac[t]) * np.asarray(x0[i]) + math.sqrt(
            1 - ac[t]
        ) * np.asarray(noise[i])
        np.testing.assert_allclose(np.asarray(noisy[i]), expected, rtol=1e-4, atol=1e-6)


def test_step_rejects_key_and_prev_sample():
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jnp.ones((1, 4, 4, 4))
    with pytest.raises(ValueError):
        sched.step(
            state, x, jnp.array(981), x, key=jax.random.PRNGKey(0), prev_sample=x
        )


def test_grad_flows_through_mean_not_sample():
    sched = sd_scheduler()
    state = sched.set_timesteps(sched.create_state(), 50)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    prev = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))

    def f(eps):
        _, lp = sched.step(state, eps, jnp.array(981), x, prev_sample=prev, eta=1.0)
        return lp.sum()

    g = jax.grad(f)(jnp.zeros((1, 4, 4, 4)))
    assert np.abs(np.asarray(g)).sum() > 0  # grads flow through the mean

    def f_sample(eps):
        s, lp = sched.step(
            state, eps, jnp.array(981), x, key=jax.random.PRNGKey(1), eta=1.0
        )
        return lp.sum()

    # in sample mode the drawn action is stop-gradiented: d(lp)/d(eps) through
    # prev_sample is cut, only the mean path remains -> finite, nonzero
    g2 = jax.grad(f_sample)(jnp.zeros((1, 4, 4, 4)))
    assert np.isfinite(np.asarray(g2)).all()
