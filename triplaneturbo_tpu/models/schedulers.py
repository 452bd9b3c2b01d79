"""Pure-JAX diffusion schedulers (DDPM / DDIM).

Functional rebuilds of the diffusers schedulers the reference relies on
(/root/reference/triplaneturbo_executable/pipelines/triplaneturbo_text_to_3d.py:146-153,
custom/triplaneturbo/systems/multiprompt_dual_renderer_multistep_generator.py:121-151):
all state is precomputed arrays in a NamedTuple, steps are jittable functions
(the whole 4-step sampler traces into one XLA graph).

Default hyperparameters = Stable Diffusion 2.1-base scheduler config:
scaled_linear betas in [0.00085, 0.012], T=1000, epsilon prediction,
leading timestep spacing with steps_offset=1, set_alpha_to_one=False.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction" | "sample"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    timestep_spacing: str = "leading"


class Schedule(NamedTuple):
    """Precomputed β-schedule buffers (the reference teachers keep the same
    buffers, extern/mvdream/ldm/interface.py:20-90)."""

    betas: jax.Array  # [T]
    alphas_cumprod: jax.Array  # [T]
    final_alpha_cumprod: jax.Array  # []
    config: SchedulerConfig


def make_schedule(config: SchedulerConfig = SchedulerConfig()) -> Schedule:
    T = config.num_train_timesteps
    if config.beta_schedule == "scaled_linear":
        betas = np.linspace(config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float64) ** 2
    elif config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float64)
    else:
        raise ValueError(f"Unknown beta schedule {config.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if config.set_alpha_to_one else alphas_cumprod[0]
    return Schedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, jnp.float32),
        config=config,
    )


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def add_noise(sched: Schedule, original: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """q(x_t | x_0): sqrt(ᾱ_t) x₀ + sqrt(1-ᾱ_t) ε (DDPM add_noise)."""
    a = sched.alphas_cumprod[t]
    a = a.reshape(a.shape + (1,) * (original.ndim - a.ndim))
    return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise


def velocity(sched: Schedule, sample: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """v-parameterization target: sqrt(ᾱ)ε − sqrt(1−ᾱ)x₀."""
    a = sched.alphas_cumprod[t]
    a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
    return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * sample


def pred_original(
    sched: Schedule, model_output: jax.Array, t: jax.Array, sample: jax.Array
) -> jax.Array:
    """Recover x̂₀ from the model output under the configured parameterization."""
    a = sched.alphas_cumprod[t]
    a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
    p = sched.config.prediction_type
    if p == "epsilon":
        return (sample - jnp.sqrt(1.0 - a) * model_output) / jnp.sqrt(a)
    if p == "v_prediction":
        return jnp.sqrt(a) * sample - jnp.sqrt(1.0 - a) * model_output
    if p == "sample":
        return model_output
    raise ValueError(f"Unknown prediction type {p}")


def pred_epsilon(
    sched: Schedule, model_output: jax.Array, t: jax.Array, sample: jax.Array
) -> jax.Array:
    a = sched.alphas_cumprod[t]
    a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
    p = sched.config.prediction_type
    if p == "epsilon":
        return model_output
    if p == "v_prediction":
        return jnp.sqrt(a) * model_output + jnp.sqrt(1.0 - a) * sample
    if p == "sample":
        return (sample - jnp.sqrt(a) * model_output) / jnp.sqrt(1.0 - a)
    raise ValueError(f"Unknown prediction type {p}")


# ---------------------------------------------------------------------------
# DDIM
# ---------------------------------------------------------------------------


def ddim_timesteps(
    sched: Schedule, num_inference_steps: int, shift_to_final: bool = True
) -> np.ndarray:
    """Inference timesteps, optionally shifted so sampling starts at T-1.

    The shift matches the reference's `_set_timesteps`
    (triplaneturbo_text_to_3d.py:334-353): diffusers 'leading' spacing with
    steps_offset leaves max(t) < T-1; TriplaneTurbo adds the delta so the
    first step denoises from pure noise.
    """
    cfg = sched.config
    T = cfg.num_train_timesteps
    ratio = T // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
    ts = ts + cfg.steps_offset
    if shift_to_final:
        ts = ts + (T - 1 - ts.max())
    return ts


class DDIMStepOutput(NamedTuple):
    prev_sample: jax.Array
    pred_original_sample: jax.Array


def ddim_step(
    sched: Schedule,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    num_inference_steps: int,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,
) -> DDIMStepOutput:
    """One deterministic DDIM update (η=0 default, like the reference)."""
    cfg = sched.config
    T = cfg.num_train_timesteps
    prev_t = t - T // num_inference_steps

    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(prev_t >= 0, sched.alphas_cumprod[jnp.maximum(prev_t, 0)], sched.final_alpha_cumprod)
    shape = (1,) * sample.ndim
    a_t = jnp.reshape(a_t, shape)
    a_prev = jnp.reshape(a_prev, shape)

    x0 = pred_original(sched, model_output, t, sample)
    eps = pred_epsilon(sched, model_output, t, sample)

    if eta > 0.0:
        if noise is None:
            # silently shrinking the direction term by sigma^2 without adding
            # the stochastic term would produce systematically under-dispersed
            # samples — require the noise the ancestral step needs
            raise ValueError("ddim_step with eta > 0 requires a noise array")
        var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
    else:
        sigma = 0.0
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
    prev = jnp.sqrt(a_prev) * x0 + dir_xt
    if eta > 0.0:
        prev = prev + sigma * noise
    return DDIMStepOutput(prev_sample=prev, pred_original_sample=x0)


# ---------------------------------------------------------------------------
# DDPM (ancestral) — used as the training-time noise scheduler
# ---------------------------------------------------------------------------


class DDPMStepOutput(NamedTuple):
    prev_sample: jax.Array
    pred_original_sample: jax.Array


def ddpm_step(
    sched: Schedule,
    model_output: jax.Array,
    t: jax.Array,
    sample: jax.Array,
    key: Optional[jax.Array] = None,
) -> DDPMStepOutput:
    a_t = sched.alphas_cumprod[t]
    a_prev = jnp.where(t > 0, sched.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = sched.betas[t]
    shape = (1,) * sample.ndim
    a_t, a_prev, beta_t = (jnp.reshape(v, shape) for v in (a_t, a_prev, beta_t))

    x0 = pred_original(sched, model_output, t, sample)
    # posterior mean coefficients (DDPM eq. 7)
    coef_x0 = jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)
    coef_xt = jnp.sqrt(1.0 - beta_t) * (1.0 - a_prev) / (1.0 - a_t)
    mean = coef_x0 * x0 + coef_xt * sample
    var = jnp.clip((1.0 - a_prev) / (1.0 - a_t) * beta_t, 1e-20)
    if key is not None:
        noise = jax.random.normal(key, sample.shape, sample.dtype)
        mean = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
    return DDPMStepOutput(prev_sample=mean, pred_original_sample=x0)
