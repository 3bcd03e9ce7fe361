"""Diffusion noise schedules + DDIM stepping (reference: diffusers
DDIMScheduler as configured in zero123_utils.py:75-87, and
ldm/models/diffusion/ddpm.py beta schedules).

Zero123 config: 1000 timesteps, scaled_linear betas in [0.00085, 0.012],
clip_sample=False, set_alpha_to_one=False, steps_offset=1.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012

    @property
    def betas(self) -> np.ndarray:
        # 'scaled_linear': linear in sqrt(beta)
        return np.linspace(self.linear_start ** 0.5, self.linear_end ** 0.5,
                           self.num_train_timesteps, dtype=np.float64) ** 2

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas)


def add_noise(schedule_ac: jnp.ndarray, x0: jnp.ndarray, noise: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(ac_t) x0 + sqrt(1-ac_t) eps (diffusers add_noise)."""
    ac = schedule_ac[t].reshape((-1,) + (1,) * (x0.ndim - 1))
    return jnp.sqrt(ac) * x0 + jnp.sqrt(1.0 - ac) * noise


def predict_start_from_noise(schedule_ac: jnp.ndarray, x_t: jnp.ndarray,
                             t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """x0 = (x_t - sqrt(1-ac) eps) / sqrt(ac) (ddpm.py predict_start_from_noise)."""
    ac = schedule_ac[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
    return (x_t - jnp.sqrt(1.0 - ac) * noise) / jnp.sqrt(ac)


def ddim_timesteps(num_train: int, num_steps: int,
                   steps_offset: int = 1) -> np.ndarray:
    """diffusers DDIMScheduler.set_timesteps (leading spacing + offset)."""
    step_ratio = num_train // num_steps
    ts = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.int64)
    return ts + steps_offset


def ddim_step(schedule_ac: jnp.ndarray, model_out: jnp.ndarray,
              t: int, t_prev: int, sample: jnp.ndarray, key=None,
              eta: float = 0.0, set_alpha_to_one: bool = False) -> jnp.ndarray:
    """One DDIM update x_t -> x_{t_prev} (diffusers DDIMScheduler.step with
    clip_sample=False)."""
    ac_t = schedule_ac[t]
    ac_prev = jnp.where(t_prev >= 0, schedule_ac[jnp.maximum(t_prev, 0)],
                        1.0 if set_alpha_to_one else schedule_ac[0])
    x0 = (sample - jnp.sqrt(1.0 - ac_t) * model_out) / jnp.sqrt(ac_t)
    sigma = eta * jnp.sqrt((1 - ac_prev) / (1 - ac_t)) \
        * jnp.sqrt(1 - ac_t / ac_prev)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - ac_prev - sigma ** 2, 0.0, None)) \
        * model_out
    prev = jnp.sqrt(ac_prev) * x0 + dir_xt
    if eta > 0 and key is not None:
        prev = prev + sigma * jax.random.normal(key, sample.shape)
    return prev
