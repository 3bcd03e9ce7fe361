"""SDF → density transforms (reference: models/density.py, models/model.py:16-29)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

BETA_MIN = 1e-4


def laplace_beta(beta_param: jnp.ndarray) -> jnp.ndarray:
    """Effective beta = |beta| + beta_min (models/density.py:29-31)."""
    return jnp.abs(beta_param) + BETA_MIN


def laplace_density(sdf: jnp.ndarray, beta_param: jnp.ndarray) -> jnp.ndarray:
    """VolSDF Laplace CDF density: alpha * Laplace(0, beta).cdf(-sdf)
    (models/density.py:22-27)."""
    beta = laplace_beta(beta_param)
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with gradient clamped at x=15 (models/model.py:16-29)."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(x)
    return y, dx * jnp.exp(jnp.clip(x, None, 15.0))


def biased_softplus(x: jnp.ndarray, bias: float = 0.0) -> jnp.ndarray:
    return jax.nn.softplus(x + bias)
