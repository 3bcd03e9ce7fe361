"""Masked fixed-shape volume-rendering integration.

Replaces NeRFAcc's ragged segment ops (render_weight_from_density /
accumulate_along_rays, reference morpheus.py:675-685) with dense (N, K) masked
cumulative products — pure VPU work that XLA fuses with the field MLP epilogue.
"""
from __future__ import annotations

import jax.numpy as jnp


def render_weights(t_starts: jnp.ndarray, t_ends: jnp.ndarray,
                   sigmas: jnp.ndarray, mask: jnp.ndarray):
    """Per-sample rendering weights.

    alpha_i = 1 - exp(-sigma_i dt_i); T_i = exp(-sum_{j<i} sigma_j dt_j);
    w_i = alpha_i T_i. Invalid samples contribute zero optical depth.
    Returns (weights (N,K), transmittance (N,K), alphas (N,K)).
    """
    dt = t_ends - t_starts
    tau = jnp.where(mask, sigmas * dt, 0.0)
    tau_shift = jnp.concatenate(
        [jnp.zeros_like(tau[..., :1]), jnp.cumsum(tau, axis=-1)[..., :-1]], -1)
    trans = jnp.exp(-tau_shift)
    alphas = -jnp.expm1(-tau)
    weights = jnp.where(mask, alphas * trans, 0.0)
    return weights, trans, alphas


def accumulate(weights: jnp.ndarray, values: jnp.ndarray | None = None):
    """Σ_i w_i v_i along the sample axis (NeRFAcc accumulate_along_rays)."""
    if values is None:
        return jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.sum(weights[..., None] * values, axis=-2)
