"""Masked fixed-shape volume-rendering integration.

Replaces NeRFAcc's ragged segment ops (render_weight_from_density /
accumulate_along_rays, reference morpheus.py:675-685) with dense (N, K) masked
cumulative products — pure VPU work that XLA fuses with the field MLP epilogue.
"""
from __future__ import annotations

import jax
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


# ---- flat (compacted) segment formulation ----------------------------------
#
# With global sample-budget compaction (ops/occupancy.compact_samples) the
# sample stream is a flat (B,) array sorted by ray id. Rendering then needs
# per-ray prefix sums; on TPU those are one cumsum over B plus boundary
# gathers at the N+1 segment starts — no scatter, no ragged shapes. This is
# the closest TPU analogue of NeRFAcc's CUDA segment ops
# (render_weight_from_density / accumulate_along_rays, morpheus.py:675-685).


def segment_starts(ray_id: jnp.ndarray, num_rays: int) -> jnp.ndarray:
    """(N+1,) boundaries of each ray's contiguous slice in the sorted flat
    stream; ray r owns [starts[r], starts[r+1])."""
    return jnp.searchsorted(ray_id, jnp.arange(num_rays + 1,
                                               dtype=ray_id.dtype))


def _new_segment_flags(ray_id: jnp.ndarray) -> jnp.ndarray:
    """(B,) bool: True where a new ray's segment begins."""
    return jnp.concatenate([jnp.ones((1,), bool), ray_id[1:] != ray_id[:-1]])


def seg_cumsum(x: jnp.ndarray, new_seg: jnp.ndarray) -> jnp.ndarray:
    """Inclusive per-segment cumulative sum along axis 0 (segmented scan —
    per-ray sums stay exact instead of accumulating a global f32 prefix
    across thousands of rays). x: (B,) or (B, C); new_seg: (B,) bool."""
    flags = new_seg
    if x.ndim > 1:
        flags = new_seg[:, None]

    def op(a, b):
        fa, va = a
        fb, vb = b
        f = fa | fb
        return f, jnp.where(fb, vb, va + vb)

    _, out = jax.lax.associative_scan(
        op, (jnp.broadcast_to(flags, x.shape), x))
    return out


def flat_render_weights(t_starts, t_ends, sigmas, valid, ray_id):
    """Per-sample rendering weights on a flat ray-sorted stream.

    t_starts/t_ends/sigmas/valid: (B,); ray_id: (B,) nondecreasing int.
    Invalid samples carry zero optical depth.
    Returns (weights (B,), trans (B,), alphas (B,)).
    """
    dt = t_ends - t_starts
    tau = jnp.where(valid, sigmas * dt, 0.0)
    cum = seg_cumsum(tau, _new_segment_flags(ray_id))
    trans = jnp.exp(-(cum - tau))              # exclusive per-ray prefix
    alphas = -jnp.expm1(-tau)
    weights = jnp.where(valid, alphas * trans, 0.0)
    return weights, trans, alphas


def flat_accumulate(weights, values, ray_id, starts):
    """Per-ray Σ w_i v_i over a flat ray-sorted stream: segmented inclusive
    scan + gather at each segment's last element. weights (B,), values (B, C)
    or None, starts (N+1,). Returns (N, C) (or (N, 1) when values is None)."""
    x = weights[:, None] if values is None else weights[:, None] * values
    return flat_segment_sum(x, ray_id, starts)


def flat_segment_sum(x, ray_id, starts):
    """Exact per-ray sums of x (B,) or (B, C) → (N,) or (N, C)."""
    cs = seg_cumsum(x, _new_segment_flags(ray_id))
    last = jnp.maximum(starts[1:] - 1, 0)                        # (N,)
    nonempty = starts[1:] > starts[:-1]
    if x.ndim > 1:
        nonempty = nonempty[:, None]
    return jnp.where(nonempty, jnp.take(cs, last, axis=0), 0.0)
