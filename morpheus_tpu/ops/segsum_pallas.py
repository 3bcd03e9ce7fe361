"""Sorted segment-sum as a Pallas TPU kernel.

The hash-grid embedding-gradient accumulation (the transpose of the encode
gather — the role of the reference's CUDA atomics, gridencoder.cu:253-353) is
the measured per-step bottleneck: XLA scatter-add runs at ~58M rows/s on v5e
regardless of sortedness. This kernel exploits a *sorted* update stream: a
block of consecutive sorted indices spans only a few 128-slot windows, so each
window's partial histogram is one VPU compare (one-hot) + one small matmul and
one aligned 128-wide accumulate — no random access at all. The sort itself is
a fused multi-operand lax.sort (~73 ms for 16.8M keys + 2 payloads on v5e).

segment_sum_sorted(sorted_idx (N,), vals: C arrays (N,), size) -> (C, size)
float32, exact (f32 one-hot matmul). Channel-flat layout throughout so nothing
hits the narrow-lane (N, 2) tile-padding trap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048
WIN = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(idx_ref, *refs, n_chan: int, t_pad: int):
    val_refs = refs[:n_chan]
    out_ref = refs[n_chan]          # (n_chan * t_pad // WIN, WIN)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                                  # (BLK,) int32, sorted
    vals = jnp.stack([r[:] for r in val_refs], 0)     # (C, BLK) f32
    w0 = idx_ref[0] // WIN
    w1 = idx_ref[BLK - 1] // WIN
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
    col = idx.reshape(BLK, 1)

    def body(w, _):
        base = w * WIN
        onehot = (col - base == lanes).astype(jnp.float32)         # (BLK, WIN)
        # (C, BLK) @ (BLK, WIN) -> (C, WIN) partial histogram. HIGHEST forces
        # true-f32 MXU passes: with a 0/1 one-hot operand the products are
        # exact, so the result matches a scatter-add bit-for-bit up to
        # f32-summation order
        contrib = jax.lax.dot_general(
            vals, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        for c in range(n_chan):
            row = (c * t_pad) // WIN + w
            out_ref[row, :] += contrib[c, :]
        return 0

    jax.lax.fori_loop(w0, w1 + 1, body, 0)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def segment_sum_sorted(sorted_idx: jnp.ndarray, sorted_vals: tuple,
                       size: int, interpret: bool = False) -> jnp.ndarray:
    """Σ vals[c][i] into out[c, sorted_idx[i]]; sorted_idx must be
    nondecreasing (pair it with lax.sort((idx, *vals), num_keys=1))."""
    N = sorted_idx.shape[0]
    n_chan = len(sorted_vals)
    t_pad = _round_up(max(size, WIN), WIN)

    n_pad = _round_up(N, BLK)
    pad = n_pad - N
    idx = sorted_idx.astype(jnp.int32)
    cols = [v.astype(jnp.float32) for v in sorted_vals]
    if pad:
        # padding slots point at the last (valid) slot with zero values, so
        # they keep the stream sorted and add nothing
        idx = jnp.concatenate([idx, jnp.full((pad,), t_pad - 1, jnp.int32)])
        cols = [jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
                for v in cols]

    out = pl.pallas_call(
        functools.partial(_kernel, n_chan=n_chan, t_pad=t_pad),
        grid=(n_pad // BLK,),
        in_specs=[pl.BlockSpec((BLK,), lambda b: (b,),
                               memory_space=pltpu.VMEM)] * (1 + n_chan),
        out_specs=pl.BlockSpec((n_chan * t_pad // WIN, WIN), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chan * t_pad // WIN, WIN),
                                       jnp.float32),
        interpret=interpret,
    )(idx, *cols)

    return out.reshape(n_chan, t_pad)[:, :size]


def segment_sum_unsorted(idx: jnp.ndarray, vals: tuple, size: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Sort + kernel in one call: Σ vals[c][i] into out[c, idx[i]]."""
    ops = jax.lax.sort((idx.astype(jnp.int32),)
                       + tuple(v.astype(jnp.float32) for v in vals),
                       num_keys=1)
    return segment_sum_sorted(ops[0], ops[1:], size, interpret=interpret)
