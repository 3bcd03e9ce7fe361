"""Sorted segment-sum as a Pallas TPU kernel.

The hash-grid embedding-gradient accumulation (the transpose of the encode
gather — the role of the reference's CUDA atomics, gridencoder.cu:253-353) is
the measured per-step bottleneck: XLA scatter-add runs at ~58M rows/s on v5e
regardless of sortedness. This kernel exploits a *sorted* update stream: a
block of consecutive sorted indices spans only a few 128-slot windows, so each
window-span's partial histogram is one VPU compare (one-hot) + one small
matmul and one aligned accumulate — no random access at all. The sort itself
is a fused multi-operand lax.sort (bf16 payloads under tpu.grad_payload).

Two precision paths:
  - bf16 payloads: one-hot built in bf16, ONE single-pass MXU matmul with f32
    accumulation — products are exact (0/1 × bf16), so the result equals a
    scatter-add of the bf16 values accumulated in f32.
  - f32 payloads: f32 one-hot with precision=HIGHEST (true-f32 passes) —
    matches a scatter-add bit-for-bit up to f32-summation order.

Windows are processed SPAN at a time (one (C, BLK) @ (BLK, SPAN*128) matmul
per iteration) so typical blocks — which span 1-2 windows — finish in a
single loop iteration instead of per-window skinny matmuls.

segment_sum_sorted(sorted_idx (N,), vals: C arrays (N,), size) -> (C, size)
float32. Channel-flat layout throughout so nothing hits the narrow-lane
(N, 2) tile-padding trap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048
WIN = 128
SPAN = 2          # windows per matmul (SPAN*WIN lanes)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(idx_ref, *refs, n_chan: int, t_pad: int):
    val_refs = refs[:n_chan]
    out_ref = refs[n_chan]          # (n_chan * t_pad // WIN, WIN)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                                  # (BLK,) int32, sorted
    vals = jnp.stack([r[:] for r in val_refs], 0)     # (C, BLK)
    hp = jnp.bfloat16 if vals.dtype == jnp.bfloat16 else jnp.float32
    prec = (None if hp == jnp.bfloat16 else jax.lax.Precision.HIGHEST)
    s0 = idx_ref[0] // (SPAN * WIN)
    s1 = idx_ref[BLK - 1] // (SPAN * WIN)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, SPAN * WIN), 1)
    col = idx.reshape(BLK, 1)
    rows_per_chan = t_pad // WIN

    def body(s, _):
        base = s * (SPAN * WIN)
        onehot = (col - base == lanes).astype(hp)     # (BLK, SPAN*WIN)
        # 0/1 one-hot operand -> every product is exact; f32 accumulation
        contrib = jax.lax.dot_general(
            vals, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                            # (C, SPAN*WIN) f32
        for c in range(n_chan):
            row0 = c * rows_per_chan + s * SPAN
            for w in range(SPAN):     # static unroll: Mosaic dislikes the
                # (SPAN*WIN,) -> (SPAN, WIN) vector reshape
                out_ref[row0 + w, :] += contrib[c, w * WIN:(w + 1) * WIN]
        return 0

    jax.lax.fori_loop(s0, s1 + 1, body, 0)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def segment_sum_sorted(sorted_idx: jnp.ndarray, sorted_vals: tuple,
                       size: int, interpret: bool = False) -> jnp.ndarray:
    """Σ vals[c][i] into out[c, sorted_idx[i]]; sorted_idx must be
    nondecreasing (pair it with lax.sort((idx, *vals), num_keys=1))."""
    N = sorted_idx.shape[0]
    n_chan = len(sorted_vals)
    t_pad = _round_up(max(size, SPAN * WIN), SPAN * WIN)

    n_pad = _round_up(N, BLK)
    pad = n_pad - N
    idx = sorted_idx.astype(jnp.int32)
    bf = all(v.dtype == jnp.bfloat16 for v in sorted_vals)
    vdt = jnp.bfloat16 if bf else jnp.float32
    cols = [v.astype(vdt) for v in sorted_vals]
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
