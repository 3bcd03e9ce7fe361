"""MXU one-hot-matmul hash-table gather (the forward dual of hist_pallas).

XLA's row gather on TPU is HBM-random-access bound: ~149M (N, 2)-rows/s on
v5e (~1.2 GB/s effective — each 8-byte row wastes a full HBM transaction).
The hash-grid encode is a gather of L*8*P such rows per step (the role of the
reference CUDA kernel's __ldg loads, gridencoder.cu:101-130), several times
per training step across the AD graph — it is the single largest block of the
real-step profile after the backward accumulate was fixed.

This kernel keeps each level's table VMEM-resident and turns the random
access into dense MXU work, exactly mirroring ops/hist_pallas.py in the
opposite direction. Per-level local indices are bounded by the hashmap size
(<= 2^15), so idx factors exactly as idx = hi*128 + lo with hi < 256:

    sel[i, c*128 + lo] = sum_h onehot_hi[i, h] * tab[h, c*128 + lo]
                       = (BLK, T_hi) @ (T_hi, 128*C)        # MXU
    out_c[i]           = sum_lo onehot_lo[i, lo] * sel[i, c*128 + lo]  # VPU

FLOP cost: 2*N*T_hi*128*C per split — ~0.9 TFLOP bf16 at the bench point
(3.3M rows, T_hi=256, C=2), ~2 ms of MXU vs ~14-22 ms of XLA gather for the
same rows.

Precision: the one-hot operand is exact in bf16 (0/1) and each output row
receives exactly one table row, so with a single bf16 table the result is the
bf16-rounded table value (the reference's AMP fp16 embedding semantics,
grid.py:44-47). For f32 tables the kernel takes a 3-way bf16 split
(t1 = bf16(x), t2 = bf16(x - t1), t3 = bf16(x - t1 - t2)); the selected sum
t1 + t2 + t3 reconstructs the f32 value to <= 1 ulp, so the f32 path matches
jnp.take to f32 round-off.

level_gather(idx_local (L, Np) int32, tabs: S arrays (L, T_hi, 128*C))
  -> (C, L*Np) f32,  out[c, l*Np + i] = sum_s tabs[s][l][idx[l,i]//128,
                                                 c*128 + idx[l,i]%128]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM per grid step at BLK=2048, T_hi=256, C=2: one-hot (BLK, T_hi) bf16
# 1 MB + sel (BLK, 256) f32 2 MB + tables 3x128 KB — well under the scoped
# limit, same budget discipline as hist_pallas.BLK
BLK = 2048
WIN = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(idx_ref, *refs, n_chan: int, t_hi: int, n_split: int):
    tab_refs = refs[:n_split]
    out_refs = refs[n_split:]

    idx = idx_ref[:]                                       # (BLK,) int32
    hi = idx // WIN
    lo = idx - hi * WIN

    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (BLK, t_hi), 1)
    a = (hi[:, None] == lanes_hi).astype(jnp.bfloat16)     # exact 0/1
    sel = jnp.zeros((BLK, WIN * n_chan), jnp.float32)
    for s in range(n_split):
        sel += jax.lax.dot_general(
            a, tab_refs[s][0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (BLK, WIN*C)

    lanes_lo = jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 1)
    lo_oh = lo[:, None] == lanes_lo                        # (BLK, WIN) bool
    for c in range(n_chan):
        picked = jnp.where(lo_oh, sel[:, c * WIN:(c + 1) * WIN], 0.0)
        out_refs[c][:] = jnp.sum(picked, axis=1)           # (BLK,)


@functools.partial(jax.jit, static_argnames=("n_chan", "interpret"))
def level_gather(idx_local: jnp.ndarray, tabs: tuple, n_chan: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Gather one padded-table row per index. idx_local (L, Np) int32 in
    [0, t_pad); tabs: S bf16 arrays (L, t_hi, WIN*n_chan) from
    pack_level_table; returns (n_chan, L*Np) f32."""
    L, Np = idx_local.shape
    n_split = len(tabs)
    t_hi = tabs[0].shape[1]

    np_pad = _round_up(Np, BLK)
    pad = np_pad - Np
    idx = idx_local.astype(jnp.int32)
    if pad:
        # padded slots read row 0 of the level; sliced off below
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
    idx_flat = idx.reshape(L * np_pad)

    nb = np_pad // BLK
    outs = pl.pallas_call(
        functools.partial(_kernel, n_chan=n_chan, t_hi=t_hi,
                          n_split=n_split),
        out_shape=tuple(jax.ShapeDtypeStruct((L * np_pad,), jnp.float32)
                        for _ in range(n_chan)),
        grid=(L, nb),
        in_specs=[pl.BlockSpec((BLK,), lambda l, b: (l * nb + b,),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((1, t_hi, WIN * n_chan),
                               lambda l, b: (l, 0, 0),
                               memory_space=pltpu.VMEM)] * n_split,
        out_specs=tuple(pl.BlockSpec((BLK,), lambda l, b: (l * nb + b,),
                                     memory_space=pltpu.VMEM)
                        for _ in range(n_chan)),
        interpret=interpret,
    )(idx_flat, *tabs)

    out = jnp.stack(outs, 0)                               # (C, L*np_pad)
    if pad:
        out = out.reshape(n_chan, L, np_pad)[:, :, :Np].reshape(n_chan, -1)
    return out


def pack_level_table(emb: jnp.ndarray, offsets, n_levels: int, t_pad: int,
                     n_split: int) -> tuple:
    """Slice emb (T, C) into per-level tables padded to a common t_pad,
    laid out (L, t_hi, C*WIN) with lane c*WIN + lo <- row hi*WIN + lo, and
    split into n_split bf16 planes (1 = bf16-rounded values, 3 = exact-f32
    reconstruction t1+t2+t3)."""
    C = emb.shape[1]
    t_pad = _round_up(max(t_pad, WIN), WIN)
    t_hi = t_pad // WIN
    levels = []
    for l in range(n_levels):
        e = emb[offsets[l]:offsets[l + 1]]
        if e.shape[0] < t_pad:
            e = jnp.pad(e, ((0, t_pad - e.shape[0]), (0, 0)))
        levels.append(e.reshape(t_hi, WIN, C).transpose(0, 2, 1)
                      .reshape(t_hi, C * WIN))
    tab = jnp.stack(levels)                                # (L, t_hi, C*WIN)
    t1 = tab.astype(jnp.bfloat16)
    if n_split == 1:
        return (t1,)
    r1 = tab - t1.astype(tab.dtype)
    t2 = r1.astype(jnp.bfloat16)
    t3 = (r1 - t2.astype(tab.dtype)).astype(jnp.bfloat16)
    return (t1, t2, t3)
