"""Sort-free per-level histogram of embedding cotangents (MXU one-hot matmul).

The hash-grid backward must accumulate an UNSORTED stream of (index, value)
updates into each level's table (the role of the reference's CUDA atomics,
gridencoder.cu:253-353). Round-1 path: global lax.sort of the stream + a
windowed segment-sum (ops/segsum_pallas.py). The sort is the dominant cost
(~60% of the accumulate path at the bench point) and is fundamentally
bandwidth/comparator bound.

This kernel skips the sort: per-level indices are bounded by the hashmap size
(<= 2^15 slots, offsets[l+1]-offsets[l]), so idx factors exactly as
idx = hi*128 + lo with hi < T_pad/128 <= 256. The histogram then becomes ONE
dense matmul per update block:

    out[hi, c*128 + lo] += sum_i  A[i, hi] * (lo_onehot[i, lo] * val[c, i])
                         = (BLK, T_hi)^T @ (BLK, 128*C)

i.e. compare-on-VPU (build the two one-hots), accumulate-on-MXU — no random
access, no sort, no atomics. Each grid step is a well-shaped
(T_hi, BLK) x (BLK, 128*C) matmul with f32 accumulation; one-hot operands are
exact in bf16 (0/1), so with bf16 payloads every product is exact and the
result equals a scatter-add of the bf16-rounded values accumulated in f32
(the same semantics as segsum_pallas's bf16 path / the reference's AMP fp16
embedding grads, grid.py:44-47). f32 payloads use precision=HIGHEST
(true-f32 passes) and match a scatter-add up to f32-summation order.

FLOP cost: 2*N*T_hi*128*C per level stream — the price of turning a scatter
into dense MXU work. At the bench operating point (10 levels x 262k updates,
C=4, T_hi=256) that is ~0.7 TFLOP bf16 on the MXU, vs ~17 ms of lax.sort +
segment-sum for the same stream.

Layout: everything crosses as FLAT streams (idx (L*Np,), vals (C, L*Np));
level l's blocks are found by the grid index map (l*NB + b) — 1-D / C-row
blocks sidestep the (8, 128) min-tile rule for small leading dims.

level_histogram(idx_local (L, Np) int32, vals: C arrays (L, Np), t_pad)
  -> (C, L, t_pad) f32,  out[c, l, t] = sum_{i: idx[l,i]==t} vals[c][l,i]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# BLK bounds the kernel's VMEM intermediates: the one-hots are (BLK, T_hi) +
# (BLK, 128*C) — at BLK=4096/f32/C=4 that is ~22 MB and trips the 16 MB
# scoped-vmem limit; 2048 fits both payload dtypes
BLK = 2048
WIN = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(idx_ref, val_ref, out_ref, *, n_chan: int, t_hi: int, blk: int):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]                                       # (BLK,) int32
    hi = idx // WIN
    lo = idx - hi * WIN
    vals = val_ref[:, :]                                   # (C, BLK)
    hp = jnp.bfloat16 if vals.dtype == jnp.bfloat16 else jnp.float32
    prec = (None if hp == jnp.bfloat16 else jax.lax.Precision.HIGHEST)

    lanes_hi = jax.lax.broadcasted_iota(jnp.int32, (blk, t_hi), 1)
    a = (hi[:, None] == lanes_hi).astype(hp)               # (BLK, T_hi)
    lanes_lo = jax.lax.broadcasted_iota(jnp.int32, (blk, WIN), 1)
    lo_oh = lo[:, None] == lanes_lo                        # (BLK, WIN) bool
    # minor-dim insertion ((BLK,) -> (BLK, 1)) is only a no-op for 32-bit
    # types on Mosaic — broadcast in f32, round to the compute dtype after
    bv = jnp.concatenate(
        [jnp.where(lo_oh, vals[c].astype(jnp.float32)[:, None],
                   0.0).astype(hp)
         for c in range(n_chan)], axis=1)                  # (BLK, WIN*C)
    contrib = jax.lax.dot_general(
        a, bv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                    # (T_hi, WIN*C)
    out_ref[0] += contrib


def _blk_for(n_chan: int, itemsize: int) -> int:
    """Block size bounded by the kernel's VMEM intermediates: bv is
    (BLK, WIN*n_chan) in the payload compute dtype — budget ~4 MB so wide
    packed-corner payloads (n_chan = 8*level_dim after dense-level
    oct-packing) stay well under the 16 MB scoped-vmem limit.

    HARD FLOOR 1024: the flat s32 idx stream gets XLA layout {0:T(1024)},
    and Mosaic derives the operand tiling from the block shape — a 512 block
    fails verification ("XLA layout ({0:T(1024)}) does not match Mosaic
    layout ({0:T(512)})", observed live on v5e at the bf16 n_chan=32 packed
    backward, round-4 full-budget run). Callers keep bv bounded at the floor
    by chunking channels (level_histogram) instead of shrinking blk."""
    return max(1024, min(BLK, (1 << 22) // (WIN * n_chan * itemsize)))


@functools.partial(jax.jit, static_argnames=("t_pad", "interpret"))
def level_histogram(idx_local: jnp.ndarray, vals: tuple, t_pad: int,
                    interpret: bool = False) -> jnp.ndarray:
    """Per-level dense histogram. idx_local (L, Np) int32 in [0, t_pad);
    vals: C arrays (L, Np); returns (C, L, t_pad) f32."""
    L, Np = idx_local.shape
    n_chan = len(vals)
    t_pad = _round_up(max(t_pad, WIN), WIN)
    t_hi = t_pad // WIN
    bf_payload = all(v.dtype == jnp.bfloat16 for v in vals)
    itemsize = 2 if bf_payload else 4
    # channel chunking: with blk floored at 1024 (layout, _blk_for) the bv
    # intermediate is bounded by capping per-call channels at 64 bytes/row
    # (f32 -> 16, bf16 -> 32; bv <= 8 MiB) and concatenating the results
    max_c = 64 // itemsize
    if n_chan > max_c:
        outs = [level_histogram(idx_local, vals[i:i + max_c], t_pad,
                                interpret)
                for i in range(0, n_chan, max_c)]
        return jnp.concatenate(outs, 0)
    blk = _blk_for(n_chan, itemsize)

    np_pad = _round_up(Np, blk)
    pad = np_pad - Np
    idx = idx_local.astype(jnp.int32)
    bf = all(v.dtype == jnp.bfloat16 for v in vals)
    vdt = jnp.bfloat16 if bf else jnp.float32
    cols = [v.astype(vdt) for v in vals]
    if pad:
        # padded slots target slot 0 with zero values — they add nothing
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        cols = [jnp.pad(v, ((0, 0), (0, pad))) for v in cols]
    idx_flat = idx.reshape(L * np_pad)
    val_flat = jnp.stack([v.reshape(L * np_pad) for v in cols], 0)  # (C, L*Np)

    nb = np_pad // blk
    out = pl.pallas_call(
        functools.partial(_kernel, n_chan=n_chan, t_hi=t_hi, blk=blk),
        out_shape=jax.ShapeDtypeStruct((L, t_hi, WIN * n_chan), jnp.float32),
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((blk,), lambda l, b: (l * nb + b,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chan, blk), lambda l, b: (0, l * nb + b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_hi, WIN * n_chan), lambda l, b: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_flat, val_flat)                                  # (L, t_hi, WIN*C)

    # (L, t_hi, WIN*C) -> (C, L, t_pad): lanes are [c*WIN + lo] blocks
    out = out.reshape(L, t_hi, n_chan, WIN)
    return out.transpose(2, 0, 1, 3).reshape(n_chan, L, t_pad)
