"""Multi-resolution hash/tiled grid encoder (Instant-NGP style).

TPU-native re-design of the reference CUDA gridencoder
(external/encoders/gridencoder/src/gridencoder.cu, grid.py). Spec parity:
  - prime-XOR hashing of integer corners (gridencoder.cu:46-58)
  - dense indexing until the level overflows the hash table, then hash
    (gridencoder.cu:62-79)
  - per-level resolution ceil(exp2(level*S)*H), table sizes rounded up to 8
    (gridencoder.cu:133, grid.py:128-135)
  - align_corners both modes, linear + smoothstep interpolation
    (gridencoder.cu:143-159)
  - out-of-range inputs produce zeros (gridencoder.cu:101-130)
  - max_level partial evaluation with zero-fill (grid.py:42,53)

Unlike the CUDA version there is no hand-written backward: the forward is a
differentiable gather+lerp, so JAX autodiff yields exact gradients to both the
embeddings (scatter-add, replacing CUDA atomics) and the inputs (replacing the
cached dy_dx double-backward path). The level loop is unrolled at trace time
(L=16 static) and XLA batches the per-level gathers.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax import custom_derivatives as _cd

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


# ---- scatter-free embedding gradients --------------------------------------
#
# XLA's scatter-add on TPU runs at ~60M updates/s (measured: each per-level
# 1M-update embedding-gradient scatter costs ~16 ms, and a train step contains
# hundreds of them). The gather itself is fast. So the gather is expressed as
# a linear_call whose TRANSPOSE is a sort-based segment sum (sort + cumsum +
# boundary differences — all TPU-fast primitives), and the segment sum's own
# transpose is the gather again, giving correct arbitrary-order AD (normals
# differentiate through this twice).

def _segsum_impl(vals: jnp.ndarray, idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Σ_i vals[i] into out[idx[i]], (N, C) → (size, C), no scatter."""
    order = jnp.argsort(idx)
    si = idx[order]
    sv = jnp.take(vals, order, axis=0)
    cs = jnp.concatenate([jnp.zeros((1,) + sv.shape[1:], sv.dtype),
                          jnp.cumsum(sv, axis=0)], axis=0)
    slots = jnp.arange(size, dtype=si.dtype)
    starts = jnp.searchsorted(si, slots, side="left")
    ends = jnp.searchsorted(si, slots, side="right")
    return jnp.take(cs, ends, axis=0) - jnp.take(cs, starts, axis=0)


def segment_accumulate(vals: jnp.ndarray, idx: jnp.ndarray,
                       size: int) -> jnp.ndarray:
    """Linear-in-vals segment sum with transpose = gather."""
    return _cd.linear_call(
        lambda i, v: _segsum_impl(v, i, size),
        lambda i, ct: jnp.take(ct, i, axis=0),
        idx, vals)


def take_accumulating(emb: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of emb (T, C) at idx (N,) whose cotangent accumulates via
    the sort-based segment sum instead of XLA scatter."""
    size = emb.shape[0]
    return _cd.linear_call(
        lambda i, e: jnp.take(e, i, axis=0),
        lambda i, ct: segment_accumulate(ct, i, size),
        idx, emb)


def _pallas_interpret() -> bool:
    return jax.default_backend() != "tpu"


def take_sorted_pallas(emb: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather emb (T, C) rows at idx (N,) whose embedding-cotangent transpose
    is lax.sort + the Pallas windowed one-hot segment-sum
    (ops/segsum_pallas.py) instead of XLA scatter-add.

    v5e, 16.8M updates into a 420k-slot table: 86 ms (C=2) / 115 ms (C=4)
    vs 268 ms for the per-level scan-scatter path and 1365 ms for one
    combined XLA scatter. Everything crosses the linear_call boundary as flat
    per-channel scalar streams (no narrow-lane tile padding); arbitrary-order
    AD is preserved (transpose of the transpose is the gather again).
    """
    from .segsum_pallas import segment_sum_sorted

    C = emb.shape[1]
    N = idx.shape[0]
    T = emb.shape[0]
    interpret = _pallas_interpret()

    emb_cm = emb.T.reshape(-1)                           # channel-major (C*T,)
    idx_u = idx.astype(jnp.uint32)
    idx2 = jnp.concatenate([idx_u + jnp.uint32(c * T)
                            for c in range(C)], axis=0)  # (C*N,) block layout

    def _scatter_sorted(i, ct):
        base = i[:N].astype(jnp.int32)          # channel-0 block == idx
        cols = tuple(ct[c * N:(c + 1) * N] for c in range(C))
        ops = jax.lax.sort((base,) + cols, num_keys=1)
        out = segment_sum_sorted(ops[0], ops[1:], T, interpret=interpret)
        return out.reshape(-1)                  # (C*T,) channel-major

    def _gather(i, ct_emb):
        return jnp.take(ct_emb, i, axis=0)

    flat = _cd.linear_call(
        lambda i, e: jnp.take(e, i, axis=0),
        lambda i, ct: _cd.linear_call(_scatter_sorted, _gather, i, ct),
        idx2, emb_cm)                                    # (C*N,)
    return jnp.stack([flat[c * N:(c + 1) * N] for c in range(C)], axis=-1)


def take_sorted_pallas_rows(emb: jnp.ndarray, idx: jnp.ndarray,
                            payload_dtype=None) -> jnp.ndarray:
    """Row-gather variant: forward is ONE (N, C)-row gather (149M rows/s on
    v5e vs 108M scalar-gathers/s for the flat stream); backward is the same
    sorted Pallas segment-sum on per-channel slices of the cotangent.

    payload_dtype=bfloat16 sorts the cotangent payloads as 16-bit values
    (cheaper comparator network + half the payload bytes through the sort) —
    the per-update values are rounded once to bf16, the windowed one-hot
    matmul still accumulates in f32. This is the reference's AMP fp16
    embedding-gradient semantics (grid.py:44-47 under autocast, where grads
    are fp16 end-to-end); f32 master weights are kept either way."""
    from .segsum_pallas import segment_sum_sorted

    C = emb.shape[1]
    T = emb.shape[0]
    interpret = _pallas_interpret()
    idx = idx.astype(jnp.int32)

    def _scatter_sorted(i, ct):
        cols = tuple(ct[:, c] if payload_dtype is None
                     else ct[:, c].astype(payload_dtype) for c in range(C))
        ops = jax.lax.sort((i,) + cols, num_keys=1)
        return segment_sum_sorted(ops[0], ops[1:], T,
                                  interpret=interpret).T.astype(ct.dtype)

    def _gather(i, ct_emb):
        return jnp.take(ct_emb, i, axis=0)

    return _cd.linear_call(
        lambda i, e: jnp.take(e, i, axis=0),
        lambda i, ct: _cd.linear_call(_scatter_sorted, _gather, i, ct),
        idx, emb)


def _level_groups(sizes: Sequence[int]) -> list:
    """Partition the (nondecreasing) per-level table sizes into contiguous
    groups, each padded to its own max, minimizing total histogram cost
    Σ_groups n_levels_g * t_hi_g (the one-hot matmul width is the group's
    padded size — one global max makes every dense level pay the 2^15-slot
    hashed-level width). Small DP; a per-group constant bounds the number of
    pallas_call launches."""
    L = len(sizes)
    t_hi = [ (max(s, 128) + 127) // 128 for s in sizes ]
    best = [None] * (L + 1)
    best[0] = (0, -1)                       # (cost, split point)
    for hi in range(1, L + 1):
        for lo in range(hi):
            c = best[lo][0] + (hi - lo) * t_hi[hi - 1] + 16
            if best[hi] is None or c < best[hi][0]:
                best[hi] = (c, lo)
    groups, hi = [], L
    while hi > 0:
        lo = best[hi][1]
        groups.append((lo, hi))
        hi = lo
    return groups[::-1]


def take_hist_rows(emb: jnp.ndarray, idx: jnp.ndarray,
                   offsets: Sequence[int], n_levels: int,
                   payload_dtype=None) -> jnp.ndarray:
    """Row-gather whose embedding cotangent accumulates via the SORT-FREE
    per-level one-hot-matmul histogram (ops/hist_pallas.py) instead of
    lax.sort + windowed segment-sum.

    Requires the level-major equal-block stream layout encode() builds:
    idx (L*K*P,) with level l in rows [l*K*P, (l+1)*K*P) and values within
    [offsets[l], offsets[l+1]). Local indices are bounded by the hashmap size
    (<= 2^15), which is what makes the dense factored one-hot affordable.
    Levels are grouped by table size (_level_groups) so dense coarse levels
    don't pay the hashed levels' 2^15-slot one-hot width — 23% less hist
    MXU work at the bench point. linear_call nesting keeps arbitrary-order AD
    (transpose of the transpose is the gather again — normals differentiate
    through this twice)."""
    from .hist_pallas import level_histogram

    C = emb.shape[1]
    N = idx.shape[0]
    L = n_levels
    Np = N // L
    sizes = [offsets[l + 1] - offsets[l] for l in range(L)]
    groups = _level_groups(sizes)
    offs_np = np.asarray(offsets[:L], np.int32).reshape(L, 1)
    interpret = _pallas_interpret()
    idx = idx.astype(jnp.int32)

    def _hist(i, ct):
        # constants must be materialized INSIDE the transpose closure: a
        # jnp array created in the enclosing trace and captured here leaks
        # that trace's tracer when the transpose is re-evaluated in a
        # different trace (observed under jax.checkpoint of the virtual
        # step: UnexpectedTracerError on the remat backward replay)
        offs = jnp.asarray(offs_np)
        il = i.reshape(L, Np) - offs                     # local per level
        vals = tuple(ct[:, c].reshape(L, Np) if payload_dtype is None
                     else ct[:, c].reshape(L, Np).astype(payload_dtype)
                     for c in range(C))
        outs = [level_histogram(il[lo:hi],
                                tuple(v[lo:hi] for v in vals),
                                max(sizes[lo:hi]), interpret=interpret)
                for lo, hi in groups]                    # (C, hi-lo, t_pad_g)
        chans = [jnp.concatenate(
            [out[c, l - lo, :sizes[l]]
             for (lo, hi), out in zip(groups, outs) for l in range(lo, hi)])
            for c in range(C)]
        acc = jnp.stack(chans, -1).astype(ct.dtype)      # (offsets[L], C)
        if acc.shape[0] < emb.shape[0]:   # statically-truncated levels: zeros
            acc = jnp.pad(acc, ((0, emb.shape[0] - acc.shape[0]), (0, 0)))
        return acc                                       # (T, C)

    def _gather(i, ct_emb):
        return jnp.take(ct_emb, i, axis=0)

    return _cd.linear_call(
        lambda i, e: jnp.take(e, i, axis=0),
        lambda i, ct: _cd.linear_call(_hist, _gather, i, ct),
        idx, emb)


def take_mxu_rows(emb: jnp.ndarray, idx: jnp.ndarray,
                  offsets: Sequence[int], n_levels: int,
                  payload_dtype=None) -> jnp.ndarray:
    """Fully MXU-resident gather/accumulate pair: the FORWARD gather is the
    Pallas factored one-hot matmul (ops/gather_pallas.py — each level's table
    VMEM-resident, ~2 ms of MXU work for the bench point's 3.3M rows vs
    ~14-22 ms of XLA HBM-random-access gather) and the embedding cotangent
    accumulates via the sort-free histogram (ops/hist_pallas.py). The two
    kernels are exact transposes of each other, so linear_call nesting gives
    arbitrary-order AD with no XLA gather/scatter anywhere on the table path.

    payload_dtype=None gathers exact f32 table values (3-way bf16 table split,
    <= 1 ulp) and accumulates f32 cotangents; bfloat16 rounds both directions
    to bf16 (the reference's AMP fp16 embedding semantics, grid.py:44-47)."""
    from .gather_pallas import level_gather, pack_level_table
    from .hist_pallas import level_histogram

    C = emb.shape[1]
    N = idx.shape[0]
    L = n_levels
    Np = N // L
    sizes = [offsets[l + 1] - offsets[l] for l in range(L)]
    t_pad = max(sizes)
    offs = jnp.asarray(np.asarray(offsets[:L], np.int32).reshape(L, 1))
    interpret = _pallas_interpret()
    n_split = 1 if payload_dtype is not None else 3
    il = idx.astype(jnp.int32).reshape(L, Np) - offs       # (L, Np) local

    def _gather(i, e):                                     # (T, C) -> (N, C)
        tabs = pack_level_table(e, offsets, L, t_pad, n_split)
        return level_gather(i, tabs, n_chan=C, interpret=interpret).T

    def _hist(i, ct):                                      # (N, C) -> (T, C)
        vals = tuple(ct[:, c].reshape(L, Np) if payload_dtype is None
                     else ct[:, c].reshape(L, Np).astype(payload_dtype)
                     for c in range(C))
        out = level_histogram(i, vals, t_pad, interpret=interpret)
        chans = [jnp.concatenate([out[c, l, :sizes[l]] for l in range(L)])
                 for c in range(C)]
        acc = jnp.stack(chans, -1).astype(ct.dtype)        # (offsets[L], C)
        if acc.shape[0] < emb.shape[0]:   # statically-truncated levels: zeros
            acc = jnp.pad(acc, ((0, emb.shape[0] - acc.shape[0]), (0, 0)))
        return acc                                         # (T, C)

    return _cd.linear_call(
        _gather,
        lambda i, ct: _cd.linear_call(_hist, _gather, i, ct),
        il, emb)


def take_level_scatter(emb: jnp.ndarray, idx: jnp.ndarray,
                       offsets: Sequence[int]) -> jnp.ndarray:
    """Gather whose cotangent scatters PER LEVEL into each level's table slice.

    Two v5e-measured facts shape this:
      1. XLA scatter-add throughput is governed by the TABLE size, not the
         update count (55M upd/s into 32k slots vs 12M upd/s into 430k), so a
         lax.scan of per-level scatters into padded ≤2^15-slot slices beats one
         combined scatter ~5x (268ms vs 1361ms for 16.8M updates).
      2. Tensors materialized at the linear_call boundary get the (8,128) tile
         layout; a (N, 2) tensor pads 2→128 lanes (64x, 8GB at N=16.8M). So
         everything crosses the boundary as FLAT scalar streams with the
         channel interleaved into the index.

    idx layout: (L·2^D·P,) with level-l rows in the contiguous block
    [l·B, (l+1)·B) and values within [offsets[l], offsets[l+1]). linear_call
    keeps arbitrary-order AD (transpose of the transpose is the gather again).
    """
    L = len(offsets) - 1
    C = emb.shape[1]
    N = idx.shape[0]
    T = emb.shape[0]
    B = N // L

    sizes = [offsets[l + 1] - offsets[l] for l in range(L)]
    t_pad = max(sizes)
    # per-level channel-major offsets; all arrays stay strictly 1-D (or have a
    # large trailing dim) so nothing hits the 2→128 lane-padding trap.
    # Kept as numpy here — converted inside _scatter_levels so the transpose
    # closure never captures another trace's constant tracer (see take_hist_rows)
    offs_np = np.asarray(offsets[:-1], np.uint32)

    emb_cm = emb.T.reshape(-1)                           # channel-major (C*T,)
    idx_u = idx.astype(jnp.uint32)
    idx2 = jnp.concatenate([idx_u + jnp.uint32(c * T)
                            for c in range(C)], axis=0)  # (C*N,) block layout

    def _scatter_levels(i, ct):
        offs_arr = jnp.asarray(offs_np)
        # regroup (C*N,) block layout into per-level streams of size C*B:
        # level l rows = {c*N + l*B ... c*N + (l+1)*B} for each channel c
        idx_l = jnp.stack([
            jnp.concatenate([jax.lax.dynamic_slice_in_dim(i, c * N + l * B, B)
                             for c in range(C)]) for l in range(L)])
        ct_l = jnp.stack([
            jnp.concatenate([jax.lax.dynamic_slice_in_dim(ct, c * N + l * B, B)
                             for c in range(C)]) for l in range(L)])

        def body(_, xs):
            il, cl, off = xs
            # channel c of level l → seg[c*t_pad + (i - c*T - off)]
            ch = (il // jnp.uint32(T)).astype(jnp.int32)
            local = (il - ch.astype(jnp.uint32) * jnp.uint32(T)
                     - off).astype(jnp.int32) + ch * t_pad
            seg = jnp.zeros((t_pad * C,), ct.dtype).at[local].add(
                cl, mode="drop")
            return 0.0, seg

        _, segs = jax.lax.scan(body, 0.0, (idx_l, ct_l, offs_arr))
        # assemble channel-major (C*T,): per channel, concat level slices
        chans = []
        for c in range(C):
            chans.append(jnp.concatenate(
                [segs[l, c * t_pad:c * t_pad + sizes[l]] for l in range(L)]))
        return jnp.concatenate(chans, axis=0)

    def _gather(i, ct_emb):
        return jnp.take(ct_emb, i, axis=0)

    flat = _cd.linear_call(
        lambda i, e: jnp.take(e, i, axis=0),
        lambda i, ct: _cd.linear_call(_scatter_levels, _gather, i, ct),
        idx2, emb_cm)                                    # (C*N,)
    # channel-block → (N, C); the reshape/stack here is ordinary XLA and fuses
    # into the weight-combine consumer
    return jnp.stack([flat[c * N:(c + 1) * N] for c in range(C)], axis=-1)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 15
    per_level_scale: float = 2.0
    desired_resolution: int | None = None
    gridtype: str = "hash"        # 'hash' | 'tiled'
    align_corners: bool = False
    # 'linear' | 'smoothstep' (gridencoder.cu:143-159) | 'nearest' (TPU-only
    # addition: single rounded corner, no lerp — 8x fewer gathered rows; used
    # for the occupancy-grid density queries where the EMA binarization
    # cannot resolve sub-cell detail anyway, tpu.occ_query_interp)
    interpolation: str = "linear"
    # embedding-cotangent path:
    #   'hist_rows' (default): row-gather forward (149M rows/s on v5e vs 108M
    #       scalar-gathers/s flat) + SORT-FREE per-level one-hot-matmul
    #       histogram backward (ops/hist_pallas.py): the 15-bit local index
    #       factors as hi*128+lo, so the accumulate is a dense
    #       (T_hi, BLK)x(BLK, 128*C) MXU matmul per block — no sort at all.
    #       Measured 3.7 ms/step faster than sort_pallas_rows at the bench
    #       point (v5e, 10/16 levels); exact, any-order AD.
    #   'sort_pallas_rows': row-gather forward + lax.sort + Pallas windowed
    #       one-hot segment-sum backward (ops/segsum_pallas.py, 86 ms per
    #       16.8M updates vs 268 ms for 'level_scatter').
    #       Full real step: 884 ms vs 2191 ms with 'level_scatter'.
    #   'mxu_rows': Pallas factored one-hot MXU gather forward (table
    #       VMEM-resident, ops/gather_pallas.py) + the same hist backward —
    #       no XLA gather/scatter anywhere on the table path; f32-exact
    #       (3-way bf16 table split) unless grad_payload=bfloat16
    #   'sort_pallas': same backward as sort_pallas_rows, flat stream forward
    #   'level_scatter': per-level scatters via lax.scan on flat streams
    #   'scatter': XLA native scatter-add on the combined index space
    #   'sort': linear_call sort+cumsum segment-sum (scatter-free)
    vjp_mode: str = "hist_rows"
    # cotangent payload dtype through the backward sort ('float32' |
    # 'bfloat16'); bf16 halves sort payload traffic (reference AMP fp16-grad
    # precedent); accumulation stays f32 (tpu.grad_payload)
    grad_payload: str = "float32"
    # oct-packed gathers for DENSE levels (res^D <= table size, i.e. no hash
    # wrap): the 2^D corner rows of a cell sit at base + {0,1}·1 + {0,1}·res +
    # {0,1}·res² — one (2^D·C)-wide row of a shifted-concat packed table
    # replaces 2^D separate row gathers (v5e row gathers are transaction-
    # bound, so rows/site drop 8x for the coarse levels). Backward
    # accumulates the packed cotangent through the same one-hot histogram
    # (2^D·C channels) and un-shifts via the pack's own transpose. Exact —
    # clamped border corners carry zero lerp weight, so wrapped packed rows
    # never contribute. hist_rows mode only.
    pack_dense: bool = True

    def __post_init__(self):
        if self.desired_resolution is not None:
            s = np.exp2(np.log2(self.desired_resolution / self.base_resolution)
                        / (self.num_levels - 1))
            object.__setattr__(self, "per_level_scale", float(s))

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def resolutions(self) -> Sequence[int]:
        s = np.log2(self.per_level_scale)
        return tuple(int(np.ceil(np.exp2(l * s) * self.base_resolution))
                     for l in range(self.num_levels))

    @property
    def offsets(self) -> Sequence[int]:
        """Start offset of each level's table; matches grid.py:125-135."""
        offs, off = [], 0
        max_params = 2 ** self.log2_hashmap_size
        for res in self.resolutions:
            n = min(max_params, res ** self.input_dim)
            n = int(np.ceil(n / 8) * 8)
            offs.append(off)
            off += n
        offs.append(off)
        return tuple(offs)

    @property
    def table_size(self) -> int:
        return self.offsets[-1]


def init_embeddings(key: jax.Array, spec: HashGridSpec,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init (grid.py:145-147)."""
    return jax.random.uniform(key, (spec.table_size, spec.level_dim),
                              minval=-1e-4, maxval=1e-4, dtype=dtype)


def _corner_index(spec: HashGridSpec, pos_grid: jnp.ndarray, resolution: int,
                  hashmap_size: int) -> jnp.ndarray:
    """Integer corner coords (..., D) uint32 → table index within the level.

    Mirrors get_grid_index (gridencoder.cu:62-79): dense stride accumulation
    while the stride still fits the table, hash overflow otherwise.
    """
    D = spec.input_dim
    index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
    stride = 1
    for d in range(D):
        if stride <= hashmap_size:
            index = index + pos_grid[..., d] * jnp.uint32(stride)
        stride *= resolution
    if spec.gridtype == "hash" and stride > hashmap_size:
        h = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
        for d in range(D):
            h = h ^ (pos_grid[..., d] * jnp.uint32(_PRIMES[d] & 0xFFFFFFFF))
        index = h
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32)


def encode(inputs: jnp.ndarray, embeddings: jnp.ndarray, spec: HashGridSpec,
           bound: float = 1.0, max_level=None,
           active_levels: int | None = None,
           compute_dtype=None) -> jnp.ndarray:
    """Encode positions in [-bound, bound]^D → (..., L*C) features.

    max_level ∈ (0, 1] (python float or traced scalar) zero-fills levels
    >= ceil(max_level*L) like the reference's coarse-to-fine masking
    (grid.py:42,53: active = clamp(ceil(max_level*L), 1, L)).

    active_levels (STATIC int) skips the gather/VJP work for levels >= it
    entirely — exact when set to ceil(max_level*L) (the masked levels are
    zero-filled either way); the trainer recompiles per distinct value as the
    coarse-to-fine curriculum unlocks levels (≤ L/2 variants per run).

    compute_dtype=bfloat16 casts the table before the gather (the reference's
    AMP fp16-embedding semantics, grid.py:44-47, with f32 master weights):
    row gathers run 1.8x faster on v5e (330 vs 180 M rows/s) and the backward
    sort's value payloads travel as bf16. Positions, interpolation weights and
    the segment-sum accumulation stay f32.
    """
    if compute_dtype is not None and embeddings.dtype != compute_dtype:
        embeddings = embeddings.astype(compute_dtype)
    x01 = (inputs + bound) / (2.0 * bound)
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, spec.input_dim)
    P = x.shape[0]

    in_range = jnp.all((x >= 0.0) & (x <= 1.0), axis=-1, keepdims=True)

    offsets = spec.offsets
    resolutions = spec.resolutions
    D = spec.input_dim
    L_full = spec.num_levels
    L = L_full if active_levels is None else max(1, min(L_full,
                                                        int(active_levels)))
    n_corners = 1 if spec.interpolation == "nearest" else (1 << D)

    if max_level is None:
        active = None
    else:
        active = jnp.clip(jnp.ceil(jnp.asarray(max_level) * L_full)
                          .astype(jnp.int32), 1, L_full)

    # dense packed prefix: levels whose full lattice fits the table (no hash,
    # no modulo wrap) gather ONE (2^D*C)-wide packed row per site instead of
    # 2^D rows (see HashGridSpec.pack_dense)
    k_pack = 0
    if (spec.pack_dense and spec.vjp_mode == "hist_rows"
            and spec.interpolation != "nearest"):
        while (k_pack < L and resolutions[k_pack] ** D
               <= offsets[k_pack + 1] - offsets[k_pack]):
            k_pack += 1

    base_all, wp_all, pack_tabs, pack_offs = [], [], [], [0]
    for level in range(k_pack):
        res = resolutions[level]
        size_l = offsets[level + 1] - offsets[level]
        if spec.align_corners:
            pos = x * float(res - 1)
            grid0 = jnp.clip(jnp.floor(pos), 0, res - 2)
        else:
            pos = jnp.clip(x * float(res) - 0.5, 0.0, float(res - 1))
            grid0 = jnp.floor(pos)
        frac = pos - grid0
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        grid0 = grid0.astype(jnp.uint32)

        strides = [res ** d for d in range(D)]
        base = jnp.zeros((P,), jnp.uint32)
        for d in range(D):
            base = base + grid0[..., d] * jnp.uint32(strides[d])
        base_all.append(base.astype(jnp.int32) + pack_offs[-1])

        e_l = embeddings[offsets[level]:offsets[level + 1]]
        tabs, ws = [], []
        for corner in range(n_corners):
            off = sum(((corner >> d) & 1) * strides[d] for d in range(D))
            # wrapped rows only back zero-weight clamped corners (see spec)
            tabs.append(jnp.roll(e_l, -off, axis=0))
            w = jnp.ones((P,), dtype=x.dtype)
            for d in range(D):
                f = frac[..., d]
                w = w * (f if (corner >> d) & 1 else (1.0 - f))
            ws.append(w)
        pack_tabs.append(jnp.concatenate(tabs, axis=1))   # (size_l, 2^D*C)
        wp_all.append(jnp.stack(ws, 0))                   # (2^D, P)
        pack_offs.append(pack_offs[-1] + size_l)

    out_packed = None
    if k_pack:
        C = embeddings.shape[1]
        emb_packed = jnp.concatenate(pack_tabs, axis=0)   # (S, 2^D*C)
        idxp = jnp.concatenate(base_all, 0)               # (k*P,)
        pd = jnp.bfloat16 if spec.grad_payload == "bfloat16" else None
        featsp = take_hist_rows(emb_packed, idxp, tuple(pack_offs), k_pack,
                                payload_dtype=pd)         # (k*P, 2^D*C)
        featsp = featsp.reshape(k_pack, P, n_corners, C)
        wp = jnp.stack(wp_all, 0)                         # (k, 2^D, P)
        out_packed = jnp.einsum("kpnc,knp->kpc", featsp, wp)  # (k, P, C)

    # build indices/weights for remaining levels & corners, then ONE batched
    # gather (single take + single segment-sum cotangent per stream)
    idx_all, w_all = [], []
    for level in range(k_pack, L):
        res = resolutions[level]
        hashmap_size = offsets[level + 1] - offsets[level]
        if spec.align_corners:
            pos = x * float(res - 1)
            grid0 = jnp.clip(jnp.floor(pos), 0, res - 2)
        else:
            pos = jnp.clip(x * float(res) - 0.5, 0.0, float(res - 1))
            grid0 = jnp.floor(pos)
        if spec.interpolation == "nearest":
            # single rounded corner, weight 1 (no lerp; occ-query fast path)
            cg = jnp.clip(jnp.round(pos), 0, res - 1).astype(jnp.uint32)
            idx = _corner_index(spec, cg, res, hashmap_size) + offsets[level]
            idx_all.append(idx)
            w_all.append(jnp.ones((P,), dtype=x.dtype))
            continue
        frac = pos - grid0
        if spec.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        grid0 = grid0.astype(jnp.uint32)

        for corner in range(n_corners):
            w = jnp.ones((P, 1), dtype=x.dtype)
            cg = []
            for d in range(D):
                if (corner >> d) & 1:
                    w = w * frac[..., d:d + 1]
                    cg.append(jnp.minimum(grid0[..., d] + 1, res - 1))
                else:
                    w = w * (1.0 - frac[..., d:d + 1])
                    cg.append(grid0[..., d])
            cg = jnp.stack(cg, axis=-1)
            idx = _corner_index(spec, cg, res, hashmap_size) + offsets[level]
            idx_all.append(idx)
            w_all.append(w[..., 0])

    L_u = L - k_pack
    if L_u:
        idx = jnp.stack(idx_all, 0).reshape(L_u * n_corners * P)  # (Lu*8*P,)
        w = jnp.stack(w_all, 0)                                   # (Lu*8, P)

        if spec.vjp_mode == "sort":
            feats = take_accumulating(embeddings, idx)          # (Lu*8*P, C)
        elif spec.vjp_mode == "level_scatter":
            feats = take_level_scatter(embeddings, idx, offsets)
        elif spec.vjp_mode == "sort_pallas":
            feats = take_sorted_pallas(embeddings, idx)
        elif spec.vjp_mode == "sort_pallas_rows":
            pd = jnp.bfloat16 if spec.grad_payload == "bfloat16" else None
            feats = take_sorted_pallas_rows(embeddings, idx, payload_dtype=pd)
        elif spec.vjp_mode == "hist_rows":
            # packed prefix handled above: gather the hashed tail against the
            # sliced table (the slice's transpose pads the cotangent back)
            pd = jnp.bfloat16 if spec.grad_payload == "bfloat16" else None
            off0 = offsets[k_pack]
            offs_sub = tuple(o - off0 for o in offsets[k_pack:L + 1])
            feats = take_hist_rows(embeddings[off0:], idx - off0, offs_sub,
                                   L_u, payload_dtype=pd)
        elif spec.vjp_mode == "mxu_rows":
            pd = jnp.bfloat16 if spec.grad_payload == "bfloat16" else None
            feats = take_mxu_rows(embeddings, idx, offsets, L, payload_dtype=pd)
        else:
            feats = jnp.take(embeddings, idx, axis=0)
        feats = feats.reshape(L_u, n_corners, P, spec.level_dim)
        out_u = jnp.sum(w.reshape(L_u, n_corners, P, 1) * feats, axis=1)
    out_l = (out_packed if not L_u else out_u if not k_pack
             else jnp.concatenate([out_packed, out_u], 0))     # (L, P, C)

    if active is not None:
        level_ids = jax.lax.broadcasted_iota(jnp.int32, (L, 1, 1), 0)
        out_l = jnp.where(level_ids < active, out_l, 0.0)

    out = out_l.transpose(1, 0, 2)                              # (P, L, C)
    if L < L_full:   # statically-truncated levels are zero-filled
        out = jnp.concatenate(
            [out, jnp.zeros((P, L_full - L, spec.level_dim), out.dtype)], 1)
    out = out.reshape(P, L_full * spec.level_dim)
    out = jnp.where(in_range, out, 0.0)
    return out.reshape(*prefix, spec.output_dim)


def weight_decay_loss(embeddings: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Level-wise meaned L2 (zip-nerf style), the loss form of the reference's
    grad_weight_decay kernel (gridencoder.cu:671, grid.py:195-206)."""
    offsets = spec.offsets
    loss = 0.0
    for level in range(spec.num_levels):
        emb = embeddings[offsets[level]:offsets[level + 1]]
        loss = loss + 0.5 * jnp.sum(emb * emb) / emb.shape[0]
    return loss


def total_variation_loss(key: jax.Array, embeddings: jnp.ndarray,
                         spec: HashGridSpec, n_samples: int = 4096,
                         bound: float = 1.0) -> jnp.ndarray:
    """Stochastic TV regularizer: squared feature difference between random
    points and one-cell-offset neighbours per level — the loss form of
    kernel_grad_tv (gridencoder.cu:526)."""
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (n_samples, spec.input_dim),
                           minval=-bound, maxval=bound)
    loss = 0.0
    for level in range(spec.num_levels):
        res = spec.resolutions[level]
        delta = (2.0 * bound) / res
        axis = jax.random.randint(jax.random.fold_in(k2, level),
                                  (n_samples,), 0, spec.input_dim)
        offset = jax.nn.one_hot(axis, spec.input_dim) * delta
        fa = encode(x, embeddings, spec, bound=bound)
        fb = encode(jnp.clip(x + offset, -bound, bound), embeddings, spec,
                    bound=bound)
        sl = slice(level * spec.level_dim, (level + 1) * spec.level_dim)
        loss = loss + jnp.mean((fa[:, sl] - fb[:, sl]) ** 2)
    return loss / spec.num_levels
