#!/usr/bin/env python
"""Microbenchmark: does growing the hash-table size (so more levels are
dense and oct-packable, ops/hashgrid.HashGridSpec.pack_dense) pay on v5e?

For each (table_rows, row_width) it measures
  - forward `jnp.take` of S site-rows (the packed-dense forward is ONE
    row/site instead of 8),
  - backward candidates for the packed cotangent accumulate:
      * XLA scatter-add (`zeros.at[idx].add(ct)`) — duplicates allowed,
      * sort + segment-sum (jax.ops.segment_sum over sorted indices),
    (the hist_pallas one-hot kernel is omitted above 2^15 rows: its MXU
     FLOPs scale linearly with table height and are already ~half the step
     at 2^15 — PARITY.md item 13).

Decision input for raising model.grid_log2_hashmap_size on TPU: hashed
levels cost 8 row-transactions/site fwd AND bwd; a dense+packed level costs
1 wider row each way. Rows are transaction-bound (~149M rows/s measured
round 2), so if the rates below hold at 2^17-2^19 rows, levels 6-11 of the
reference 16-level grid (res 37-73) flip from 8 gathers to 1.

Usage: python scripts/bench_dense_scale.py [--smoke]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    smoke = "--smoke" in sys.argv
    S = 4096 if smoke else 49152          # sites/step at the bench point
    tables = [1 << 12] if smoke else [1 << 15, 1 << 17, 1 << 19]
    widths = [8] if smoke else [2, 8, 16, 32]   # f32 ch: C2, oct-C2, oct-C4...
    key = jax.random.PRNGKey(0)

    print(f"sites={S}  device={jax.devices()[0]}")
    for T in tables:
        for W in widths:
            kt, ki, kc = jax.random.split(jax.random.fold_in(key, T * W), 3)
            emb = jax.random.normal(kt, (T, W), jnp.float32)
            idx = jax.random.randint(ki, (S,), 0, T, jnp.int32)
            ct = jax.random.normal(kc, (S, W), jnp.float32)

            from morpheus_tpu.ops.hashgrid import _segsum_impl

            fwd = jax.jit(lambda e, i: jnp.take(e, i, axis=0))
            scat = jax.jit(lambda c, i: jnp.zeros((T, W), jnp.float32)
                           .at[i].add(c))
            # the repo's scatter-free sort+cumsum+searchsorted segment sum
            # (ops/hashgrid._segsum_impl — the 'sort' vjp_mode backend)
            sseg = jax.jit(lambda c, i: _segsum_impl(c, i, T))

            tf = timeit(fwd, emb, idx)
            tsc = timeit(scat, ct, idx)
            tss = timeit(sseg, ct, idx)
            rate = S / tf * 1e-3 / 1e3
            print(f"T=2^{T.bit_length()-1:2d} W={W:2d}ch "
                  f"({W*4:3d}B/row): take {tf:6.2f} ms ({rate:5.0f}M rows/s, "
                  f"{S*W*4/tf/1e6:6.1f} GB/s)  scatter-add {tsc:6.2f} ms  "
                  f"sort+segsum {tss:6.2f} ms")


if __name__ == "__main__":
    main()
