#!/usr/bin/env python
"""Microbenchmark of hash-grid gather/accumulate modes at the bench-point
stream shape (10 levels x 8 corners x 40960 points, C=4 fused sdf+color
table). Prints fwd / fwd+bwd / 2nd-order wall times per mode.

Usage: python scripts/bench_gather.py [mode ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from morpheus_tpu.ops import hashgrid


def main():
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()

    spec = hashgrid.HashGridSpec(input_dim=3, num_levels=16, level_dim=4,
                                 base_resolution=16, log2_hashmap_size=15,
                                 desired_resolution=128)
    L_ACTIVE, P = 10, 40960
    offsets = spec.offsets
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (spec.table_size, spec.level_dim)) * 0.1
    # level-major stream: level l block in [l*8P, (l+1)*8P), values within
    # that level's table slice — the exact layout encode() builds
    ks = jax.random.split(key, L_ACTIVE)
    idx = jnp.concatenate([
        jax.random.randint(ks[l], (8 * P,), 0,
                           offsets[l + 1] - offsets[l]) + offsets[l]
        for l in range(L_ACTIVE)]).astype(jnp.int32)
    N = idx.shape[0]

    modes = sys.argv[1:] or ["rows", "hist_rows", "mxu_rows", "mxu_rows_bf16"]

    def make(mode):
        if mode == "rows":
            f = lambda e: jnp.take(e, idx, axis=0)
        elif mode == "hist_rows":
            f = lambda e: hashgrid.take_hist_rows(e, idx, offsets, L_ACTIVE)
        elif mode == "mxu_rows":
            f = lambda e: hashgrid.take_mxu_rows(e, idx, offsets, L_ACTIVE)
        elif mode == "mxu_rows_bf16":
            f = lambda e: hashgrid.take_mxu_rows(e, idx, offsets, L_ACTIVE,
                                                 payload_dtype=jnp.bfloat16)
        elif mode == "sort_pallas_rows":
            f = lambda e: hashgrid.take_sorted_pallas_rows(e, idx)
        else:
            raise SystemExit(f"unknown mode {mode}")
        return f

    def timeit(fn, *args, reps=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    ct = jax.random.normal(jax.random.PRNGKey(1), (N, spec.level_dim))

    for mode in modes:
        f = make(mode)
        fwd = jax.jit(lambda e: jnp.sum(f(e) * ct))
        bwd = jax.jit(jax.grad(lambda e: jnp.sum(f(e) * ct)))

        def second(e):
            # grad-of-grad: the double-transpose path (normals hit this)
            g = jax.grad(lambda ee: jnp.sum(f(ee) * ct))(e)
            return jnp.sum(g * g)
        snd = jax.jit(jax.grad(second))

        tf = timeit(fwd, emb)
        tb = timeit(bwd, emb)
        ts = timeit(snd, emb, reps=10)
        # correctness vs plain take
        ref = jnp.take(emb, idx, axis=0)
        got = jax.jit(f)(emb)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"{mode:18s} fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms   "
              f"2nd {ts:7.2f} ms   max|err| {err:.2e}  "
              f"({N / tf * 1e-3 / 1e3:.0f}M rows/s fwd)")


if __name__ == "__main__":
    main()
