"""Plain ReLU MLPs with optional SAL/IGR geometric init
(reference: models/decoders.py:9-64).

Parameters are plain pytrees {'w': [(in,out)...], 'b': [(out,)...]}; apply() is a
pure function so it jits/vmaps/shards freely and keeps every layer a single MXU
matmul.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def init_mlp(key: jax.Array, dim_in: int, dim_out: int, dim_hidden: int,
             num_layers: int, geo_init: bool = False, inside_outside: bool = False,
             geo_bias: float = 0.5, dtype=jnp.float32):
    """Mirrors decoders.py:20-57. Non-geo layers get torch nn.Linear default init
    (U(-1/sqrt(in), 1/sqrt(in)) for both weight and bias)."""
    ws, bs = [], []
    for l in range(num_layers):
        d_in = dim_in if l == 0 else dim_hidden
        d_out = dim_out if l == num_layers - 1 else dim_hidden
        key, kw, kb = jax.random.split(key, 3)
        if geo_init:
            if l == num_layers - 1:
                mean = math.sqrt(math.pi) / math.sqrt(d_in)
                if inside_outside:
                    mean = -mean
                w = mean + 1e-4 * jax.random.normal(kw, (d_in, d_out), dtype)
                b = jnp.full((d_out,), geo_bias if inside_outside else -geo_bias,
                             dtype)
            elif l == 0:
                # only the first 3 input dims (xyz) carry signal at init
                std = math.sqrt(2.0) / math.sqrt(d_out)
                w = jnp.zeros((d_in, d_out), dtype)
                w = w.at[:3, :].set(std * jax.random.normal(kw, (3, d_out), dtype))
                b = jnp.zeros((d_out,), dtype)
            else:
                std = math.sqrt(2.0) / math.sqrt(d_out)
                w = std * jax.random.normal(kw, (d_in, d_out), dtype)
                b = jnp.zeros((d_out,), dtype)
        else:
            bound = 1.0 / math.sqrt(d_in)
            w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
            b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
        ws.append(w)
        bs.append(b)
    return {"w": ws, "b": bs}


def apply_mlp(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """compute_dtype=bfloat16 runs the matmuls on the MXU in bf16 with f32
    accumulation and returns f32 — the TPU analogue of the reference's AMP
    autocast (morpheus.py:158, grid.py:44-47: half-precision compute,
    full-precision master weights/positions)."""
    n = len(params["w"])
    out_dtype = x.dtype
    if compute_dtype is not None and compute_dtype != x.dtype:
        x = x.astype(compute_dtype)
    for l in range(n):
        w = params["w"][l]
        b = params["b"][l]
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        if l != n - 1:
            x = jax.nn.relu(x)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
    return x.astype(out_dtype)
