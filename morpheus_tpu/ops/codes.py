"""Multi-resolution 1-D temporal feature codes (reference: models/deform_code.py).

The reference samples (1, c, size, 1) volumes with F.grid_sample(align_corners=True)
at x = 2t-1; here that collapses to a direct linear interpolation over the time
axis — no grid_sample needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_multicode(key: jax.Array, sizes, dim: int, dtype=jnp.float32):
    """randn-initialized list of (size, dim) code tables (deform_code.py:13-15)."""
    keys = jax.random.split(key, len(sizes))
    return [jax.random.normal(k, (s, dim), dtype=dtype) for k, s in zip(keys, sizes)]


def multicode_dim(sizes, dim: int) -> int:
    return len(sizes) * dim


def sample_multicode(volumes, t: jnp.ndarray) -> jnp.ndarray:
    """Sample codes at normalized times t (N, 1) ∈ [0,1] → (N, len(volumes)*dim).

    align_corners=True semantics: x = 2t-1 maps to pos = (x+1)/2*(size-1)
    (deform_code.py:20-40).
    """
    t = jnp.clip(t[..., 0], 0.0, 1.0)
    feats = []
    for vol in volumes:
        size = vol.shape[0]
        pos = t * (size - 1)
        i0 = jnp.clip(jnp.floor(pos), 0, size - 1).astype(jnp.int32)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        w = (pos - i0)[..., None]
        feats.append(vol[i0] * (1.0 - w) + vol[i1] * w)
    return jnp.concatenate(feats, axis=-1)
