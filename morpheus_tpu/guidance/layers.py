"""Shared flax building blocks for the Zero123 diffusion stack
(reference: ldm/modules/diffusionmodules/{openaimodel.py,util.py,model.py},
ldm/modules/attention.py). Param names mirror the torch module paths so the
checkpoint converter (convert.py) is a mechanical rename."""
from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding (util.py timestep_embedding):
    [cos|sin] ordering matches the reference (cat([cos, sin]))."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GroupNorm32(nn.Module):
    """GroupNorm with 32 groups computed in f32 (util.py GroupNorm32)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = nn.GroupNorm(num_groups=32, epsilon=self.eps,
                           dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        return out.astype(dtype)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class ResBlock(nn.Module):
    """openaimodel.py ResBlock: GN+SiLU+conv / time-emb add / GN+SiLU+zero-conv
    with conv or identity skip."""
    out_channels: int

    @nn.compact
    def __call__(self, x, emb):
        c_in = x.shape[-1]
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="in_conv")(h)

        e = nn.silu(emb)
        e = nn.Dense(self.out_channels, name="emb_proj")(e)
        h = h + e[:, None, None, :]

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="out_conv",
                    kernel_init=zeros_init, bias_init=zeros_init)(h)

        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    """attention.py CrossAttention: q from x, k/v from context (or x)."""
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, N, inner)
        return nn.Dense(x.shape[-1], name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(b, approximate=False)


class FeedForward(nn.Module):
    """attention.py FeedForward with GEGLU, mult=4."""
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, name="geglu")(x)
        return nn.Dense(dim, name="out")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + CrossAttention(self.heads, self.dim_head, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + FeedForward(name="ff")(nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """attention.py SpatialTransformer (depth=1, conv proj)."""
    heads: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        dim_head = C // self.heads
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        h = nn.Conv(C, (1, 1), name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for d in range(self.depth):
            h = BasicTransformerBlock(self.heads, dim_head,
                                      name=f"block_{d}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), name="proj_out",
                    kernel_init=zeros_init, bias_init=zeros_init)(h)
        return x + h


class Downsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       name="conv")(x)


class Upsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, name="conv")(x)
