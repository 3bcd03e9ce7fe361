"""SD 1.x UNet ε-predictor, Zero123 configuration
(reference: ldm/modules/diffusionmodules/openaimodel.py:414-760 with
in_channels=8 (4 noisy + 4 concat latent), out 4, model_channels 320,
channel_mult (1,2,4,4), num_res_blocks 2, attention at ds ∈ {1,2,4},
spatial transformer depth 1, context_dim 768, num_heads 8, legacy=False).

NHWC layout (TPU-native); the converter transposes torch NCHW conv kernels.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import (Downsample, GroupNorm32, ResBlock, SpatialTransformer,
                     Upsample, timestep_embedding, zeros_init)


class UNetModel(nn.Module):
    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    context_dim: int = 768
    transformer_depth: int = 1

    @nn.compact
    def __call__(self, x, timesteps, context):
        """x: (B, H, W, in_ch); timesteps: (B,); context: (B, L, 768)."""
        mc = self.model_channels
        # sin/cos math in f32 (large t x freq args), then follow x's compute
        # dtype so a bf16 pass stays bf16 end-to-end (guidance.compute_dtype)
        t_emb = timestep_embedding(timesteps, mc).astype(x.dtype)
        emb = nn.Dense(mc * 4, name="time_embed_0")(t_emb)
        emb = nn.Dense(mc * 4, name="time_embed_2")(nn.silu(emb))

        hs = []
        h = nn.Conv(mc, (3, 3), padding=1, name="input_conv")(x)
        hs.append(h)
        ds = 1
        # input blocks
        for level, mult in enumerate(self.channel_mult):
            for nr in range(self.num_res_blocks):
                h = ResBlock(mult * mc,
                             name=f"in_{level}_{nr}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpatialTransformer(
                        self.num_heads, self.transformer_depth,
                        name=f"in_{level}_{nr}_attn")(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        # middle
        h = ResBlock(h.shape[-1], name="mid_res1")(h, emb)
        h = SpatialTransformer(self.num_heads, self.transformer_depth,
                               name="mid_attn")(h, context)
        h = ResBlock(h.shape[-1], name="mid_res2")(h, emb)

        # output blocks
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for nr in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(mult * mc,
                             name=f"out_{level}_{nr}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpatialTransformer(
                        self.num_heads, self.transformer_depth,
                        name=f"out_{level}_{nr}_attn")(h, context)
                if level and nr == self.num_res_blocks:
                    h = Upsample(name=f"up_{level}")(h)
                    ds //= 2

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="out_conv",
                       kernel_init=zeros_init, bias_init=zeros_init)(h)
