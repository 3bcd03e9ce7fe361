"""AutoencoderKL first stage (reference: ldm/models/autoencoder.py:285 +
ldm/modules/diffusionmodules/model.py Encoder/Decoder; SD VAE config:
ch=128, ch_mult (1,2,4,4), 2 res blocks, no attn except bottleneck, z=4,
double_z, scale_factor 0.18215). NHWC."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

SCALE_FACTOR = 0.18215


class VAEResBlock(nn.Module):
    """model.py ResnetBlock: GN(eps 1e-6)+swish+conv ×2, 1x1 nin shortcut."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """model.py AttnBlock: single-head full self-attention over pixels."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(C, (1, 1), name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), name="v")(h).reshape(B, H * W, C)
        attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(C), axis=-1)
        h = (attn @ v).reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), name="proj_out")(h)
        return x + h


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)
        for level, mult in enumerate(self.ch_mult):
            for nr in range(self.num_res_blocks):
                h = VAEResBlock(self.ch * mult,
                                name=f"down_{level}_block_{nr}")(h)
            if level != len(self.ch_mult) - 1:
                # model.py Downsample: asymmetric pad (0,1,0,1) + stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding="VALID",
                            name=f"down_{level}_downsample")(h)
        h = VAEResBlock(h.shape[-1], name="mid_block_1")(h)
        h = VAEAttnBlock(name="mid_attn_1")(h)
        h = VAEResBlock(h.shape[-1], name="mid_block_2")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")(z)
        h = VAEResBlock(block_in, name="mid_block_1")(h)
        h = VAEAttnBlock(name="mid_attn_1")(h)
        h = VAEResBlock(block_in, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            ch_out = self.ch * self.ch_mult[level]
            for nr in range(self.num_res_blocks + 1):
                h = VAEResBlock(ch_out, name=f"up_{level}_block_{nr}")(h)
            if level != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1,
                            name=f"up_{level}_upsample")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode → (mean, logvar) via quant_conv; decode via post_quant_conv
    (autoencoder.py:285-330)."""
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2

    def setup(self):
        self.encoder = Encoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks)
        self.decoder = Decoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1),
                                       name="post_quant_conv")

    def encode_moments(self, x):
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x):
        """Distribution mode (= mean); reference uses .mode() for SDS latents
        (zero123_utils.py:96) and get_first_stage_encoding applies the scale."""
        return self.encode_moments(x)[0]

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        return self.decode(self.encode_mode(x))
