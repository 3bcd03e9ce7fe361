"""CLIP ViT-L/14 image tower (reference: FrozenCLIPImageEmbedder,
ldm/modules/encoders/modules.py:343-383 — OpenAI CLIP 'ViT-L/14' encode_image
with the 768-d projection; the text tower is deleted).

Also used (as ViT-B/32) for the CLIP similarity eval metric
(models/clip_encoders.py). NHWC input, 224×224, CLIP normalization applied by
the caller (preprocess())."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """images (B, H, W, 3) in [0,1] → resized 224² + CLIP-normalized.
    (reference uses kornia bicubic resize + normalize, modules.py:361-372)."""
    import jax
    B = images.shape[0]
    x = jax.image.resize(images, (B, 224, 224, 3), method="bicubic")
    return (x - CLIP_MEAN) / CLIP_STD


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        dh = C // self.heads
        q = nn.Dense(C, name="q_proj")(x).reshape(B, N, self.heads, dh)
        k = nn.Dense(C, name="k_proj")(x).reshape(B, N, self.heads, dh)
        v = nn.Dense(C, name="v_proj")(x).reshape(B, N, self.heads, dh)
        import jax
        out = jax.nn.dot_product_attention(q, k, v)
        return nn.Dense(C, name="out_proj")(out.reshape(B, N, C))


class CLIPBlock(nn.Module):
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = x + CLIPAttention(self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x))
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim, name="mlp_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], name="mlp_proj")(h)
        return x + h


class CLIPVisionTransformer(nn.Module):
    """OpenAI CLIP VisionTransformer. ViT-L/14: width 1024, layers 24,
    heads 16, patch 14, out 768. ViT-B/32: width 768, layers 12, heads 12,
    patch 32, out 512."""
    width: int = 1024
    layers: int = 24
    heads: int = 16
    patch: int = 14
    out_dim: int = 768

    @nn.compact
    def __call__(self, x):
        """x: (B, 224, 224, 3) CLIP-normalized → (B, out_dim) embedding."""
        B = x.shape[0]
        h = nn.Conv(self.width, (self.patch, self.patch),
                    strides=self.patch, use_bias=False, name="conv1")(x)
        h = h.reshape(B, -1, self.width)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (self.width,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.width)), h], axis=1)
        n_tok = h.shape[1]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02), (n_tok, self.width))
        h = h + pos
        h = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(h)
        for i in range(self.layers):
            h = CLIPBlock(self.heads, self.width * 4,
                          name=f"resblock_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.out_dim))
        return h @ proj


def vit_l14() -> CLIPVisionTransformer:
    return CLIPVisionTransformer(width=1024, layers=24, heads=16, patch=14,
                                 out_dim=768)


def vit_b32() -> CLIPVisionTransformer:
    return CLIPVisionTransformer(width=768, layers=12, heads=12, patch=32,
                                 out_dim=512)
