"""CLIP image-similarity scorer for novel-view evaluation
(reference: models/clip_encoders.py ImageEncoder — ViT-B/32 cosine similarity,
used in render_test_video, morpheus.py:1339-1374)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..guidance import clip_vit


class ImageEncoder:
    """ViT-B/32 image-embedding similarity. Without a checkpoint the weights
    are random — scores are then only self-consistent, not semantically
    meaningful (the real weights come from an OpenAI CLIP state dict)."""

    def __init__(self, params=None, key=None):
        self.model = clip_vit.vit_b32()
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = self.model.init(key, jnp.zeros((1, 224, 224, 3)))["params"]
        self.params = params
        self._embed = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    @staticmethod
    def from_clip_checkpoint(path: str) -> "ImageEncoder":
        """Load from an OpenAI CLIP ViT-B/32 torch state dict."""
        import torch
        from ..guidance.convert import convert_clip_visual
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: (v.float().numpy() if hasattr(v, "numpy") else v)
              for k, v in sd.items()}
        params = convert_clip_visual(sd, prefix="visual.", layers=12)
        return ImageEncoder(params=params)

    def embed(self, images01: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) in [0,1] → L2-normalized embeddings."""
        x = clip_vit.preprocess(jnp.asarray(images01))
        e = self._embed(self.params, x)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    def get_similarity_from_image(self, pred01, gt01) -> float:
        """Cosine similarity (clip_encoders.py:46-50)."""
        a = self.embed(pred01)
        b = self.embed(gt01)
        return float(jnp.sum(a * b, -1).mean())
