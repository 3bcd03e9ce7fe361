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

    @staticmethod
    def export_checkpoint_from_transformers(out_path: str,
                                            pretrained: str | None =
                                            "openai/clip-vit-base-patch32"):
        """Write an OpenAI-layout ViT-B/32 checkpoint usable as exp.clip_ckpt.

        With network access, `pretrained` pulls the real OpenAI weights via
        transformers (the documented acquisition path:
        `python -c "from morpheus_tpu.eval.clip_eval import ImageEncoder;
        ImageEncoder.export_checkpoint_from_transformers('clip_b32.pt')"`).
        pretrained=None builds a random-weight model of the same layout
        (scores then only self-consistent — for tests/air-gapped runs)."""
        import torch
        from transformers import (CLIPVisionConfig,
                                  CLIPVisionModelWithProjection)
        if pretrained:
            tm = CLIPVisionModelWithProjection.from_pretrained(pretrained)
        else:
            cfg = CLIPVisionConfig(hidden_size=768, intermediate_size=3072,
                                   num_hidden_layers=12,
                                   num_attention_heads=12, image_size=224,
                                   patch_size=32, hidden_act="quick_gelu",
                                   projection_dim=512)
            tm = CLIPVisionModelWithProjection(cfg)
        sd = {k: v.detach().float().numpy() for k, v in tm.state_dict().items()}
        torch.save(hf_visual_to_openai(sd, layers=12), out_path)
        return out_path

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


def hf_visual_to_openai(sd: dict, layers: int) -> dict:
    """transformers CLIPVisionModelWithProjection state dict (numpy values) →
    OpenAI CLIP 'visual.*' layout (the layout torch hub / openai-clip
    checkpoints use and convert_clip_visual consumes). q/k/v projections fuse
    into in_proj; visual_projection transposes to (width, out_dim)."""
    V = "vision_model."
    out = {
        "visual.conv1.weight": sd[f"{V}embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd[f"{V}embeddings.class_embedding"],
        "visual.positional_embedding":
            sd[f"{V}embeddings.position_embedding.weight"],
        "visual.ln_pre.weight": sd[f"{V}pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd[f"{V}pre_layrnorm.bias"],
        "visual.ln_post.weight": sd[f"{V}post_layernorm.weight"],
        "visual.ln_post.bias": sd[f"{V}post_layernorm.bias"],
        "visual.proj": np.ascontiguousarray(sd["visual_projection.weight"].T),
    }
    for i in range(layers):
        b = f"{V}encoder.layers.{i}"
        o = f"visual.transformer.resblocks.{i}"
        out[f"{o}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{b}.self_attn.q_proj.weight"],
             sd[f"{b}.self_attn.k_proj.weight"],
             sd[f"{b}.self_attn.v_proj.weight"]], 0)
        out[f"{o}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{b}.self_attn.q_proj.bias"],
             sd[f"{b}.self_attn.k_proj.bias"],
             sd[f"{b}.self_attn.v_proj.bias"]], 0)
        out[f"{o}.attn.out_proj.weight"] = sd[f"{b}.self_attn.out_proj.weight"]
        out[f"{o}.attn.out_proj.bias"] = sd[f"{b}.self_attn.out_proj.bias"]
        for ours, theirs in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            out[f"{o}.{ours}.weight"] = sd[f"{b}.{theirs}.weight"]
            out[f"{o}.{ours}.bias"] = sd[f"{b}.{theirs}.bias"]
        for ours, theirs in (("mlp.c_fc", "mlp.fc1"),
                             ("mlp.c_proj", "mlp.fc2")):
            out[f"{o}.{ours}.weight"] = sd[f"{b}.{theirs}.weight"]
            out[f"{o}.{ours}.bias"] = sd[f"{b}.{theirs}.bias"]
    return out
