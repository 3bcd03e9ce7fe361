"""Converter + loader exercised at the REAL Zero123 scale (VERDICT r2 #3).

The sliced parity tests (test_guidance_parity.py) hit every layer type at
32 channels; this test instantiates the reference torch UNet/VAE at the EXACT
shipped config (/root/reference/pretrained/zero123/
sd-objaverse-finetune-c_concat-256.yaml: model_channels 320, num_heads 8,
ch 128, context 768) plus a ViT-L/14 CLIP visual tower, composes a
105000.ckpt-layout torch checkpoint from their real state_dicts (incl. the
LitEma model_ema.* flattening, DDPM schedule buffers and CLIP text-tower
leftovers — ddpm.py:145-165,520 / modules.py:355-357), drives
guidance/convert.load_zero123_checkpoint end-to-end in strict mode, and
compares one forward of each converted module against torch within f32
tolerance. A real-scale-only converter bug (num_heads=8 head-dim split,
1024-wide CLIP, 320-channel GroupNorm grouping) fails here while the sliced
tests stay green.

~10 GB of host RAM and several minutes of 1-vCPU compute — slow tier.
"""
from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

from test_guidance_parity import _import_ldm, _to_numpy_sd  # noqa: E402

pytestmark = pytest.mark.slow

YAML = "/root/reference/pretrained/zero123/sd-objaverse-finetune-c_concat-256.yaml"


def _shipped_cfg():
    with open(YAML) as f:
        return yaml.safe_load(f)["model"]["params"]


def _build_torch_unet(unet_cfg):
    TorchUNet, _ = _import_ldm()
    torch.manual_seed(0)
    kw = dict(unet_cfg)
    # use_checkpoint only wraps forward in torch's activation checkpointing —
    # identical parameters/outputs, but it requires grad mode; off for the
    # no_grad comparison
    kw["use_checkpoint"] = False
    tm = TorchUNet(**kw)
    tm.eval()
    with torch.no_grad():  # zero_module'd output conv would hide output bugs
        for p in tm.out[2].parameters():
            p.normal_(0, 0.02)
    return tm


def _build_torch_vae(fs_cfg):
    _, TorchVAE = _import_ldm()
    torch.manual_seed(1)
    tm = TorchVAE(ddconfig=fs_cfg["ddconfig"],
                  lossconfig={"target": "torch.nn.Identity"},
                  embed_dim=fs_cfg["embed_dim"])
    tm.eval()
    return tm


def _build_clip_openai_sd():
    """Random-init ViT-L/14 visual tower in the OpenAI 'visual.*' layout the
    checkpoint stores (via transformers → hf_visual_to_openai, the same
    mapping the eval CLIP loader is verified with), plus the transformers
    model for the reference forward."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from morpheus_tpu.eval.clip_eval import hf_visual_to_openai
    torch.manual_seed(2)
    cfg = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                           num_hidden_layers=24, num_attention_heads=16,
                           image_size=224, patch_size=14,
                           hidden_act="quick_gelu", projection_dim=768)
    tm = CLIPVisionModelWithProjection(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in tm.state_dict().items()}
    return hf_visual_to_openai(sd, layers=24), tm


def _compose_checkpoint(tmp_path, unet_tm, vae_tm, clip_sd_visual):
    """Assemble the full LatentDiffusion state_dict exactly as 105000.ckpt
    stores it (zero123_utils.py:22-54 reads pl_sd['state_dict'])."""
    from morpheus_tpu.guidance import convert

    sd = {}
    for k, v in unet_tm.state_dict().items():
        sd[f"model.diffusion_model.{k}"] = v
    for k, v in vae_tm.state_dict().items():
        sd[f"first_stage_model.{k}"] = v
    for k, v in clip_sd_visual.items():  # keys 'visual.*'
        sd[f"cond_stage_model.model.{k}"] = torch.tensor(v)
    # retained text-tower leftovers (modules.py:355-357 deletes only
    # model.transformer)
    sd["cond_stage_model.model.positional_embedding"] = torch.zeros(77, 768)
    sd["cond_stage_model.model.text_projection"] = torch.zeros(768, 768)
    sd["cond_stage_model.model.logit_scale"] = torch.zeros(())
    sd["cond_stage_model.model.token_embedding.weight"] = \
        torch.zeros(49408, 768)
    sd["cond_stage_model.model.ln_final.weight"] = torch.ones(768)
    sd["cond_stage_model.model.ln_final.bias"] = torch.zeros(768)
    # cc_projection (ddpm.py:526-529): Linear(772, 768), identity on CLIP part
    torch.manual_seed(3)
    cc = torch.nn.Linear(772, 768)
    sd["cc_projection.weight"] = cc.weight.detach()
    sd["cc_projection.bias"] = cc.bias.detach()
    # DDPM schedule buffers (recomputed by the loader; presence-only)
    for b in convert._SCHEDULE_BUFFERS:
        sd[b] = (torch.zeros(()) if b == "scale_factor"
                 else torch.zeros(1000))
    # LitEma flattening: dot-stripped copies of every diffusion_model param.
    # Values = live (so forward parity below also covers the EMA-override
    # path, which the loader applies when model_ema.* is present).
    for k, v in unet_tm.state_dict().items():
        sd["model_ema.diffusion_model" + k.replace(".", "")] = v
    sd["model_ema.decay"] = torch.tensor(0.9999)
    sd["model_ema.num_updates"] = torch.tensor(105000)

    path = str(tmp_path / "105000.ckpt")
    torch.save({"state_dict": sd, "global_step": 105000}, path)
    return path, cc


def test_real_scale_checkpoint_roundtrip_and_forward_parity(tmp_path):
    from morpheus_tpu.guidance import zero123 as z123
    from morpheus_tpu.guidance.convert import load_zero123_checkpoint

    p = _shipped_cfg()
    spec = z123.Zero123Spec.from_ldm_config(YAML)
    assert spec.unet_channels == 320 and spec.vae_ch == 128
    assert spec.unet_heads == 8 and spec.context_dim == 768

    unet_tm = _build_torch_unet(p["unet_config"]["params"])
    vae_tm = _build_torch_vae(p["first_stage_config"]["params"])
    clip_sd, clip_tm = _build_clip_openai_sd()
    ckpt, cc = _compose_checkpoint(tmp_path, unet_tm, vae_tm, clip_sd)

    # strict load: every checkpoint key must be consumed or a known leftover
    g = load_zero123_checkpoint(ckpt, spec, strict=True)
    assert g.cc_w.shape == (772, 768)

    # ---- UNet forward at the real operating point: CFG batch of 2, 32² ----
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 8)).astype(np.float32)
    t = np.array([17, 923], np.int64)
    ctx = rng.normal(size=(2, 1, 768)).astype(np.float32)
    with torch.no_grad():
        ref = unet_tm(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t),
                      torch.tensor(ctx)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(z123.apply_unet(g, jnp.asarray(x), jnp.asarray(t),
                                     jnp.asarray(ctx), spec))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)

    # ---- VAE encode moments at the real 256² SDS resolution ----
    img01 = rng.uniform(size=(1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        post = vae_tm.encode(
            torch.tensor((img01 * 2 - 1).transpose(0, 3, 1, 2)))
        ref_mean = post.mean.numpy().transpose(0, 2, 3, 1)
    got_mean = np.asarray(z123.vae_encode_mode(g, jnp.asarray(img01), spec))
    np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-3, atol=2e-3)

    # ---- CLIP ViT-L/14 embed + cc_projection (the conditioning path) ----
    from morpheus_tpu.guidance import clip_vit
    img = rng.uniform(size=(1, 224, 224, 3)).astype(np.float32)
    # bypass resize (input already 224²); normalize as clip_vit.preprocess
    xin = clip_vit.preprocess(jnp.asarray(img))
    with torch.no_grad():
        ref_emb = clip_tm(
            pixel_values=torch.tensor(
                np.asarray(xin).transpose(0, 3, 1, 2))).image_embeds.numpy()
    got_emb = np.asarray(spec.clip_module().apply(
        {"params": g.clip_params}, xin))
    np.testing.assert_allclose(got_emb, ref_emb, rtol=1e-3, atol=2e-3)

    tok = np.concatenate([got_emb[:, None, :],
                          np.array([[[0.1, 0.2, 0.3, 0.4]]], np.float32)], -1)
    with torch.no_grad():
        ref_cc = cc(torch.tensor(tok)).numpy()
    got_cc = np.asarray(jnp.asarray(tok) @ g.cc_w + g.cc_b)
    np.testing.assert_allclose(got_cc, ref_cc, rtol=1e-3, atol=2e-3)
