"""Zero123 torch checkpoint → flax param pytrees.

Maps the ldm LatentDiffusion state_dict layout (ddpm.py naming:
model.diffusion_model.* / first_stage_model.* / cond_stage_model.model.visual.*
/ cc_projection.*) onto the NHWC flax modules in unet.py / vae.py /
clip_vit.py. Transforms: Linear (out,in)→(in,out); Conv (o,i,kh,kw)→(kh,kw,i,o);
fused CLIP qkv in_proj split into q/k/v.
"""
from __future__ import annotations

import numpy as np


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _lin_nobias(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gn(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gn32(sd, name):
    return {"norm": _gn(sd, name)}


def _ln(sd, name):
    return _gn(sd, name)


# ---- UNet --------------------------------------------------------------------

def _res_block(sd, p):
    out = {
        "in_norm": _gn32(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _lin(sd, f"{p}.emb_layers.1"),
        "out_norm": _gn32(sd, f"{p}.out_layers.0"),
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _spatial_transformer(sd, p, depth=1):
    out = {"norm": _gn32(sd, f"{p}.norm"),
           "proj_in": _conv(sd, f"{p}.proj_in"),
           "proj_out": _conv(sd, f"{p}.proj_out")}
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        out[f"block_{d}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"),
            "attn1": {
                "to_q": _lin_nobias(sd, f"{b}.attn1.to_q"),
                "to_k": _lin_nobias(sd, f"{b}.attn1.to_k"),
                "to_v": _lin_nobias(sd, f"{b}.attn1.to_v"),
                "to_out": _lin(sd, f"{b}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": _lin_nobias(sd, f"{b}.attn2.to_q"),
                "to_k": _lin_nobias(sd, f"{b}.attn2.to_k"),
                "to_v": _lin_nobias(sd, f"{b}.attn2.to_v"),
                "to_out": _lin(sd, f"{b}.attn2.to_out.0"),
            },
            "ff": {"geglu": {"proj": _lin(sd, f"{b}.ff.net.0.proj")},
                   "out": _lin(sd, f"{b}.ff.net.2")},
        }
    return out


def convert_unet(sd, prefix="model.diffusion_model.",
                 channel_mult=(1, 2, 4, 4), num_res_blocks=2,
                 attention_ds=(1, 2, 4)):
    """ldm openaimodel UNetModel state_dict → unet.UNetModel params."""
    P = prefix
    params = {
        "time_embed_0": _lin(sd, f"{P}time_embed.0"),
        "time_embed_2": _lin(sd, f"{P}time_embed.2"),
        "input_conv": _conv(sd, f"{P}input_blocks.0.0"),
        "out_norm": _gn32(sd, f"{P}out.0"),
        "out_conv": _conv(sd, f"{P}out.2"),
    }
    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for nr in range(num_res_blocks):
            params[f"in_{level}_{nr}_res"] = _res_block(
                sd, f"{P}input_blocks.{idx}.0")
            if ds in attention_ds:
                params[f"in_{level}_{nr}_attn"] = _spatial_transformer(
                    sd, f"{P}input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            params[f"down_{level}"] = {
                "conv": _conv(sd, f"{P}input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    params["mid_res1"] = _res_block(sd, f"{P}middle_block.0")
    params["mid_attn"] = _spatial_transformer(sd, f"{P}middle_block.1")
    params["mid_res2"] = _res_block(sd, f"{P}middle_block.2")

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for nr in range(num_res_blocks + 1):
            params[f"out_{level}_{nr}_res"] = _res_block(
                sd, f"{P}output_blocks.{idx}.0")
            sub = 1
            if ds in attention_ds:
                params[f"out_{level}_{nr}_attn"] = _spatial_transformer(
                    sd, f"{P}output_blocks.{idx}.{sub}")
                sub += 1
            if level and nr == num_res_blocks:
                params[f"up_{level}"] = {
                    "conv": _conv(sd, f"{P}output_blocks.{idx}.{sub}.conv")}
                ds //= 2
            idx += 1
    return params


# ---- VAE ----------------------------------------------------------------------

def _vae_res(sd, p):
    out = {"norm1": _gn(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
           "norm2": _gn(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2")}
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {"norm": _gn(sd, f"{p}.norm"), "q": _conv(sd, f"{p}.q"),
            "k": _conv(sd, f"{p}.k"), "v": _conv(sd, f"{p}.v"),
            "proj_out": _conv(sd, f"{p}.proj_out")}


def convert_vae(sd, prefix="first_stage_model.", ch_mult=(1, 2, 4, 4),
                num_res_blocks=2):
    P = prefix
    enc = {"conv_in": _conv(sd, f"{P}encoder.conv_in"),
           "norm_out": _gn(sd, f"{P}encoder.norm_out"),
           "conv_out": _conv(sd, f"{P}encoder.conv_out"),
           "mid_block_1": _vae_res(sd, f"{P}encoder.mid.block_1"),
           "mid_attn_1": _vae_attn(sd, f"{P}encoder.mid.attn_1"),
           "mid_block_2": _vae_res(sd, f"{P}encoder.mid.block_2")}
    for level in range(len(ch_mult)):
        for nr in range(num_res_blocks):
            enc[f"down_{level}_block_{nr}"] = _vae_res(
                sd, f"{P}encoder.down.{level}.block.{nr}")
        if level != len(ch_mult) - 1:
            enc[f"down_{level}_downsample"] = _conv(
                sd, f"{P}encoder.down.{level}.downsample.conv")

    dec = {"conv_in": _conv(sd, f"{P}decoder.conv_in"),
           "norm_out": _gn(sd, f"{P}decoder.norm_out"),
           "conv_out": _conv(sd, f"{P}decoder.conv_out"),
           "mid_block_1": _vae_res(sd, f"{P}decoder.mid.block_1"),
           "mid_attn_1": _vae_attn(sd, f"{P}decoder.mid.attn_1"),
           "mid_block_2": _vae_res(sd, f"{P}decoder.mid.block_2")}
    for level in range(len(ch_mult)):
        for nr in range(num_res_blocks + 1):
            dec[f"up_{level}_block_{nr}"] = _vae_res(
                sd, f"{P}decoder.up.{level}.block.{nr}")
        if level != 0:
            dec[f"up_{level}_upsample"] = _conv(
                sd, f"{P}decoder.up.{level}.upsample.conv")

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _conv(sd, f"{P}quant_conv"),
            "post_quant_conv": _conv(sd, f"{P}post_quant_conv")}


# ---- CLIP image tower ----------------------------------------------------------

def convert_clip_visual(sd, prefix="cond_stage_model.model.visual.",
                        layers=24):
    """OpenAI CLIP 'visual' tower state_dict → clip_vit params. The fused
    attn.in_proj is split into q/k/v."""
    P = prefix
    params = {
        "conv1": {"kernel": np.ascontiguousarray(
            np.asarray(sd[f"{P}conv1.weight"]).transpose(2, 3, 1, 0))},
        "class_embedding": np.asarray(sd[f"{P}class_embedding"]),
        "positional_embedding": np.asarray(sd[f"{P}positional_embedding"]),
        "ln_pre": _ln(sd, f"{P}ln_pre"),
        "ln_post": _ln(sd, f"{P}ln_post"),
        "proj": np.asarray(sd[f"{P}proj"]),
    }
    for i in range(layers):
        b = f"{P}transformer.resblocks.{i}"
        in_w = np.asarray(sd[f"{b}.attn.in_proj_weight"])     # (3C, C)
        in_b = np.asarray(sd[f"{b}.attn.in_proj_bias"])
        C = in_w.shape[1]
        qw, kw, vw = in_w[:C], in_w[C:2 * C], in_w[2 * C:]
        qb, kb, vb = in_b[:C], in_b[C:2 * C], in_b[2 * C:]
        params[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{b}.ln_1"),
            "ln_2": _ln(sd, f"{b}.ln_2"),
            "attn": {
                "q_proj": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
                "k_proj": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
                "v_proj": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
                "out_proj": _lin(sd, f"{b}.attn.out_proj"),
            },
            "mlp_fc": _lin(sd, f"{b}.mlp.c_fc"),
            "mlp_proj": _lin(sd, f"{b}.mlp.c_proj"),
        }
    return params


class _TrackedDict(dict):
    """state_dict wrapper recording consumed keys (reads via [] only;
    `in` probes like the skip_connection checks don't count)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# DDPM registers these schedule buffers into the checkpoint (ddpm.py:145-165,
# :520); they carry no weights we need (the schedule is recomputed from the
# spec) — tolerated by the strict check.
_SCHEDULE_BUFFERS = (
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2", "logvar", "scale_factor",
)
# FrozenCLIPImageEmbedder deletes only the text transformer
# (modules.py:355-357) — these text-side leftovers remain in the checkpoint
# and are unused by the image tower.
_CLIP_TEXT_LEFTOVERS = (
    "cond_stage_model.model.positional_embedding",
    "cond_stage_model.model.text_projection",
    "cond_stage_model.model.logit_scale",
    "cond_stage_model.model.token_embedding.weight",
    "cond_stage_model.model.ln_final.weight",
    "cond_stage_model.model.ln_final.bias",
)


def convert_state_dict(sd: dict, spec=None, strict: bool = False):
    """ldm LatentDiffusion state_dict (numpy values) → (unet, vae, clip,
    cc_w, cc_b) param trees. strict=True verifies every checkpoint key is
    either consumed or a known schedule/EMA/text-tower leftover — catching
    name-mapping drift against the real 105000.ckpt layout."""
    from .zero123 import Zero123Spec

    spec = spec or Zero123Spec()
    sd = _TrackedDict(sd)

    # EMA weights: ldm stores model_ema.diffusion_modelXXX flattened with dots
    # stripped; the reference copies EMA into the live model
    # (zero123_utils.py:39-44). Apply the same when present.
    ema_keys = {k for k in sd if k.startswith("model_ema.")}
    if ema_keys:
        live_keys = [k for k in sd if k.startswith("model.diffusion_model.")]
        for k in live_keys:
            flat = "model_ema." + k[len("model."):].replace(".", "")
            if flat in sd:
                dict.__setitem__(sd, k, sd[flat])  # consumes the EMA key

    unet_params = convert_unet(sd, channel_mult=tuple(spec.unet_mult))
    vae_params = convert_vae(sd)
    clip_params = convert_clip_visual(sd, layers=spec.clip_layers)
    cc_w = np.ascontiguousarray(np.asarray(sd["cc_projection.weight"]).T)
    cc_b = np.asarray(sd["cc_projection.bias"])

    if strict:
        tolerated = set(_SCHEDULE_BUFFERS) | set(_CLIP_TEXT_LEFTOVERS) \
            | {"model_ema.decay", "model_ema.num_updates"}
        # EMA params of biasless/buffer entries the live copy didn't touch
        leftover = {k for k in sd
                    if k not in sd.consumed and k not in tolerated}
        if leftover:
            raise ValueError(
                f"{len(leftover)} unconsumed checkpoint keys, e.g. "
                f"{sorted(leftover)[:8]}")
    return unet_params, vae_params, clip_params, cc_w, cc_b


def load_zero123_checkpoint(path: str, spec=None, strict: bool = True):
    """Load the reference 105000.ckpt (torch.save of a lightning dict with
    'state_dict'; zero123_utils.py:22-54) into a Zero123Guidance."""
    import torch
    import jax.numpy as jnp
    from .zero123 import Zero123Guidance, Zero123Spec

    spec = spec or Zero123Spec()
    pl_sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = pl_sd["state_dict"] if "state_dict" in pl_sd else pl_sd
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}

    unet_params, vae_params, clip_params, cc_w, cc_b = convert_state_dict(
        sd, spec, strict=strict)

    import jax
    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return Zero123Guidance(
        unet_params=to_jnp(unet_params), vae_params=to_jnp(vae_params),
        clip_params=to_jnp(clip_params), cc_w=jnp.asarray(cc_w),
        cc_b=jnp.asarray(cc_b),
        alphas_cumprod=jnp.asarray(spec.diffusion.alphas_cumprod, jnp.float32))
