"""Zero123 converter vs the REAL 105000.ckpt key layout.

The actual checkpoint isn't shipped (reference pretrained/zero123/ holds only
the yaml), so this test reconstructs its exact state_dict key inventory from
the reference module trees — UNetModel (ldm/modules/diffusionmodules/
openaimodel.py:414), AutoencoderKL (ldm/models/autoencoder.py:285 with
Encoder/Decoder from ldm/modules/diffusionmodules/model.py:368/462), the CLIP
ViT-L/14 visual tower retained by FrozenCLIPImageEmbedder (ldm/modules/
encoders/modules.py:343-383, text transformer deleted), cc_projection
(ddpm.py:526-529), the DDPM schedule buffers (ddpm.py:145-165,520) and LitEma's
dot-stripped model_ema.* flattening — then asserts conversion consumes every
key (strict) and that the converted trees match the flax modules' expected
structure exactly (via jax.eval_shape on module.init).

Shape-only / fast complement: tests/test_zero123_real_scale.py composes the
same layout from the state_dicts of ACTUALLY INSTANTIATED reference torch
modules at the shipped yaml's scale and adds forward parity — the
authoritative check that this hand-built inventory can no longer drift from
the real one."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morpheus_tpu.guidance import convert, vae, zero123 as z123

pytestmark = pytest.mark.slow

MC = 320                      # model_channels
MULT = (1, 2, 4, 4)
EMB = 4 * MC                  # time embedding dim
CTX = 768
NRB = 2


def _conv(sd, name, o, i, k):
    sd[f"{name}.weight"] = (o, i, k, k)
    sd[f"{name}.bias"] = (o,)


def _lin(sd, name, o, i, bias=True):
    sd[f"{name}.weight"] = (o, i)
    if bias:
        sd[f"{name}.bias"] = (o,)


def _norm(sd, name, c):
    sd[f"{name}.weight"] = (c,)
    sd[f"{name}.bias"] = (c,)


def _res_block(sd, p, cin, cout):
    _norm(sd, f"{p}.in_layers.0", cin)
    _conv(sd, f"{p}.in_layers.2", cout, cin, 3)
    _lin(sd, f"{p}.emb_layers.1", cout, EMB)
    _norm(sd, f"{p}.out_layers.0", cout)
    _conv(sd, f"{p}.out_layers.3", cout, cout, 3)
    if cin != cout:
        _conv(sd, f"{p}.skip_connection", cout, cin, 1)


def _spatial_transformer(sd, p, ch):
    _norm(sd, f"{p}.norm", ch)
    _conv(sd, f"{p}.proj_in", ch, ch, 1)
    b = f"{p}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        _norm(sd, f"{b}.{n}", ch)
    for attn, kdim in (("attn1", ch), ("attn2", CTX)):
        _lin(sd, f"{b}.{attn}.to_q", ch, ch, bias=False)
        _lin(sd, f"{b}.{attn}.to_k", ch, kdim, bias=False)
        _lin(sd, f"{b}.{attn}.to_v", ch, kdim, bias=False)
        _lin(sd, f"{b}.{attn}.to_out.0", ch, ch)
    _lin(sd, f"{b}.ff.net.0.proj", ch * 8, ch)   # GEGLU: 2 * (4*ch)
    _lin(sd, f"{b}.ff.net.2", ch, ch * 4)
    _conv(sd, f"{p}.proj_out", ch, ch, 1)


def unet_keys():
    """model.diffusion_model.* shapes (openaimodel.py:414-636, Zero123 config:
    in 8ch, 320 base, mult [1,2,4,4], attn ds {1,2,4}, 1 transformer depth)."""
    sd = {}
    P = "model.diffusion_model."
    _lin(sd, f"{P}time_embed.0", EMB, MC)
    _lin(sd, f"{P}time_embed.2", EMB, EMB)
    _conv(sd, f"{P}input_blocks.0.0", MC, 8, 3)

    skips = [MC]
    ch = MC
    ds = 1
    idx = 1
    for level, mult in enumerate(MULT):
        for _ in range(NRB):
            _res_block(sd, f"{P}input_blocks.{idx}.0", ch, mult * MC)
            ch = mult * MC
            if ds in (1, 2, 4):
                _spatial_transformer(sd, f"{P}input_blocks.{idx}.1", ch)
            skips.append(ch)
            idx += 1
        if level != len(MULT) - 1:
            _conv(sd, f"{P}input_blocks.{idx}.0.op", ch, ch, 3)
            skips.append(ch)
            idx += 1
            ds *= 2

    _res_block(sd, f"{P}middle_block.0", ch, ch)
    _spatial_transformer(sd, f"{P}middle_block.1", ch)
    _res_block(sd, f"{P}middle_block.2", ch, ch)

    idx = 0
    for level in reversed(range(len(MULT))):
        out_ch = MULT[level] * MC
        for nr in range(NRB + 1):
            _res_block(sd, f"{P}output_blocks.{idx}.0", ch + skips.pop(),
                       out_ch)
            ch = out_ch
            sub = 1
            if ds in (1, 2, 4):
                _spatial_transformer(sd, f"{P}output_blocks.{idx}.{sub}", ch)
                sub += 1
            if level and nr == NRB:
                _conv(sd, f"{P}output_blocks.{idx}.{sub}.conv", ch, ch, 3)
                ds //= 2
            idx += 1

    _norm(sd, f"{P}out.0", MC)
    _conv(sd, f"{P}out.2", 4, MC, 3)
    return sd


def _vae_res(sd, p, cin, cout):
    _norm(sd, f"{p}.norm1", cin)
    _conv(sd, f"{p}.conv1", cout, cin, 3)
    _norm(sd, f"{p}.norm2", cout)
    _conv(sd, f"{p}.conv2", cout, cout, 3)
    if cin != cout:
        _conv(sd, f"{p}.nin_shortcut", cout, cin, 1)


def _vae_attn(sd, p, c):
    _norm(sd, f"{p}.norm", c)
    for n in ("q", "k", "v", "proj_out"):
        _conv(sd, f"{p}.{n}", c, c, 1)


def vae_keys():
    """first_stage_model.* shapes (autoencoder.py:285-330 + model.py:368-545:
    ch 128, mult [1,2,4,4], 2 res blocks, z 4, double_z)."""
    sd = {}
    P = "first_stage_model."
    ch0, mult = 128, (1, 2, 4, 4)
    _conv(sd, f"{P}encoder.conv_in", ch0, 3, 3)
    ch = ch0
    for level, m in enumerate(mult):
        for nr in range(2):
            _vae_res(sd, f"{P}encoder.down.{level}.block.{nr}", ch, m * ch0)
            ch = m * ch0
        if level != len(mult) - 1:
            _conv(sd, f"{P}encoder.down.{level}.downsample.conv", ch, ch, 3)
    _vae_res(sd, f"{P}encoder.mid.block_1", ch, ch)
    _vae_attn(sd, f"{P}encoder.mid.attn_1", ch)
    _vae_res(sd, f"{P}encoder.mid.block_2", ch, ch)
    _norm(sd, f"{P}encoder.norm_out", ch)
    _conv(sd, f"{P}encoder.conv_out", 8, ch, 3)

    _conv(sd, f"{P}decoder.conv_in", ch, 4, 3)
    _vae_res(sd, f"{P}decoder.mid.block_1", ch, ch)
    _vae_attn(sd, f"{P}decoder.mid.attn_1", ch)
    _vae_res(sd, f"{P}decoder.mid.block_2", ch, ch)
    for level in reversed(range(len(mult))):
        out_ch = mult[level] * ch0
        for nr in range(3):
            _vae_res(sd, f"{P}decoder.up.{level}.block.{nr}", ch, out_ch)
            ch = out_ch
        if level != 0:
            _conv(sd, f"{P}decoder.up.{level}.upsample.conv", ch, ch, 3)
    _norm(sd, f"{P}decoder.norm_out", ch)
    _conv(sd, f"{P}decoder.conv_out", 3, ch, 3)
    sd[f"{P}quant_conv.weight"] = (8, 8, 1, 1)
    sd[f"{P}quant_conv.bias"] = (8,)
    sd[f"{P}post_quant_conv.weight"] = (4, 4, 1, 1)
    sd[f"{P}post_quant_conv.bias"] = (4,)
    return sd


def clip_keys():
    """cond_stage_model.model.* shapes: ViT-L/14 visual tower + the text-side
    leftovers FrozenCLIPImageEmbedder keeps (only model.transformer is
    deleted, modules.py:355-357)."""
    sd = {}
    P = "cond_stage_model.model.visual."
    W, L = 1024, 24
    sd[f"{P}conv1.weight"] = (W, 3, 14, 14)
    sd[f"{P}class_embedding"] = (W,)
    sd[f"{P}positional_embedding"] = (257, W)
    _norm(sd, f"{P}ln_pre", W)
    for i in range(L):
        b = f"{P}transformer.resblocks.{i}"
        _norm(sd, f"{b}.ln_1", W)
        _norm(sd, f"{b}.ln_2", W)
        sd[f"{b}.attn.in_proj_weight"] = (3 * W, W)
        sd[f"{b}.attn.in_proj_bias"] = (3 * W,)
        _lin(sd, f"{b}.attn.out_proj", W, W)
        _lin(sd, f"{b}.mlp.c_fc", 4 * W, W)
        _lin(sd, f"{b}.mlp.c_proj", W, 4 * W)
    _norm(sd, f"{P}ln_post", W)
    sd[f"{P}proj"] = (W, CTX)
    # retained text-side leftovers
    T = "cond_stage_model.model."
    sd[f"{T}positional_embedding"] = (77, CTX)
    sd[f"{T}text_projection"] = (CTX, CTX)
    sd[f"{T}logit_scale"] = ()
    sd[f"{T}token_embedding.weight"] = (49408, CTX)
    _norm(sd, f"{T}ln_final", CTX)
    return sd


def build_real_state_dict():
    shapes = {}
    shapes.update(unet_keys())
    shapes.update(vae_keys())
    shapes.update(clip_keys())
    shapes["cc_projection.weight"] = (CTX, CTX + 4)
    shapes["cc_projection.bias"] = (CTX,)
    for b in convert._SCHEDULE_BUFFERS:
        if b == "scale_factor":
            shapes[b] = ()
        elif b != "logvar":       # plain tensor attr, not in state_dict
            shapes[b] = (1000,)
    # LitEma flattening: every model.diffusion_model parameter, dots stripped
    # (ddpm.py LitEma(self.model); name 'diffusion_model.x.y' → s_name
    # 'diffusion_modelxy')
    ema = {}
    for k, shp in shapes.items():
        if k.startswith("model.diffusion_model."):
            ema["model_ema." + k[len("model."):].replace(".", "")] = shp
    shapes.update(ema)
    shapes["model_ema.decay"] = ()
    shapes["model_ema.num_updates"] = ()
    return {k: np.zeros(s, np.float16) for k, s in shapes.items()}


def _shape_tree(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


def test_real_ckpt_layout_fully_consumed_and_structure_matches():
    sd = build_real_state_dict()
    spec = z123.Zero123Spec()   # real sizes
    unet_p, vae_p, clip_p, cc_w, cc_b = convert.convert_state_dict(
        sd, spec, strict=True)
    assert cc_w.shape == (CTX + 4, CTX)
    assert cc_b.shape == (CTX,)

    # expected flax structures via eval_shape (no FLOPs at real size)
    lat = spec.image_size // 8
    unet_exp = jax.eval_shape(
        spec.unet_module().init, jax.random.PRNGKey(0),
        jnp.zeros((1, lat, lat, 8)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, CTX)))["params"]
    vae_exp = jax.eval_shape(
        spec.vae_module().init, jax.random.PRNGKey(0),
        jnp.zeros((1, spec.image_size, spec.image_size, 3)))["params"]
    clip_exp = jax.eval_shape(
        spec.clip_module().init, jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3)))["params"]

    for got, exp, name in ((unet_p, unet_exp, "unet"), (vae_p, vae_exp, "vae"),
                           (clip_p, clip_exp, "clip")):
        gs, es = _shape_tree(got), _shape_tree(exp)
        assert jax.tree.structure(gs) == jax.tree.structure(es), (
            name, "structure mismatch")
        mism = [(p, a, b) for (p, a), (_, b) in zip(
            jax.tree.leaves_with_path(gs), jax.tree.leaves_with_path(es))
            if a != b]
        assert not mism, (name, mism[:5])


def test_strict_mode_rejects_unknown_keys():
    sd = build_real_state_dict()
    sd["model.diffusion_model.totally_new_block.weight"] = \
        np.zeros((1,), np.float16)
    with pytest.raises(ValueError, match="unconsumed"):
        convert.convert_state_dict(sd, z123.Zero123Spec(), strict=True)


def test_ema_weights_override_live_ones():
    sd = build_real_state_dict()
    live = "model.diffusion_model.out.2.bias"
    ema = "model_ema.diffusion_modelout2bias"
    sd[live] = np.zeros((4,), np.float32)
    sd[ema] = np.ones((4,), np.float32)
    unet_p, *_ = convert.convert_state_dict(sd, z123.Zero123Spec(),
                                            strict=True)
    np.testing.assert_array_equal(unet_p["out_conv"]["bias"], np.ones(4))
