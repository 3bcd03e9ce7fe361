"""Numerical parity of the flax UNet/VAE against the reference torch ldm
modules (/root/reference/ldm/modules/diffusionmodules/openaimodel.py:414
UNetModel, /root/reference/ldm/models/autoencoder.py:285 AutoencoderKL).

Both are instantiated at a SLICED config that still hits every layer type
(all channel-mult levels, down/upsampling, spatial-transformer cross-attn at
every attention ds, mid attention, GroupNorm/eps, skip 1x1s, the ldm cos|sin
timestep embedding), the torch state_dict is pushed through
guidance/convert.py, and outputs are compared on random inputs within f32
tolerance. A wrong attention scale, GroupNorm eps, or converter transpose
fails these while shape-only tests stay green.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference"


def _import_ldm():
    """Import the vendored ldm modules with stubs for heavyweight deps that
    module-scope imports pull in but the parity paths never execute."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        # transformers probes importlib.util.find_spec("torchvision"), which
        # raises on a spec-less stub module — give it a real (loader-less) spec
        import importlib.machinery
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        sys.modules["torchvision"] = tv
    if "pytorch_lightning" not in sys.modules:
        plm = types.ModuleType("pytorch_lightning")
        plm.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = plm
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):  # isinstance probe only (openaimodel.py:479)
            pass

        lc.ListConfig = ListConfig
        oc.ListConfig = ListConfig
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if "taming" not in sys.modules:
        tq = types.ModuleType("taming.modules.vqvae.quantize")

        class VectorQuantizer2:  # never constructed (VQModel only)
            pass

        tq.VectorQuantizer2 = VectorQuantizer2
        for name in ("taming", "taming.modules", "taming.modules.vqvae"):
            sys.modules[name] = types.ModuleType(name)
        sys.modules["taming.modules.vqvae.quantize"] = tq
    if REF not in sys.path:
        # APPEND, never insert at 0: the reference tree has its own
        # morpheus.py/utils.py, and shadowing the repo's top-level modules
        # breaks later tests in the same session (only `ldm` is needed here,
        # and it exists nowhere else on the path)
        sys.path.append(REF)
    from ldm.models.autoencoder import AutoencoderKL as TorchVAE
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    return TorchUNet, TorchVAE


def _to_numpy_sd(module):
    return {k: v.detach().float().numpy()
            for k, v in module.state_dict().items()}


def test_unet_matches_reference_torch():
    from morpheus_tpu.guidance import unet as funet
    from morpheus_tpu.guidance.convert import convert_unet

    TorchUNet, _ = _import_ldm()
    torch.manual_seed(0)
    tm = TorchUNet(image_size=16, in_channels=8, out_channels=4,
                   model_channels=32, attention_resolutions=[4, 2, 1],
                   num_res_blocks=2, channel_mult=[1, 2, 4, 4], num_heads=4,
                   use_spatial_transformer=True, transformer_depth=1,
                   context_dim=64, use_checkpoint=False, legacy=False)
    tm.eval()
    # zero-init output conv (zero_module in the reference) would hide output-
    # path bugs; randomize it before the comparison
    with torch.no_grad():
        for p in tm.out[2].parameters():
            p.normal_(0, 0.02)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)   # CFG-style batch
    t = np.array([17, 923], np.int64)
    ctx = rng.normal(size=(2, 1, 64)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t),
                 torch.tensor(ctx)).numpy().transpose(0, 2, 3, 1)

    params = convert_unet(_to_numpy_sd(tm), prefix="",
                          channel_mult=(1, 2, 4, 4))
    fm = funet.UNetModel(in_channels=8, out_channels=4, model_channels=32,
                         attention_resolutions=(4, 2, 1), num_res_blocks=2,
                         channel_mult=(1, 2, 4, 4), num_heads=4,
                         context_dim=64)
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(t), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_vae_matches_reference_torch():
    from morpheus_tpu.guidance import vae as fvae
    from morpheus_tpu.guidance.convert import convert_vae

    _, TorchVAE = _import_ldm()
    torch.manual_seed(1)
    dd = dict(double_z=True, z_channels=4, resolution=64, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=2,
              attn_resolutions=[], dropout=0.0)
    tm = TorchVAE(ddconfig=dd, lossconfig={"target": "torch.nn.Identity"},
                  embed_dim=4)
    tm.eval()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        post = tm.encode(torch.tensor(x.transpose(0, 3, 1, 2)))
        ref_mean = post.mean.numpy().transpose(0, 2, 3, 1)
        ref_logvar = post.logvar.numpy().transpose(0, 2, 3, 1)
        ref_dec = tm.decode(post.mean).numpy().transpose(0, 2, 3, 1)

    params = convert_vae(_to_numpy_sd(tm), prefix="", ch_mult=(1, 2, 4, 4))
    fm = fvae.AutoencoderKL(embed_dim=4, ch=32)
    mean, logvar = fm.apply({"params": params}, jnp.asarray(x),
                            method=fvae.AutoencoderKL.encode_moments)
    np.testing.assert_allclose(np.asarray(mean), ref_mean,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar,
                               rtol=2e-4, atol=2e-4)
    dec = fm.apply({"params": params}, jnp.asarray(mean),
                   method=fvae.AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec), ref_dec, rtol=2e-4, atol=3e-4)
