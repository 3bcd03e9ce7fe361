"""Config system — per-scene YAML with the reference's six sections and CLI
overrides (reference: morpheus.py:1522-1552, configs/snoopy.yaml).

The schema is drop-in compatible with the reference's YAML files; unknown keys
are kept verbatim. TPU-specific knobs live in the extra ``tpu`` section (all
optional) and control the fixed-shape renderer and precision policy — the
reference has no equivalent because NeRFAcc returns ragged samples.
"""
from __future__ import annotations

import argparse
import copy
import os
from typing import Any

import yaml

# Defaults mirror configs/snoopy.yaml of the reference; every key the trainer
# reads must have a default here so minimal test configs work.
DEFAULTS: dict[str, dict[str, Any]] = {
    "data": {
        "data_dir": "",
        "depth_scale": 1000.0,
        "known_view_scale": 1.0,
        "novel_view_scale": 0.2,
        "novel_view_scale_final": 0.5,
        "novel_view_scale_factor": 1.0,
        "theta_range": [45, 105],
        "phi_range": [-180, 180],
        "full_theta_range": [45, 105],
        "full_phi_range": [-180, 180],
        "angle_overhead": 30,
        "angle_front": 60,
        "default_polar": 90.0,
        "default_azimuth": 0.0,
        "uniform_sphere_rate": 0.0,
        "outlier_remove": False,
        # <synthetic> scene generator knobs (benchmark/CI scene; ignored for
        # on-disk datasets)
        "synthetic_frames": 8,
        "synthetic_res": 64,
    },
    "exp": {
        "output": "./exp",
        "exp_name": "scene",
        "log": "log.txt",
        "fp16": False,          # kept for config parity; TPU policy lives in 'tpu'
        "save_guidance": True,
        "save_guide_intervel": 50,
        "test_interval": 200,
        "mesh_interval": 50,
        "mesh_all_interval": 400,
        "mesh_all_eval_interval": 400,
        "seed": 2024,
        "clip_ckpt": "",   # optional OpenAI CLIP ViT-B/32 weights for eval
        "ckpt": "latest",  # 'latest' | 'scratch' | explicit checkpoint path
        "ckpt_interval": 0,  # extra checkpoint cadence in epochs (0 = only at
                             # mesh_all_interval + final, as the loop always
                             # does); set lower for preemption-prone runs

    },
    "render": {
        "step_size": 0.01,
    },
    "train": {
        "kf_every": 2,
        "trunc": 0.1,
        "optim": "adam",
        "lr": 0.0005,
        "ema_decay": 0.95,
        "n_epochs": 2000,
        "n_iters": 10,
        "real_freq": 10,
        "virtual_freq": 1,
        "warm_up_steps": 100,
        "warm_up_end": 200,
        "albedo_iter_ratio": 0.1,
        "min_ambient_ratio": 0.1,
        "textureless_ratio": 0.2,
        "freeze_epoch": 400,
        "progressive_view": False,
        "progressive_view_init_ratio": 0.2,
        "progressive_level": True,
        "real_view_noise": 0.0,
        "real_ray_num": 2048,
        "rgb_weight": 5.0,
        "mask_weight": 0.5,
        "depth_weight": 0.1,
        "sdf_weight": 10.0,
        "surf_sdf_weight": 10,
        "surf_color_weight": 5.0,
        "fs_weight": 0.0,
        "normal_smoothness": 0.4,
        "normal_smooth_3d": 0.1,
        "normal_smooth_3d_t": 0.0,
        "normal_smooth_2d": 0.0,
        "eik_weight": 0.0,
        "normal_dir": False,
        "smoothness_std": 0.005,
        "topo_none": True,
        "code_reg": 0.5,
        "sdf_reg": 0.0,
        "beta_weight": 0.1,
        "ori_weight": 0.01,
        "entropy_weight": 0.0,
        "deform_weight": 0.0,
        "deform_smooth": 0.0,
        "deform_smooth_t": 0.0,
        "topo_smooth_t": 0.0,
    },
    "model": {
        "deform_dim": 16,
        "amb_dim": 2,
        "use_t": False,
        "use_app": False,
        "use_joint": True,
        "color_grid": True,
        "encode_topo": False,
        "bg_radius": 1.4,
        # NOTE: the reference's model.activation / guidance.vram_O keys are
        # dead there too (density_activation assigned but unused,
        # models/model.py:187; vram_O is a CUDA memory knob) — they are
        # accepted if present in a YAML but have no defaults here.
    },
    "guidance": {
        "model": ["zero123"],
        # optional OmegaConf model yaml; when set, Zero123Spec.from_ldm_config
        # reads timesteps/linear_start/linear_end/arch dims from it (the
        # reference reads the same fields, zero123_utils.py:68-81)
        "zero123_config": "",
        "zero123_ckpt": "",
        "t_range": [0.02, 0.5],
        "zero123_guidance_scale": 5.0,
        "zero123_train": "cur_or_one",
        "zero123_grad_weight": 0.01,
        "image_size": 256,   # SDS render resolution (latents image_size/8)
        "compute_dtype": "float32",  # 'bfloat16' runs the frozen UNet's
                                     # ε-prediction in bf16 (the reference's
                                     # fp16-autocast/vram_O analogue); the
                                     # differentiable VAE/render path stays f32
    },
    # TPU-native knobs (no reference equivalent).
    "tpu": {
        "max_samples_per_ray": 64,   # K: post-compaction samples per ray
        "march_steps": 288,          # M: candidate occupancy-test steps per ray
                                     # (288*0.01 = 2.88 > 2.76, the farthest
                                     # an inscribed-sphere exit point can sit
                                     # from AABB entry on a diagonal chord —
                                     # no ray's far segment goes untested)
        "band_budget": 0,            # surface-band points/ray kept for the
                                     # normal-smoothness ladder (0 = all P);
                                     # opt-in per scene config
        "smooth_budget": 0,          # perturbed-normal smoothness sites/ray
                                     # (random subset of compacted samples —
                                     # unbiased estimate of the same mean);
                                     # 0 = all samples; opt-in per config
        "sample_budget": 0,          # average samples/ray: global top-(N*this)
                                     # sample compaction across the ray batch
                                     # (0 = off = exact dense rendering);
                                     # field evals then track occupied samples
                                     # like the reference's ragged NeRFAcc
                                     # stream. Opt-in per scene config (all
                                     # shipped configs set 16/8 — validated on
                                     # the synthetic bench scene)
        "occ_resolution": 128,       # occupancy grid resolution (ref: morpheus.py:70)
        "occ_update_every": 16,      # EMA update cadence (nerfacc default n=16)
        "occ_warmup_steps": 256,     # full-grid updates during warmup
        "occ_sample_fraction": 0.25, # post-warmup fraction of cells refreshed
                                     # per update (strided rotation covers the
                                     # grid every 1/fraction updates); the
                                     # density eval at R^3*fraction points is
                                     # the whole cost of the update
        "budget_uniform_mix": 0.0,   # opt-in: mix U(0,1)*this into the
                                     # compaction score so a binding sample
                                     # budget keeps ~uniform free-space
                                     # coverage for fs_loss (ADVICE r1 #4)
        "occ_ema_decay": 0.95,
        "occ_threshold": 0.01,
        "occ_query_interp": "nearest",  # hash interp for occ density queries:
                                     # 'nearest' = single rounded corner (8x
                                     # fewer gathered rows; one update ~6 ms
                                     # vs ~45 ms on v5e) — the EMA grid's
                                     # binarization can't resolve sub-cell
                                     # lerp detail; 'linear' = exact reference
                                     # semantics (morpheus.py:196-202)
        "compute_dtype": "float32",  # 'bfloat16' enables the mixed policy
                                     # (bf16 MLP matmuls AND bf16 table
                                     # gathers — the latter measured +25 ms
                                     # on v5e, PARITY.md)
        "mlp_dtype": "float32",      # 'bfloat16' casts ONLY the MLP matmuls
                                     # to bf16 (f32 accumulation + master
                                     # weights); tables stay f32
        "grad_payload": "float32",   # 'bfloat16' sorts hash-grid cotangents
                                     # as 16-bit payloads (reference AMP fp16
                                     # grads, grid.py:44-47); f32 accumulation
        "vjp_mode": "hist_rows",     # hash-grid embedding-cotangent path
                                     # (ops/hashgrid.HashGridSpec.vjp_mode):
                                     # sort-free one-hot-matmul histogram
                                     # (ops/hist_pallas.py), measured 3.7 ms/
                                     # step faster than 'sort_pallas_rows' at
                                     # the bench point (v5e, 10/16 levels)
        "mesh_chunk": 2097152,       # dense SDF query chunk for mesh extraction
        "data_parallel": 1,          # ray-batch data parallelism over ICI
        "chain_steps": True,         # lax.scan real_freq consecutive real
                                     # steps into one dispatch (the axon
                                     # tunnel pays ~10 ms RPC per dispatch);
                                     # replays the unchained loop's exact
                                     # RNG/step sequence (params match to
                                     # compile noise)
        "remat_virtual": True,       # jax.checkpoint the virtual-step render
                                     # and the VAE encode (the two activation
                                     # holders on the SDS gradient path; the
                                     # UNet is stop-gradded). Exact; trades
                                     # one recomputed forward for the saved
                                     # activations, which at the late
                                     # curriculum (scale 0.5 = 32,400 rays)
                                     # otherwise OOM v5e HBM next to the
                                     # ~5 GB f32 Zero123 weights
        "donate_state": True,        # donate the TrainState into the chained/
                                     # virtual step jits (output aliases
                                     # input, halving state residency);
                                     # timing harnesses that re-feed a saved
                                     # state (bench.py) turn this off
    },
}


def merge_defaults(config: dict) -> dict:
    """Deep-merge a loaded YAML dict over DEFAULTS."""
    out = copy.deepcopy(DEFAULTS)
    for section, params in (config or {}).items():
        if section not in out:
            out[section] = {}
        if isinstance(params, dict):
            out[section].update(params)
        else:
            out[section] = params
    return out


def load_config(path: str) -> dict:
    with open(path, "r") as f:
        cfg = yaml.full_load(f)
    return merge_defaults(cfg)


def parse_cli(argv: list[str] | None = None) -> dict:
    """CLI with per-section subparser overrides (reference: morpheus.py:1522-1544).

    Usage matches the reference: ``morpheus.py --config configs/x.yaml
    [section --key value ...]``.
    """
    parser = argparse.ArgumentParser(description="morpheus_tpu trainer")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to the YAML config file")
    args, remaining = parser.parse_known_args(argv)
    if args.config is None:
        parser.error("--config is required")

    config = load_config(args.config)

    subparsers = parser.add_subparsers(dest="section", help="Config section")
    for section_name, section_params in config.items():
        sub = subparsers.add_parser(section_name)
        for key, value in section_params.items():
            sub.add_argument(f"--{key}", default=value, type=type(value))

    args = parser.parse_args(remaining)
    if getattr(args, "section", None) in config:
        for key, value in vars(args).items():
            if key not in ("section", "config") and value is not None:
                config[args.section][key] = value
    return config


def dump_config(config: dict, workspace: str, name: str = "config.yaml") -> None:
    """Snapshot the resolved config into the workspace (ref: morpheus.py:1551-1552)."""
    os.makedirs(workspace, exist_ok=True)
    with open(os.path.join(workspace, name), "w") as f:
        yaml.dump(config, f)
