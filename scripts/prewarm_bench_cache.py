#!/usr/bin/env python
"""Pre-populate the persistent XLA compile cache with bench.py's variants.

The round-end `python bench.py` (driver protocol) cold-compiles up to six
jitted variants; the SDS ones take ~15 min each on this 1-vCPU host, which
is exactly the budget that skipped `sds_step_ms_s05` in round 3. XLA
compilation is HOST work — it can run while the full-budget trainer owns the
chip. This script lowers and compiles each variant into the persistent cache
(morpheus_tpu.utils.setup_compilation_cache) so the real bench later hits
warm cache and measures in seconds.

HBM safety: the full-size Zero123 guidance (~3.4 GB f32) and its CLIP
embeddings are lowered as ShapeDtypeStructs — never materialized on the
device. The only device residency is the small bench trainer state (a few
MB) plus the transiently loaded executable. Cache keys depend on HLO +
compile options only, not argument values, so abstract lowering produces
the same cache entry as bench.py's concrete execution
(tests/test_prewarm_lowering.py proves HLO-text equality on CPU).

Usage:
  python scripts/prewarm_bench_cache.py VARIANT
with VARIANT one of: real300 chained300 late1900 sds_s05 sds_s02
sds_bf16_s05_late sds_bf16_s05 sds_bf16_s02 (sds names parse by substring:
"bf16" -> bf16 UNet, "s05"/"s02" -> scale, "late" -> epoch-1900 levels,
"noremat" -> remat_virtual off, for scripts/profile_sds.py's ablations).
Run each variant in its OWN process (see prewarm_all.sh) so loaded
executables are released before the next compile.
"""
from __future__ import annotations

import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(f"prewarm: {msg}", flush=True)


def build_bench_trainer(H=128, W=128):
    """The real-step bench trainer, exactly as bench.py main() builds it."""
    import bench
    from morpheus_tpu.config import merge_defaults
    from morpheus_tpu.data import dataset as data_lib
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.train.trainer import Trainer

    cfg = merge_defaults(copy.deepcopy(bench.BENCH_POINT_CFG))
    scene = make_synthetic_scene(num_frames=8, H=H, W=W)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    return cfg, ds, Trainer(cfg, ds)


def abstract_guidance(gspec, key=None):
    """Shape-only twin of bench.py's guidance argument: init_random ->
    cast_for_compute -> clip_params stripped (Trainer.__init__ passes an
    empty CLIP subtree through the step jits)."""
    from morpheus_tpu.guidance import zero123 as z123

    key = jax.random.PRNGKey(1) if key is None else key
    g_full = jax.eval_shape(
        lambda k: z123.cast_for_compute(
            z123.Zero123Guidance.init_random(k, gspec), gspec), key)
    return g_full, g_full._replace(clip_params=())


def abstract_embeddings(cfg, ds, gspec, g_full_abs):
    """Shape-only twin of Trainer.precompute_embeddings' return dict: the
    host-derived index/angle fields are built for real (they're tiny and
    value-identical to the concrete path); the CLIP/VAE outputs are
    eval_shape'd through the same encode functions."""
    from morpheus_tpu.guidance import zero123 as z123

    kf = np.arange(0, ds.num_frames, cfg["train"]["kf_every"])
    if (ds.num_frames - 1) not in kf:
        kf = np.concatenate([kf, [ds.num_frames - 1]])
    gsz = gspec.image_size
    im_abs = jax.ShapeDtypeStruct((1, gsz, gsz, 3), jnp.float32)
    c_abs, v_abs = jax.eval_shape(
        lambda g, im: (z123.clip_image_embed(g, im, gspec),
                       z123.vae_encode_mode(g, im, gspec)),
        g_full_abs, im_abs)
    K = len(kf)
    nearest = np.argmin(
        np.abs(kf[None, :] - np.arange(ds.num_frames)[:, None]), axis=1)
    return {
        "kf": jnp.asarray(kf, jnp.int32),
        "nearest_kf": jnp.asarray(nearest, jnp.int32),
        "c_crossattn": jax.ShapeDtypeStruct((K,) + c_abs.shape[1:],
                                            c_abs.dtype),
        "c_concat": jax.ShapeDtypeStruct((K,) + v_abs.shape[1:], v_abs.dtype),
        "ref_polars": jnp.asarray(ds.theta)[jnp.asarray(kf)],
        "ref_azimuths": jnp.asarray(ds.phi)[jnp.asarray(kf)],
        "ref_radii": jnp.asarray(ds.radius)[jnp.asarray(kf)],
    }


def lower_real_variant(trainer, which):
    """Lowered real-step variants at bench.py's operating points."""
    state = trainer.state._replace(global_step=jnp.asarray(33000, jnp.int32))
    if which == "real300":
        trainer.epoch = 300
        fn = trainer._make_real_step(trainer._active_levels())
        return fn.lower(state, jax.random.PRNGKey(0), jnp.asarray(300.0))
    if which == "chained300":
        trainer.epoch = 300
        fn = trainer._make_real_steps_chained(trainer._active_levels(), n=10)
        return fn.lower(state, jax.random.PRNGKey(3), jnp.asarray(300.0))
    if which == "late1900":
        trainer.epoch = 1900
        fn = trainer._make_real_step(trainer._active_levels())
        state = state._replace(global_step=jnp.asarray(209000, jnp.int32))
        return fn.lower(state, jax.random.PRNGKey(0), jnp.asarray(1900.0))
    raise SystemExit(f"unknown real variant {which}")


def lower_sds_variant(cfg, ds, trainer, gspec, scale, ep=300):
    """Lowered SDS virtual step with guidance + CLIP/VAE embeddings
    abstract — the HLO twin of bench.py time_sds (which materializes
    both; tests/test_prewarm_lowering.py pins the equality)."""
    g_full_abs, g_abs = abstract_guidance(gspec)
    emb = abstract_embeddings(cfg, ds, gspec, g_full_abs)
    trainer.guidance_spec = gspec
    trainer.epoch = ep
    vstep = trainer._virtual_step_for_scale(scale, trainer._active_levels())
    st = trainer.state._replace(global_step=jnp.asarray(33001, jnp.int32))
    return vstep.lower(st, g_abs, emb, jax.random.PRNGKey(2),
                       jnp.asarray(float(ep)))


def prewarm_ab(config_path):
    """Prewarm every chained-step variant a trainer CLI run of this config
    will compile (one per distinct active-levels count over its epochs), so
    the quality A/B arms (configs/ab_*.yaml) start stepping in seconds. The
    epoch scalar is lowered exactly as train_one_epoch builds it
    (jnp.asarray(epoch, float32) — NOT weak-typed like bench's
    asarray(300.0)); tests/test_prewarm_lowering.py::test_ab_prewarm_hits_
    cache proves a subsequent train_one_epoch adds no new cache entries."""
    from morpheus_tpu.config import parse_cli
    from morpheus_tpu.data.dataset import DeformDataset
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.train.trainer import Trainer

    cfg = parse_cli(["--config", config_path])
    res = int(cfg["data"].get("synthetic_res", 64))
    scene = make_synthetic_scene(
        num_frames=int(cfg["data"].get("synthetic_frames", 8)), H=res, W=res)
    ds = DeformDataset(cfg, scene=scene)
    trainer = Trainer(cfg, ds)
    chain = int(cfg["train"]["real_freq"])
    if not cfg["tpu"].get("chain_steps", True) or chain <= 1:
        _log(f"ab {config_path}: unchained config, nothing to prewarm")
        return
    variants = {}
    for ep in range(1, cfg["train"]["n_epochs"] + 1):
        trainer.epoch = ep
        variants.setdefault(trainer._active_levels(), ep)
    _log(f"ab {config_path}: {len(variants)} level variants "
         f"{sorted(variants.items(), key=lambda kv: kv[1])}")
    trainer._make_ema_step().lower(trainer.state).compile()
    for al, ep in sorted(variants.items(), key=lambda kv: kv[1]):
        t0 = time.perf_counter()
        trainer.epoch = ep
        fn = trainer._make_real_steps_chained(al, chain)
        fn.lower(trainer.state, jax.random.PRNGKey(0),
                 jnp.asarray(ep, jnp.float32)).compile()
        _log(f"ab {config_path}: levels={al} (first epoch {ep}) "
             f"compiled + cached ({time.perf_counter() - t0:.1f}s)")


def main():
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "real300"
    if which.startswith("ab:"):
        return prewarm_ab(which[3:])

    t0 = time.perf_counter()
    if which in ("real300", "chained300", "late1900"):
        _, _, trainer = build_bench_trainer()
        _log(f"{which}: trainer built ({time.perf_counter() - t0:.1f}s)")
        lowered = lower_real_variant(trainer, which)
    elif which.startswith("sds"):
        import dataclasses

        from morpheus_tpu.guidance import zero123 as z123
        gspec = z123.Zero123Spec()
        if "bf16" in which:
            gspec = dataclasses.replace(gspec, compute_dtype="bfloat16")
        scale = 0.5 if "s05" in which else 0.2
        ep = 1900 if "late" in which else 300
        cfg, ds, trainer = build_bench_trainer(H=360, W=360)
        if "noremat" in which:
            # scripts/profile_sds.py's *_noremat ablations (exact
            # rematerialization off) are distinct HLO — prewarm them too
            trainer.config["tpu"]["remat_virtual"] = False
        _log(f"{which}: trainer built ({time.perf_counter() - t0:.1f}s)")
        lowered = lower_sds_variant(cfg, ds, trainer, gspec, scale, ep=ep)
    else:
        raise SystemExit(f"unknown variant {which}")
    _log(f"{which}: lowered ({time.perf_counter() - t0:.1f}s), compiling")
    lowered.compile()
    _log(f"{which}: compiled + cached ({time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
