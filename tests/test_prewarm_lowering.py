"""Cache-prewarm lowering equality (scripts/prewarm_bench_cache.py).

The prewarm script compiles bench.py's jitted variants into the persistent
cache WITHOUT materializing the ~3.4 GB guidance (ShapeDtypeStruct args).
Persistent-cache hits require the prewarmed HLO module to be byte-identical
to what bench.py later lowers with concrete arrays — these tests pin that
equality at a shrunken operating point (same construction code, tiny specs).
"""
import copy
import sys

import jax
import jax.numpy as jnp
import pytest

import bench
from morpheus_tpu.config import merge_defaults

# trace-only (no XLA compiles), but tracing four full steps still costs ~2
# min on the 1-vCPU host — slow tier (the fast-tier budget is <300 s cold)
pytestmark = pytest.mark.slow
from morpheus_tpu.data import dataset as data_lib
from morpheus_tpu.data.synthetic import make_synthetic_scene
from morpheus_tpu.guidance import zero123 as z123
from morpheus_tpu.train.trainer import Trainer

sys.path.insert(0, "scripts")
import prewarm_bench_cache as pw


def _tiny_cfg_scene():
    cfg = merge_defaults(copy.deepcopy(bench.BENCH_POINT_CFG))
    cfg["train"]["real_ray_num"] = 128
    cfg["tpu"]["march_steps"] = 32
    cfg["tpu"]["max_samples_per_ray"] = 8
    cfg["tpu"]["occ_resolution"] = 16
    scene = make_synthetic_scene(num_frames=4, H=32, W=32)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    return cfg, ds


def test_real_step_abstract_lowering_matches_concrete():
    cfg, ds = _tiny_cfg_scene()
    trainer = Trainer(cfg, ds)
    trainer.epoch = 300
    state = trainer.state._replace(global_step=jnp.asarray(33000, jnp.int32))
    fn = trainer._make_real_step(trainer._active_levels())
    concrete = fn.lower(state, jax.random.PRNGKey(0),
                        jnp.asarray(300.0)).as_text()
    # NB: jnp.asarray(300.0) is WEAK f32 — the abstract twin must mirror
    # weak_type or the lowered module gains/loses convert ops and the
    # persistent-cache key changes (this is why the prewarm script passes
    # concrete epochs/keys and only abstracts the heavy guidance leaves)
    abstract = fn.lower(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, weak_type=getattr(x, "weak_type", False)),
            state),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((), jnp.float32, weak_type=True)).as_text()
    assert abstract == concrete


def test_chained_lower_matches_execution_signature():
    cfg, ds = _tiny_cfg_scene()
    trainer = Trainer(cfg, ds)
    trainer.epoch = 300
    state = trainer.state._replace(global_step=jnp.asarray(33000, jnp.int32))
    fn = trainer._make_real_steps_chained(trainer._active_levels(), n=2)
    lowered = fn.lower(state, jax.random.PRNGKey(3), jnp.asarray(300.0))
    text = lowered.as_text()
    assert "while" in text or "scan" in text  # the chained scan survived
    # the forwarded .lower really is the executed jit: same donation config
    st2, _, loss = fn(state, jax.random.PRNGKey(3), jnp.asarray(300.0))
    assert jnp.isfinite(loss)


def test_sds_abstract_lowering_matches_concrete():
    gspec = z123.Zero123Spec(image_size=16, unet_channels=32, unet_mult=(1,),
                             unet_heads=2, context_dim=16, clip_width=32,
                             clip_layers=1, clip_heads=2, clip_patch=14,
                             vae_ch=32, vae_mult=(1, 2), vae_res_blocks=1)
    cfg, ds = _tiny_cfg_scene()
    scale = 0.5

    # concrete: exactly bench.py time_sds
    g = z123.cast_for_compute(
        z123.Zero123Guidance.init_random(jax.random.PRNGKey(1), gspec), gspec)
    tr_c = Trainer(cfg, ds, guidance=g, guidance_spec=gspec)
    tr_c.epoch = 300
    vstep_c = tr_c._virtual_step_for_scale(scale, tr_c._active_levels())
    st_c = tr_c.state._replace(global_step=jnp.asarray(33001, jnp.int32))
    concrete = vstep_c.lower(st_c, tr_c.guidance, tr_c._embeddings,
                             jax.random.PRNGKey(2),
                             jnp.asarray(300.0)).as_text()

    # abstract: exactly the prewarm script path
    tr_a = Trainer(cfg, ds)
    lowered = pw.lower_sds_variant(cfg, ds, tr_a, gspec, scale)
    assert lowered.as_text() == concrete


def test_ab_prewarm_hits_cache(tmp_path):
    # end-to-end: prewarm_ab(config) populates the persistent cache such
    # that a real train_one_epoch sweep over the SAME config compiles
    # NOTHING new — the property the A/B post-run window depends on
    cfg_yaml = tmp_path / "tiny_ab.yaml"
    cfg_yaml.write_text(
        "data: {data_dir: '<synthetic>', synthetic_frames: 4,"
        " synthetic_res: 32}\n"
        "exp: {output: '%s', exp_name: tiny_ab, seed: 3}\n"
        "render: {step_size: 0.02}\n"
        "train: {n_epochs: 8, n_iters: 1, real_freq: 2, virtual_freq: 0,"
        " real_ray_num: 64, warm_up_steps: 0}\n"
        "model: {bg_radius: 0.0, grid_num_levels: 4,"
        " grid_log2_hashmap_size: 12, grid_desired_resolution: 48}\n"
        "tpu: {max_samples_per_ray: 8, march_steps: 32, occ_resolution: 16,"
        " occ_warmup_steps: 1000}\n" % tmp_path)
    cache = tmp_path / "cache"
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        pw.prewarm_ab(str(cfg_yaml))
        entries = set(p.name for p in cache.iterdir())
        assert entries, "prewarm wrote nothing to the persistent cache"

        from morpheus_tpu.config import parse_cli
        cfg = parse_cli(["--config", str(cfg_yaml)])
        scene = make_synthetic_scene(num_frames=4, H=32, W=32)
        ds = data_lib.DeformDataset(cfg, scene=scene)
        trainer = Trainer(cfg, ds)
        for ep in range(1, cfg["train"]["n_epochs"] + 1):
            trainer.epoch = ep
            trainer.train_one_epoch()
        new = set(p.name for p in cache.iterdir()) - entries
        assert not new, f"epoch loop cold-compiled {len(new)} modules: {new}"
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


@pytest.mark.parametrize("dtype", ["bfloat16"])
def test_sds_abstract_embedding_dtypes_follow_compute_dtype(dtype):
    # the bf16 bench variant's embeddings are computed by a bf16-cast CLIP;
    # the abstract twin must reproduce those dtypes or the cache misses
    gspec = z123.Zero123Spec(image_size=16, unet_channels=32, unet_mult=(1,),
                             unet_heads=2, context_dim=16, clip_width=32,
                             clip_layers=1, clip_heads=2, clip_patch=14,
                             vae_ch=32, vae_mult=(1, 2), vae_res_blocks=1,
                             compute_dtype=dtype)
    cfg, ds = _tiny_cfg_scene()
    g = z123.cast_for_compute(
        z123.Zero123Guidance.init_random(jax.random.PRNGKey(1), gspec), gspec)
    tr = Trainer(cfg, ds, guidance=g, guidance_spec=gspec)
    g_full_abs, _ = pw.abstract_guidance(gspec)
    emb_abs = pw.abstract_embeddings(cfg, ds, gspec, g_full_abs)
    for k, v in tr._embeddings.items():
        av = emb_abs[k]
        assert tuple(av.shape) == tuple(v.shape), k
        assert av.dtype == v.dtype, k
