"""Fast-tier smoke coverage (VERDICT r1 #9): one real train loop, one
sharded step, and one SDS virtual step at micro sizes, so a plain `pytest`
run exercises every major subsystem end-to-end — the heavyweight versions
(more epochs, bigger grids, convergence asserts) stay in the slow tier."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morpheus_tpu.config import merge_defaults
from morpheus_tpu.data import dataset as data_lib
from morpheus_tpu.data.synthetic import make_synthetic_scene
from morpheus_tpu.train.trainer import Trainer


def _micro_cfg(**train_over):
    tr = {"n_epochs": 20, "warm_up_end": 4, "warm_up_steps": 2,
          "real_ray_num": 32, "real_freq": 1, "virtual_freq": 0,
          "n_iters": 1, "lr": 5e-3, "kf_every": 2,
          "normal_smoothness": 0.0, "normal_smooth_3d": 0.0}
    tr.update(train_over)
    return merge_defaults({
        "data": {"data_dir": "<synthetic>", "novel_view_scale": 0.5},
        "exp": {"seed": 0, "save_guidance": False},
        "train": tr,
        "model": {"bg_radius": 0.0, "grid_num_levels": 2,
                  "grid_log2_hashmap_size": 9, "grid_desired_resolution": 24},
        "render": {"step_size": 0.06},
        "tpu": {"max_samples_per_ray": 8, "march_steps": 32,
                "occ_resolution": 8, "occ_warmup_steps": 4,
                "occ_update_every": 4},
    })


def test_train_loop_smoke():
    """Two epochs of the real jitted step: loss finite, params move, occ/EMA
    state updates — the default-tier train-loop coverage.

    Compile-budget note (VERDICT r3 #8): this test, the unchained arm of
    test_chained_steps_match_unchained and test_nonfinite_grads_skip_update
    deliberately share ONE real-step program (same micro cfg, chain_steps
    off here) so the persistent compile cache pays its XLA-CPU compile once
    per cold tier. Chained-dispatch coverage lives in the dedicated
    chained-vs-unchained test."""
    cfg = _micro_cfg(real_freq=3)
    cfg["tpu"]["chain_steps"] = False
    scene = make_synthetic_scene(num_frames=2, H=12, W=12)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    tr = Trainer(cfg, ds)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
    losses = []
    for ep in (1, 2):
        tr.epoch = ep
        losses.append(tr.train_one_epoch())
    assert all(np.isfinite(l) for l in losses), losses
    moved = sum(float(np.abs(np.asarray(a) - b).max())
                for a, b in zip(jax.tree.leaves(tr.state.params),
                                jax.tree.leaves(p0)))
    assert moved > 0
    assert int(tr.state.global_step) == 6


def test_sharded_real_step_smoke():
    """One sharded real step on the 8-virtual-device mesh in the default
    tier (full parity-vs-single-chip asserts live in test_sharding.py)."""
    from morpheus_tpu.parallel import sharding
    cfg = _micro_cfg()
    scene = make_synthetic_scene(num_frames=2, H=12, W=12)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    tr = Trainer(cfg, ds)
    mesh = sharding.make_mesh(8)
    step = sharding.make_sharded_real_step(tr, mesh)
    rng = np.random.default_rng(0)
    batch, bg = sharding.host_sample_real_batch(rng, tr.data, 2, 32)
    sb = sharding.shard_batch(batch, mesh)
    bg = sharding.shard_batch({"bg": bg}, mesh)["bg"]
    state = sharding.replicate_state(tr.state, mesh)
    new_state, loss = step(state, sb, bg, jax.random.PRNGKey(0),
                           jnp.asarray(1.0))
    assert np.isfinite(float(loss))
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)))
    assert diff > 0


def test_virtual_sds_step_smoke():
    """One SDS virtual step (render → VAE → UNet CFG → grad) with a micro
    random-weight Zero123 in the default tier."""
    from morpheus_tpu.guidance import zero123 as z123
    # shallow VAE ((1,2)x1 vs the real (1,2,4,4)x2) with image_size chosen to
    # keep the latent at 8x8, and a single-level UNet (the smoke exercises the
    # render→VAE→UNet-CFG→grad PIPELINE; multi-level UNet structure is golden-
    # tested in test_guidance*.py) — a much smaller XLA graph, the cold-tier
    # compile budget's single largest item (VERDICT r3 #8)
    spec = z123.Zero123Spec(image_size=16, unet_channels=32, unet_mult=(1,),
                            unet_heads=2, context_dim=16, clip_width=32,
                            clip_layers=1, clip_heads=2, clip_patch=14,
                            vae_ch=32, vae_mult=(1, 2), vae_res_blocks=1)
    g = z123.Zero123Guidance.init_random(jax.random.PRNGKey(0), spec)
    cfg = _micro_cfg(virtual_freq=1, real_freq=0, warm_up_steps=0,
                     freeze_epoch=100)
    scene = make_synthetic_scene(num_frames=2, H=12, W=12)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    tr = Trainer(cfg, ds, guidance=g, guidance_spec=spec)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
    tr.epoch = 1
    loss = tr.train_one_epoch()
    assert np.isfinite(loss)
    moved = sum(float(np.abs(np.asarray(a) - b).max())
                for a, b in zip(jax.tree.leaves(tr.state.params),
                                jax.tree.leaves(p0)))
    assert moved > 0


def test_chained_steps_match_unchained():
    """tpu.chain_steps (one lax.scan dispatch per real_freq block) replays
    the unchained host loop's exact RNG/step sequence (key and global_step
    agree bitwise); params agree to compilation noise (the scan body is the
    same program but XLA fuses it differently, so last-ulp f32 differences
    are expected)."""
    def run(chain):
        cfg = _micro_cfg(real_freq=3, n_iters=1)
        cfg["tpu"]["chain_steps"] = chain
        scene = make_synthetic_scene(num_frames=2, H=12, W=12)
        ds = data_lib.DeformDataset(cfg, scene=scene)
        tr = Trainer(cfg, ds)
        tr.epoch = 1
        tr.train_one_epoch()
        return tr

    a, b = run(True), run(False)
    assert int(a.state.global_step) == int(b.state.global_step) == 3
    np.testing.assert_array_equal(np.asarray(a.key), np.asarray(b.key))
    for x, y in zip(jax.tree.leaves(a.state.params),
                    jax.tree.leaves(b.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-7)


def test_nonfinite_grads_skip_update():
    """GradScaler-parity NaN guard: a step whose gradients carry NaN/inf must
    leave params AND optimizer moments bitwise untouched (the reference's
    scaler.step skip, morpheus.py:1404-1423) while still advancing
    global_step. Observed without this on v5e: one non-finite virtual-step
    gradient at epoch ~600 of the full-budget run poisoned the entire state
    within a single step."""
    cfg = _micro_cfg(real_freq=3)
    cfg["tpu"]["chain_steps"] = False
    scene = make_synthetic_scene(num_frames=2, H=12, W=12)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    tr = Trainer(cfg, ds)

    # Poison through the STATE, not the loss fn: a NaN sdf_grid makes the
    # loss and every gradient leaf non-finite (global grad clip couples all
    # leaves) while reusing the exact step executable the other smokes
    # compiled — a broken guard would write NaN into every OTHER param leaf
    # and fail the bitwise comparison below.
    step = tr._make_real_step(None)
    bad_params = dict(tr.state.params)
    bad_params["sdf_grid"] = jnp.full_like(bad_params["sdf_grid"], jnp.nan)
    bad_state = tr.state._replace(params=bad_params)
    new_state, loss = step(bad_state, jax.random.PRNGKey(0), jnp.asarray(1.0))
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(bad_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(new_state.opt_state),
                    jax.tree.leaves(bad_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.global_step) == int(bad_state.global_step) + 1

    # and a clean step (same executable, pristine state) still updates
    st2, loss2 = step(tr.state, jax.random.PRNGKey(0), jnp.asarray(1.0))
    assert np.isfinite(float(loss2))
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree.leaves(st2.params),
                                jax.tree.leaves(tr.state.params)))
    assert moved > 0
