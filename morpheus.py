"""MorpheuS-TPU CLI — identical interface to the reference trainer
(reference: morpheus.py:1522-1554):

    python morpheus.py --config configs/snoopy.yaml [section --key value ...]

Orchestrates per-scene optimization with periodic diagnostics: init mesh, test
videos every test_interval, canonical mesh every mesh_interval, per-frame
meshes + 3D metrics every mesh_all_interval, final checkpoint (reference
train(): morpheus.py:1435-1519).
"""
from __future__ import annotations

import os
import time


def _apply_degrade(config, level: int) -> list[str]:
    """Degraded-mode overrides for the crash-resume supervisor
    (scripts/run_full_budget.sh sets MORPHEUS_DEGRADE after N consecutive
    no-progress failures). Each level trades throughput — and at level 2,
    virtual-view resolution — for HBM headroom; every override is returned
    for the log so a degraded run is never mistaken for a clean one."""
    notes = []
    if level >= 1:
        config["tpu"]["chain_steps"] = False
        notes.append("tpu.chain_steps=false (single-step dispatch)")
        if config["guidance"].get("compute_dtype") != "bfloat16":
            config["guidance"]["compute_dtype"] = "bfloat16"
            notes.append("guidance.compute_dtype=bfloat16")
    if level >= 2:
        s = min(0.35, float(config["data"].get("novel_view_scale_final", 0.5)))
        config["data"]["novel_view_scale_final"] = s
        notes.append(f"data.novel_view_scale_final={s} "
                     "(SEMANTICS CHANGE: smaller late virtual views)")
    return notes


def _live_array_report(log) -> None:
    """On RESOURCE_EXHAUSTED: dump the client-visible device residency
    (jax.live_arrays()) so the next crash carries real telemetry — the axon
    backend exposes no memory_stats(), so this is the only residency signal."""
    try:
        import collections

        import jax
        arrs = jax.live_arrays()
        tot = 0
        by: collections.Counter = collections.Counter()
        for a in arrs:
            try:
                nb = a.size * a.dtype.itemsize
            except Exception:
                continue
            tot += nb
            by[(str(a.dtype), str(a.shape))] += nb
        log(f"[oom] {len(arrs)} live client arrays, "
            f"{tot / 2**30:.2f} GiB total (executables/temps not counted)")
        for (dt, shape), nb in by.most_common(15):
            log(f"[oom] {nb / 2**20:9.1f} MiB  {dt:9s} {shape}")
    except Exception as e:  # diagnostics must never mask the real error
        log(f"[oom] live-array report failed: {e}")


def _hbm_note() -> str:
    """Device-memory snapshot for the epoch log line (diagnosing HBM
    headroom around curriculum transitions; backends without memory_stats —
    e.g. CPU — log nothing)."""
    try:
        import jax
        st = jax.local_devices()[0].memory_stats()
        if not st or "bytes_in_use" not in st:
            return ""
        gib = 1 << 30
        peak = st.get("peak_bytes_in_use", 0)
        return (f" hbm={st['bytes_in_use'] / gib:.2f}"
                f"/{st.get('bytes_limit', 0) / gib:.2f}GiB"
                f" peak={peak / gib:.2f}")
    except Exception:
        return ""


def main(argv=None):
    from morpheus_tpu.config import dump_config, parse_cli
    from morpheus_tpu.data.dataset import DeformDataset
    from morpheus_tpu.train.trainer import Trainer
    from morpheus_tpu.utils import Logger, seed_everything
    from morpheus_tpu import mesh_export
    from morpheus_tpu.vis import video as video_lib

    config = parse_cli(argv)
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()
    workspace = os.path.join(config["exp"]["output"], config["exp"]["exp_name"])
    os.makedirs(workspace, exist_ok=True)
    log = Logger(workspace, config["exp"]["log"])
    degrade = int(os.environ.get("MORPHEUS_DEGRADE", "0") or 0)
    if degrade:
        for note in _apply_degrade(config, degrade):
            log(f"[degrade L{degrade}] {note}")
    dump_config(config, workspace)
    seed_everything(config["exp"]["seed"])
    from morpheus_tpu.utils import file_backup
    file_backup(workspace)

    if config["data"]["data_dir"] == "<synthetic>":
        from morpheus_tpu.data.synthetic import make_synthetic_scene
        res = int(config["data"].get("synthetic_res", 64))
        scene = make_synthetic_scene(
            num_frames=int(config["data"].get("synthetic_frames", 8)),
            H=res, W=res)
    else:
        scene = None
    dataset = DeformDataset(config, scene=scene)
    log(f"Loaded {dataset.num_frames} frames at {dataset.H}x{dataset.W}")
    if scene is not None:
        # materialize GT backprojection meshes so the full 3-D metric pipeline
        # (Acc/Comp, tools/culling.py:262-268 protocol) runs on the synthetic
        # scene exactly as it would on a KillingFusion scan
        from morpheus_tpu.eval.backproj import write_backproj_meshes
        dataset.data_dir = write_backproj_meshes(
            scene, os.path.join(workspace, "gt_synth"))

    guidance = None
    if config["guidance"]["model"] and config["guidance"].get("zero123_ckpt"):
        ckpt = config["guidance"]["zero123_ckpt"]
        if ckpt in ("<random>", "<random-tiny>"):
            # full-size random-weight Zero123: exercises the complete SDS
            # path (render → VAE → UNet CFG → grad) at real compute cost when
            # no checkpoint ships in the environment; guidance is then
            # structural, not semantic
            import dataclasses
            import jax
            from morpheus_tpu.guidance.zero123 import (Zero123Guidance,
                                                       Zero123Spec)
            if ckpt == "<random-tiny>":
                # shrunken architecture (still every layer type) so the full
                # SDS CLI path is driveable on CPU in minutes — smoke/verify
                # use only, guidance is structural not semantic
                spec = Zero123Spec(image_size=64, unet_channels=32,
                                   unet_mult=(1, 2), unet_heads=4,
                                   context_dim=32, clip_width=64,
                                   clip_layers=2, clip_heads=4, clip_patch=14)
            else:
                spec = Zero123Spec()
            spec = dataclasses.replace(
                spec, compute_dtype=config["guidance"].get("compute_dtype",
                                                           "float32"))
            guidance = Zero123Guidance.init_random(jax.random.PRNGKey(0),
                                                   spec)
            log(f"Initialized RANDOM-weight Zero123 guidance ({ckpt})")
        elif os.path.exists(ckpt):
            from morpheus_tpu.guidance.zero123 import (Zero123Guidance,
                                                       Zero123Spec)
            import dataclasses
            zcfg = config["guidance"].get("zero123_config", "")
            spec = (Zero123Spec.from_ldm_config(zcfg)
                    if zcfg and os.path.exists(zcfg) else Zero123Spec())
            spec = dataclasses.replace(
                spec, compute_dtype=config["guidance"].get("compute_dtype",
                                                           "float32"))
            guidance = Zero123Guidance.from_checkpoint(
                ckpt, t_range=tuple(config["guidance"]["t_range"]), spec=spec)
            log(f"Loaded Zero123 guidance from {ckpt}")
        else:
            log(f"[warn] zero123 ckpt not found at {ckpt}; "
                "training recon-only (no SDS)")
        if guidance is not None:
            from morpheus_tpu.guidance.zero123 import cast_for_compute
            guidance = cast_for_compute(guidance, spec)

    trainer = Trainer(config, dataset, guidance=guidance,
                      guidance_spec=(spec if guidance is not None else None),
                      workspace=workspace)
    # the trainer keeps a CLIP-less guidance tree (the ViT-L tower is only
    # needed for its one-time embedding precompute); rebind so this scope's
    # reference does not pin the ~1.2 GB f32 tower in HBM for the whole run
    guidance = trainer.guidance

    clip_encoder = None
    clip_ckpt = config["exp"].get("clip_ckpt", "")
    if clip_ckpt and os.path.exists(clip_ckpt):
        from morpheus_tpu.eval.clip_eval import ImageEncoder
        clip_encoder = ImageEncoder.from_clip_checkpoint(clip_ckpt)
        log(f"Loaded CLIP eval encoder from {clip_ckpt}")

    # resume from the newest workspace checkpoint unless told otherwise
    # (preemption recovery — SURVEY.md §5; reference only writes a final ckpt)
    ckpt_mode = config["exp"].get("ckpt", "latest")
    if ckpt_mode and ckpt_mode != "scratch":
        if ckpt_mode == "latest":
            import glob
            cands = sorted(glob.glob(os.path.join(workspace, "models",
                                                  "model_ep_*.pkl")))
            ckpt_path = cands[-1] if cands else None
        else:
            ckpt_path = ckpt_mode
        if ckpt_path and os.path.exists(ckpt_path):
            trainer.load_ckpt(ckpt_path)
            log(f"Resumed from {ckpt_path} (epoch {trainer.epoch})")

    mesh_dir = os.path.join(workspace, "mesh")
    mesh_export.export_mesh(trainer.state.params, trainer.spec,
                            os.path.join(mesh_dir, "init.ply"), cano=True)
    log("Exported init mesh")

    max_epochs = config["train"]["n_epochs"]
    exp = config["exp"]

    # crash-resume repair (VERDICT r4 #2): any mesh_all eval epoch whose
    # metric_3d.txt row was lost to a mid-eval kill is re-evaluated from its
    # on-disk meshes by a detached worker before training continues
    from morpheus_tpu.eval.backfill import backfill_missing, wait_for_evals
    backfill_missing(workspace, dataset.num_frames,
                     exp.get("mesh_all_eval_interval", 0), trainer.epoch,
                     log=log)

    _epoch_loop(trainer, config, dataset, log, workspace, mesh_dir,
                clip_encoder, max_epochs, exp)
    # evals run in detached sessions and survive a trainer crash; on the
    # CLEAN exit path, wait for them so "run COMPLETE" implies the final
    # metric rows are on disk before any post-run pipeline reads them.
    # MORPHEUS_EVAL_DRAIN_S=0 skips the wait (the 1-vCPU ICP stage can take
    # >1 h; a supervised pipeline that re-waits itself — e.g.
    # scripts/round5_after_run.sh — shouldn't idle the chip behind it).
    drain_s = float(os.environ.get("MORPHEUS_EVAL_DRAIN_S", "5400") or 0)
    if drain_s > 0 and not wait_for_evals(workspace, timeout_s=drain_s):
        log("[eval] WARNING: eval workers still running at exit "
            "(detached; rows will land late)")
    log("Training done.")


def _epoch_loop(trainer, config, dataset, log, workspace, mesh_dir,
                clip_encoder, max_epochs, exp):
    from morpheus_tpu import mesh_export
    from morpheus_tpu.vis import video as video_lib
    for epoch in range(trainer.epoch + 1, max_epochs + 1):
        trainer.epoch = epoch
        t0 = time.time()
        try:
            loss = trainer.train_one_epoch()
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e):
                log(f"[oom] RESOURCE_EXHAUSTED at epoch {epoch} "
                    f"(host_step {getattr(trainer, '_host_step', '?')})")
                _live_array_report(log)
            raise
        if epoch % 10 == 0 or epoch == 1:
            log(f"epoch {epoch}/{max_epochs} loss={loss:.4f} "
                f"({time.time() - t0:.2f}s){_hbm_note()}")

        # periodic checkpoint (every mesh_all_interval epochs) + final;
        # exp.ckpt_interval adds a denser cadence for preemption-prone runs
        ci = exp.get("ckpt_interval", 0)
        if (epoch % exp["mesh_all_interval"] == 0 or epoch == max_epochs
                or (ci and epoch % ci == 0)):
            trainer.save_ckpt(os.path.join(workspace, "models",
                                           f"model_ep_{epoch:04d}.pkl"))
            if ci and epoch % exp["mesh_all_interval"] != 0 \
                    and epoch != max_epochs:
                # dense interval ckpts are crash insurance only — prune
                # older ones matching the dense cadence so they don't
                # accumulate. Keepers: mesh_all_interval epochs, anything
                # not on the dense cadence (e.g. a previous run's final
                # ckpt), and the newest ckpt (numeric epoch, not lexical,
                # so >4-digit epochs stay safe).
                import glob as _glob
                import re as _re
                cands = []
                for old in _glob.glob(os.path.join(workspace, "models",
                                                   "model_ep_*.pkl")):
                    m = _re.match(r"model_ep_(\d+)\.pkl$",
                                  os.path.basename(old))
                    if m:
                        cands.append((int(m.group(1)), old))
                cands.sort()
                # keep the TWO newest dense ckpts: if the newest turns out
                # poisoned (e.g. a NaN observed mid-interval before the
                # grad-skip guard existed), the rollback is one interval,
                # not all the way back to the last mesh_all_interval ckpt
                for ep, old in cands[:-2]:
                    if ep % ci == 0 and ep % exp["mesh_all_interval"] != 0 \
                            and ep != max_epochs:
                        os.remove(old)

        if epoch % exp["test_interval"] == 0 or epoch == max_epochs:
            results = os.path.join(workspace, "results")
            video_lib.render_test_video(trainer, results, "test", phis=0)
            video_lib.render_test_video(trainer, results, "test_180", phis=0.5)
            video_lib.render_test_video(trainer, results, "test_cano", cano=True)
            video_lib.render_test_video(trainer, results, "test_360",
                                        view_360=True,
                                        eval_clip=clip_encoder is not None,
                                        clip_encoder=clip_encoder, log=log)
            video_lib.render_test_video(trainer, results, "test_real",
                                        real_view=True)

        if epoch % exp["mesh_interval"] == 0 or epoch == max_epochs:
            mesh_export.export_mesh(
                trainer.state.params, trainer.spec,
                os.path.join(mesh_dir, f"mesh_{epoch:04d}.ply"), cano=True)

        if epoch % exp["mesh_all_interval"] == 0 or epoch == max_epochs:
            from morpheus_tpu.vis import mesh_video
            mesh_all_dir = os.path.join(workspace, "mesh_all")
            resolution = 128 if epoch != max_epochs else 256
            mesh_export.export_all_meshes(
                trainer.state.params, trainer.spec, mesh_all_dir,
                dataset.num_frames, epoch, resolution=resolution)

            images_real = os.path.join(workspace, "images_real",
                                       f"image_{epoch:04d}")
            images_360 = os.path.join(workspace, "images_360",
                                      f"image_{epoch:04d}")
            video_dir = os.path.join(workspace, "videos")
            depth_dir = os.path.join(workspace, "depths",
                                     f"depths_{epoch:04d}")
            mesh_video.render_all_meshes(trainer, mesh_all_dir, images_real,
                                         video_dir, epoch, scale=1,
                                         save_depths_dir=depth_dir)
            mesh_video.render_all_meshes(trainer, mesh_all_dir, images_360,
                                         video_dir, epoch, view_360=True,
                                         video_name="video_360")

            if epoch % exp["mesh_all_eval_interval"] == 0 or epoch == max_epochs:
                # detached worker (own session): a supervisor SIGTERM of the
                # trainer can no longer lose this epoch's metric_3d row
                # (reference runs the same work in threads with exactly that
                # failure mode, morpheus.py:1513-1518)
                from morpheus_tpu.eval.backfill import run_eval_detached
                run_eval_detached(workspace, [epoch], log=log)


if __name__ == "__main__":
    main()
