"""Crash-proof 3-D-metric eval: detached worker + resume backfill.

VERDICT r4 weak #2: the supervisor's stall-watchdog SIGTERM killed the
trainer mid-eval and permanently lost the epoch's metric_3d.txt row (2 of 3
scheduled evals of the round-4 flagship run produced nothing). The fix is
morpheus_tpu.eval.backfill: evals run in their own session (survive trainer
death) and missing rows are detected + re-run from on-disk meshes on resume.
"""
import os
import pathlib
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _write_tiny_meshes(ws, epochs, frames):
    from morpheus_tpu.ops import meshing
    (ws / "mesh_all").mkdir(parents=True, exist_ok=True)
    # edges < max_edge(0.01) so culling's subdivision is a no-op
    v = np.array([[0, 0, 0], [0.004, 0, 0], [0, 0.004, 0]], np.float32)
    v = v + np.array([0.05, 0.05, 0.05], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    for e in epochs:
        for i in range(frames):
            meshing.save_ply(
                str(ws / "mesh_all" / f"mesh_{e:04d}_{i:04d}.ply"), v, f)


def _make_ws(tmp_path, frames=2, mesh_epochs=(400, 800), metric_rows=(400,)):
    ws = tmp_path / "ws"
    ws.mkdir()
    _write_tiny_meshes(ws, mesh_epochs, frames)
    with open(ws / "metric_3d.txt", "w") as fh:
        for e in metric_rows:
            fh.write(f"Ep_{e}:\t Acc:1.0\t Comp:1.0\n")
    return ws


def test_missing_eval_detection(tmp_path):
    from morpheus_tpu.eval.backfill import missing_eval_epochs
    ws = _make_ws(tmp_path)
    # 400 has a row; 800 has meshes but no row; 1200 has no meshes
    assert missing_eval_epochs(str(ws), 2, 400, upto=1300) == [800]
    # a frame missing from the 800 set makes it unrecoverable
    os.remove(ws / "mesh_all" / "mesh_0800_0001.ply")
    assert missing_eval_epochs(str(ws), 2, 400, upto=1300) == []


def test_inflight_guard(tmp_path):
    from morpheus_tpu.eval.backfill import (_inflight_path,
                                            missing_eval_epochs)
    ws = _make_ws(tmp_path)
    # live worker pid -> epoch is skipped
    with open(_inflight_path(str(ws), 800), "w") as f:
        f.write(str(os.getpid()))
    assert missing_eval_epochs(str(ws), 2, 400, upto=800) == []
    # dead pid -> stale pidfile is removed and the epoch re-queued
    with open(_inflight_path(str(ws), 800), "w") as f:
        f.write("999999999")
    assert missing_eval_epochs(str(ws), 2, 400, upto=800) == [800]
    assert not os.path.exists(_inflight_path(str(ws), 800))


PARENT = r"""
import os, signal, sys
sys.path.insert(0, {repo!r})
from morpheus_tpu.eval.backfill import run_eval_detached
p = run_eval_detached({ws!r}, [800])
print("SPAWNED", p.pid, flush=True)
# simulate the supervisor stall-watchdog: the trainer dies hard, mid-eval
os.kill(os.getpid(), signal.SIGKILL)
"""


@pytest.mark.slow
def test_detached_eval_survives_trainer_kill(tmp_path):
    """Kill the 'trainer' right after spawning the eval; the metric row must
    still appear (the exact failure that lost ep-800/1200 in round 4)."""
    import yaml
    ws = _make_ws(tmp_path, metric_rows=())
    cfg = {"data": {"data_dir": "<synthetic>", "synthetic_frames": 2,
                    "synthetic_res": 24}}
    with open(ws / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    r = subprocess.run(
        [sys.executable, "-c", PARENT.format(repo=str(REPO), ws=str(ws))],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO)))
    assert r.returncode == -signal.SIGKILL  # the parent really died
    assert "SPAWNED" in r.stdout

    deadline = time.time() + 300
    row = None
    while time.time() < deadline:
        mf = ws / "metric_3d.txt"
        if mf.exists():
            rows = [ln for ln in open(mf) if ln.startswith("Ep_800")]
            if rows:
                row = rows[0]
                break
        time.sleep(2)
    assert row is not None, (ws / "eval_worker.log").read_text() \
        if (ws / "eval_worker.log").exists() else "no worker log"
    assert "Acc:" in row and "Comp:" in row
    # pidfile cleaned up once the worker finished its epoch
    assert not os.path.exists(ws / ".eval_inflight_0800")
