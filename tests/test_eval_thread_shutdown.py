"""Regression: background 3-D-metric eval must survive a crashing epoch loop.

morpheus.py runs eval_mesh/eval_depthL1 on plain threads. Python >= 3.9
refuses new concurrent.futures work once the main thread returns ("cannot
schedule new futures after interpreter shutdown"), so an eval thread still
running when the trainer crashed used to lose its epoch's metrics silently
(observed on the round-3 full-budget run, supervisor.log 14:21). Two
guarantees now hold:

1. concurrent.futures is imported at module scope of eval.culling — a first
   import from the eval thread during shutdown raised "can't register atexit
   after shutdown".
2. morpheus.main joins eval threads in a `finally`, so even an exception in
   the epoch loop (the OOM case) lets in-flight evals finish BEFORE the main
   thread returns. This test reproduces the crash shape in a subprocess and
   asserts the executor work completes.
"""
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]

CRASHING_LOOP = r"""
import threading, time
import morpheus_tpu.eval.culling as culling

# guarantee 1: the symbol is module-scope (moving the import back inside
# eval_mesh_3d turns this into an AttributeError)
assert hasattr(culling, "ThreadPoolExecutor")

def eval_work():
    time.sleep(0.5)  # still in flight when the "trainer" crashes below
    with culling.ThreadPoolExecutor(2) as ex:
        assert ex.submit(lambda: 42).result() == 42
    print("POOL_OK", flush=True)

threads = [threading.Thread(target=eval_work)]
try:  # guarantee 2: the morpheus.main crash path — join in a finally
    threads[0].start()
    raise RuntimeError("RESOURCE_EXHAUSTED (simulated trainer crash)")
finally:
    for t in threads:
        t.join()
"""


def test_eval_threads_survive_crashing_epoch_loop():
    r = subprocess.run([sys.executable, "-c", CRASHING_LOOP], cwd=REPO,
                       capture_output=True, text=True, timeout=120,
                       env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": str(REPO)})
    # the simulated crash must still propagate (supervisor sees rc != 0) ...
    assert r.returncode != 0
    assert "RESOURCE_EXHAUSTED (simulated trainer crash)" in r.stderr
    # ... but the in-flight eval completed its executor work first
    assert "POOL_OK" in r.stdout, r.stderr
    assert "cannot schedule new futures" not in r.stderr


def test_morpheus_main_uses_detached_eval():
    """Round-5 design: evals run via detached workers (survive trainer
    SIGTERM), missing rows are backfilled on resume, and the clean exit path
    waits for inflight evals so 'run COMPLETE' implies the metric rows are on
    disk. Keep all three wired in morpheus.py (see
    morpheus_tpu/eval/backfill.py and tests/test_eval_backfill.py)."""
    src = (REPO / "morpheus.py").read_text()
    body = src.split("def main(", 1)[1]
    assert "backfill_missing(" in body, \
        "morpheus.main lost the resume-time missing-eval backfill"
    assert "wait_for_evals(" in body, \
        "morpheus.main lost the clean-exit eval drain"
    loop = src.split("def _epoch_loop(", 1)[1]
    assert "run_eval_detached(" in loop, \
        "_epoch_loop lost the detached (crash-proof) eval launch"
