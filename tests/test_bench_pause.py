"""bench.py chip-freeing pause (bench._pause_full_run).

The driver runs `python bench.py` at round end while the full-budget
supervisor may still have a live trainer on the chip; timing steps behind a
busy trainer measures queue waits, and a merely-SIGSTOPped trainer keeps its
HBM resident on the axon server. The pause must therefore STOP the supervisor
(freezing its relaunch loop + stall watchdog), TERM the trainer child by
exact pid, and CONT the supervisor afterwards so the run resumes from its
last periodic checkpoint. Driven here with a fake supervisor process tree.
"""
import os
import pathlib
import signal
import subprocess
import time

import bench

REPO = pathlib.Path(__file__).resolve().parents[1]


def _state(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[1].split()[0]
    except OSError:
        return "gone"


def _children(pid):
    kids = set()
    import glob
    for f in glob.glob(f"/proc/{pid}/task/*/children"):
        try:
            with open(f) as fh:
                kids.update(int(p) for p in fh.read().split())
        except (OSError, ValueError):
            pass
    return kids


def _cmdline(pid):
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def test_pause_stops_supervisor_and_kills_trainer(tmp_path):
    # fake supervisor whose cmdline contains run_full_budget, with a fake
    # trainer child whose cmdline contains morpheus.py (the extra argv is
    # ignored by python -c)
    script = tmp_path / "fake_run_full_budget.sh"
    script.write_text(
        "#!/bin/bash\n"
        'python3 -c "import time; time.sleep(600)" morpheus.py &\n'
        "wait\n")
    script.chmod(0o755)
    sup = subprocess.Popen(["bash", str(script)])
    try:
        deadline = time.monotonic() + 20
        trainer = None
        while trainer is None and time.monotonic() < deadline:
            for p in _children(sup.pid):
                if "morpheus.py" in _cmdline(p):
                    trainer = p
            time.sleep(0.1)
        assert trainer is not None, "fake trainer never appeared"

        pidfile = tmp_path / "fullrun.pid"
        pidfile.write_text(str(sup.pid))
        os.environ["MORPHEUS_PAUSE_GUARD_S"] = "120"
        try:
            resume = bench._pause_full_run(pidfile=str(pidfile))
        finally:
            del os.environ["MORPHEUS_PAUSE_GUARD_S"]
        assert resume is not None

        assert _state(sup.pid) == "T", "supervisor must be SIGSTOPped"
        # trainer dead (zombie until the stopped supervisor can reap it —
        # what matters is that it no longer runs and its cmdline is gone)
        assert "morpheus.py" not in _cmdline(trainer)

        resume()
        deadline = time.monotonic() + 10
        while _state(sup.pid) == "T" and time.monotonic() < deadline:
            time.sleep(0.1)
        # on CONT the fake supervisor reaps its dead trainer and exits
        assert _state(sup.pid) != "T"
        sup.wait(timeout=10)
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait()


def test_pause_noop_without_matching_supervisor(tmp_path):
    # a recycled/foreign pid must never be signalled: our own pid is alive
    # but is not run_full_budget.sh
    pidfile = tmp_path / "fullrun.pid"
    pidfile.write_text(str(os.getpid()))
    assert bench._pause_full_run(pidfile=str(pidfile)) is None
    assert bench._pause_full_run(pidfile=str(tmp_path / "missing")) is None


def test_main_env_gate_documented():
    # after_run/manual invocations disable the pause with
    # MORPHEUS_BENCH_NO_PAUSE=1 — keep the gate wired in main()
    import inspect
    src = inspect.getsource(bench.main)
    assert "MORPHEUS_BENCH_NO_PAUSE" in src
    assert "_pause_full_run" in src
