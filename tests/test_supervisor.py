"""Supervisor circuit-breaker / degraded-mode tests (scripts/run_full_budget.sh).

Round-3 postmortem: the full-budget run hit a deterministic RESOURCE_EXHAUSTED
at the epoch-1001 curriculum transition and the supervisor relaunched the
identical config nine times (~15-28 min of compile each) without ever changing
anything or stopping. These tests drive the real supervisor script with a fake
trainer (TRAINER_CMD/PROBE_CMD hooks) and assert the round-4 behavior:
  - consecutive no-progress failures escalate MORPHEUS_DEGRADE 0 -> 1 -> 2,
  - the breaker opens (exit 1, no more relaunches) after GIVE_UP_AFTER,
  - checkpoint progress resets the failure counter (a flaky-tunnel crash with
    progress never degrades a healthy run).
"""
import os
import pathlib
import subprocess

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SCRIPT = REPO / "scripts" / "run_full_budget.sh"


def _run_supervisor(ws, trainer_cmd, timeout=120, env_extra=None):
    env = dict(os.environ)
    env.update({
        "TRAINER_CMD": trainer_cmd,
        "PROBE_CMD": "true",       # no real TPU probe
        "SLEEP_RETRY": "0",
        "SLEEP_PROBE": "0",
        "WATCH_S": "1",
        "STALL_S": "3600",
        "DEGRADE1_AFTER": "2",
        "DEGRADE2_AFTER": "4",
        "GIVE_UP_AFTER": "6",
    })
    env.update(env_extra or {})
    return subprocess.run(
        ["bash", str(SCRIPT), "unused.yaml", str(ws)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


def test_breaker_escalates_and_opens(tmp_path):
    ws = tmp_path / "ws"
    ws.mkdir()
    attempts = ws / "attempts.txt"
    # deterministic failure, never writes a checkpoint
    cmd = f"sh -c 'echo $MORPHEUS_DEGRADE >> {attempts}; exit 1'"
    r = _run_supervisor(ws, cmd)
    assert r.returncode == 1
    seen = attempts.read_text().split()
    # noprog before each launch: 0,1 -> L0; 2,3 -> L1; 4,5 -> L2; then open
    assert seen == ["0", "0", "1", "1", "2", "2"]
    log = (ws / "supervisor.log").read_text()
    assert "circuit breaker OPEN" in log
    assert log.count("launching trainer") == 6


def test_progress_resets_counter(tmp_path):
    ws = tmp_path / "ws"
    (ws / "models").mkdir(parents=True)
    attempts = ws / "attempts.txt"
    # each attempt makes checkpoint progress, crashes twice, then completes:
    # the counter must reset every time, so no attempt ever degrades
    cmd = (
        "sh -c '"
        f"n=$(ls {ws}/models | wc -l); "
        f"touch {ws}/models/model_ep_$(printf %04d $((n + 1))).pkl; "
        f"echo $MORPHEUS_DEGRADE >> {attempts}; "
        "if [ $n -ge 2 ]; then exit 0; fi; exit 1'"
    )
    r = _run_supervisor(ws, cmd)
    assert r.returncode == 0
    assert attempts.read_text().split() == ["0", "0", "0"]
    log = (ws / "supervisor.log").read_text()
    assert "run COMPLETE" in log
    assert "circuit breaker OPEN" not in log


def test_sigterm_deaths_are_progress_neutral(tmp_path):
    """ADVICE r4 #2: rc-143 (SIGTERM) deaths come from bench's chip pause or
    the stall watchdog — external interventions that must not walk a healthy
    run down the degrade ladder. 4 consecutive checkpoint-less SIGTERM deaths
    would previously have escalated to MORPHEUS_DEGRADE=2."""
    ws = tmp_path / "ws"
    ws.mkdir()
    attempts = tmp_path / "attempts.txt"
    cmd = ("sh -c '"
           f"echo $MORPHEUS_DEGRADE >> {attempts}; "
           f"n=$(wc -l < {attempts}); "
           "if [ $n -ge 5 ]; then exit 0; fi; exit 143'")
    r = _run_supervisor(ws, cmd)
    assert r.returncode == 0
    assert attempts.read_text().split() == ["0"] * 5


def test_tier2_watchdog_kills_cpu_busy_file_silent_hang(tmp_path):
    """ADVICE r4 #4: a hung PJRT client can trickle background-thread CPU
    above the (deliberately tiny) tier-1 bar, disabling it for the exact hang
    class it was built for. The tier-2 bar ignores CPU entirely: no file
    progress under $WS for MTIME_STALL_MULT*STALL_S -> kill."""
    ws = tmp_path / "ws"
    ws.mkdir()
    attempts = tmp_path / "attempts.txt"
    # first launch burns CPU forever without writing a file; second completes.
    # `exec` keeps the spin in the PID the watchdog samples (TRAINER_CMD is
    # eval'd in a subshell; without exec the CPU accrues to a child and
    # tier-1 fires first on its 0-CPU parent)
    cmd = ("exec sh -c '"
           f"echo x >> {attempts}; n=$(wc -l < {attempts}); "
           "if [ $n -ge 2 ]; then exit 0; fi; while :; do :; done'")
    r = _run_supervisor(ws, cmd, timeout=180,
                        env_extra={"STALL_S": "2", "MTIME_STALL_MULT": "2",
                                   "WATCH_S": "1"})
    assert r.returncode == 0
    log = (ws / "supervisor.log").read_text()
    assert "stall(tier2): no FILE progress" in log
    assert "run COMPLETE" in log


def _base_config():
    return {"tpu": {"chain_steps": True},
            "guidance": {"compute_dtype": "float32"},
            "data": {"novel_view_scale_final": 0.5}}


def test_apply_degrade_level1():
    import morpheus
    cfg = _base_config()
    notes = morpheus._apply_degrade(cfg, 1)
    assert cfg["tpu"]["chain_steps"] is False
    assert cfg["guidance"]["compute_dtype"] == "bfloat16"
    assert cfg["data"]["novel_view_scale_final"] == 0.5  # untouched at L1
    assert len(notes) == 2


def test_apply_degrade_level2_shrinks_virtual_views():
    import morpheus
    cfg = _base_config()
    notes = morpheus._apply_degrade(cfg, 2)
    assert cfg["data"]["novel_view_scale_final"] == 0.35
    assert any("SEMANTICS CHANGE" in n for n in notes)


def test_apply_degrade_level0_is_noop():
    import morpheus
    cfg = _base_config()
    assert morpheus._apply_degrade(cfg, 0) == []
    assert cfg == _base_config()
