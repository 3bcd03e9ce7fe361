"""Benchmark: rays/sec/chip during real-view optimization (the BASELINE.md
north-star metric). Prints ONE JSON line.

Runs the full jitted train step (occupancy marching, field eval with normals,
all losses, grads, Adam) on a synthetic scene at the shipped scene-config
operating point: 2048 rays/step (morpheus.py:826), 128³ occupancy grid,
16-level hash grid, step_size 0.01, sample_budget 16 / band_budget 4 /
smooth_budget 4 (the same tpu section every configs/*.yaml ships), at the
epoch-300 curriculum point (coarse-to-fine has 10/16 hash levels unlocked).
`late` reports the all-16-level step.

Protocol: steady state — global_step starts past the occupancy warmup (a real
run is past step 256 within its first 3 epochs of 220k steps) and the timing
window covers >= 32 steps so the every-16-steps sampled occupancy update is
amortized at its true cadence. The headline value times the SHIPPED training
dispatch path: tpu.chain_steps (default on) scans real_freq=10 real steps per
device dispatch exactly as `python morpheus.py` does; rays_per_sec_isolated
reports the one-dispatch-per-step rate (which additionally pays the ~10 ms
axon-tunnel RPC per step). vs_baseline is rays/sec against a 30k rays/sec
reference-GPU estimate (220k steps x ~2.2k rays in ~4.5h on A100 — the
reference publishes no number, BASELINE.json "published": {}).

Extra fields: sds_step_ms_s02 / sds_step_ms_s05 time one full-size
random-weight Zero123 virtual step (UNet CFG + VAE encode + render) at the
REFERENCE operating points — a 360² scene at novel_view_scale 0.2 (5,184
rendered rays) and 0.5 (32,400 rays, the post-epoch-800 point), matching
/root/reference/datasets/dataset.py:540-543 + configs/snoopy.yaml:5-6.
(Rounds 1-2 reported `sds_step_ms` at a 128² scene / 625 rays; that field is
retired — do not compare across rounds.) mfu is XLA's cost-analysis FLOPs
over the measured step time against v5e bf16 peak (197 TFLOP/s) — the step
is f32-dominated, so this is a lower bound / utilization indicator, not a
kernel-level roofline.

Chip ownership: if the full-budget supervisor (scripts/run_full_budget.sh)
has a live trainer on the chip, bench pauses it first (_pause_full_run:
SIGSTOP supervisor, SIGTERM trainer, SIGCONT at exit) — otherwise the timing
loops measure queue waits behind the trainer and the resident trainer HBM
OOMs the SDS variants. Disable with MORPHEUS_BENCH_NO_PAUSE=1.

Runtime guard: cold compiles on a 1-vCPU host take minutes per jitted
variant (the persistent cache at /tmp/jax_comp_cache makes reruns fast).
The headline JSON is printed BEFORE the optional SDS sections and re-printed
(superset, same schema) at the end, so an external timeout mid-SDS-compile
never loses the headline. Each SDS variant also checks elapsed wall-clock
against BENCH_BUDGET_S (env, default 5400 s) before starting. BENCH_SDS=all
adds the bf16-UNet variant; BENCH_SDS=0 skips SDS entirely. Skips are
recorded in sds_skipped as {label: reason} so a missing field is always
distinguishable from a deliberate skip.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

BASELINE_RAYS_PER_SEC = 30000.0
V5E_PEAK_FLOPS = 197e12  # bf16; f32 ~ half

_T0 = time.perf_counter()


def _phase(name: str) -> None:
    print(f"bench: [{time.perf_counter() - _T0:7.1f}s] {name}",
          file=sys.stderr, flush=True)

# The bench operating point. scripts/profile_step.py imports this as its
# ablation BASE so the cost split is always measured at the same point as
# the headline number.
BENCH_POINT_CFG = {
    "data": {"data_dir": "<synthetic>"},
    "exp": {"seed": 0, "save_guidance": False},
    "train": {"real_ray_num": 2048, "real_freq": 1, "n_iters": 1},
    "model": {"bg_radius": 0.0},
    "render": {"step_size": 0.01},
    "tpu": {"max_samples_per_ray": 64, "march_steps": 288,
            "occ_resolution": 128, "occ_warmup_steps": 256,
            "occ_update_every": 16, "occ_sample_fraction": 0.0625,
            "grad_payload": "bfloat16",
            # timing loops re-feed saved states (e.g. state_late re-uses the
            # base state's buffers); donation would invalidate them
            "donate_state": False,
            "sample_budget": 16, "band_budget": 4, "smooth_budget": 4},
}


def _pause_full_run(pidfile="/tmp/fullrun.pid"):
    """Free the chip if the full-budget supervisor (run_full_budget.sh) has a
    live trainer on it: SIGSTOP the supervisor (freezes its relaunch loop and
    stall watchdog), SIGTERM its trainer child by exact pid (a merely-stopped
    client would keep its HBM arrays resident on the axon server and OOM this
    bench), and SIGCONT the supervisor at exit so it resumes the run from the
    last exp.ckpt_interval checkpoint. A detached
    sleep-guard CONTs the supervisor even if this process is SIGKILLed
    mid-bench, so the run can never stay frozen. Without this, a round-end
    bench contends with the trainer for the chip and times queue waits
    instead of steps."""
    import atexit
    import glob
    import signal
    import subprocess

    def cmdline(pid):
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                return f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            return ""

    try:
        with open(pidfile) as f:
            sup = int(f.read().strip())
    except (OSError, ValueError):
        return None
    # pid-reuse sanity: only ever signal a process that IS the supervisor
    if "run_full_budget" not in cmdline(sup):
        return None

    # tether the fail-safe guard to the bench budget (ADVICE r4 #3): the
    # budget is only checked BEFORE each SDS variant starts, so a variant
    # beginning near budget_s can overrun it by a full compile+timing pass;
    # 1.5x + 30 min slack keeps the guard strictly after any legitimate
    # bench end, while MORPHEUS_PAUSE_GUARD_S still force-overrides
    try:
        _budget = float(os.environ.get("BENCH_BUDGET_S", "5400"))
    except ValueError:
        _budget = 5400.0
    guard_s = int(os.environ.get("MORPHEUS_PAUSE_GUARD_S",
                                 str(int(max(7200, 1.5 * _budget + 1800)))))
    guard = subprocess.Popen(
        ["bash", "-c", f"sleep {guard_s}; kill -CONT {sup} 2>/dev/null"],
        start_new_session=True)

    def _resume():
        try:
            os.kill(sup, signal.SIGCONT)
        except OSError:
            pass
        if guard.poll() is None:
            guard.kill()

    atexit.register(_resume)  # registered BEFORE stopping: a crash anywhere
    _phase(f"pausing full-budget supervisor (pid {sup}) to free the chip")
    os.kill(sup, signal.SIGSTOP)

    kids = set()
    for f in glob.glob(f"/proc/{sup}/task/*/children"):
        try:
            with open(f) as fh:
                kids.update(int(p) for p in fh.read().split())
        except (OSError, ValueError):
            pass
    trainers = [p for p in sorted(kids) if "morpheus.py" in cmdline(p)]
    for pid in trainers:
        try:
            os.kill(pid, signal.SIGTERM)
        except OSError:
            pass
    deadline = time.monotonic() + 60
    # a dead-but-unreaped child (the stopped supervisor can't wait() yet)
    # reads back an empty cmdline, so this loop sees it as gone
    while (any("morpheus.py" in cmdline(p) for p in trainers)
           and time.monotonic() < deadline):
        time.sleep(1.0)
    for pid in trainers:
        if "morpheus.py" in cmdline(pid):
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
    if trainers:
        _phase(f"trainer pid(s) {trainers} stopped; waiting 5s for the "
               "axon server to release their HBM")
        time.sleep(5.0)
    return _resume


def _pause_ab_run(pidfile="/tmp/ab_run.pid"):
    """SIGSTOP a live quality-A/B trainer (scripts/run_ab.sh publishes its
    pid) for the duration of the bench, SIGCONT at exit. Unlike the
    full-budget trainer it is merely stopped, not killed: its recon-only
    HBM residency is small (no Zero123 weights), so the bench's SDS variants
    still fit, and stopping preserves the arm's progress exactly."""
    import atexit
    import signal

    try:
        with open(pidfile) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return None
    if "morpheus.py" not in cmd:  # pid-reuse sanity
        return None

    def _resume():
        try:
            os.kill(pid, signal.SIGCONT)
        except OSError:
            pass

    atexit.register(_resume)
    _phase(f"pausing A/B trainer (pid {pid}) for the bench")
    os.kill(pid, signal.SIGSTOP)
    # fail-safe CONT even if this process is SIGKILLed mid-bench
    import subprocess
    try:
        _budget = float(os.environ.get("BENCH_BUDGET_S", "5400"))
    except ValueError:
        _budget = 5400.0
    guard_s = int(os.environ.get("MORPHEUS_PAUSE_GUARD_S",
                                 str(int(max(7200, 1.5 * _budget + 1800)))))
    subprocess.Popen(
        ["bash", "-c", f"sleep {guard_s}; kill -CONT {pid} 2>/dev/null"],
        start_new_session=True)
    return _resume


def _time_steps(step_fn, state, epoch, n=32, warmup=6):
    key = jax.random.PRNGKey(0)
    t_c = time.perf_counter()
    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    compile_s = time.perf_counter() - t_c
    float(loss)  # block_until_ready is a no-op on axon — force readback
    t0 = time.perf_counter()
    for _ in range(n):
        key, k = jax.random.split(key)
        state, loss = step_fn(state, k, epoch)
    float(loss)
    return (time.perf_counter() - t0) / n, compile_s, state, loss


def _flops_estimate(step_fn, state, epoch):
    try:
        key = jax.random.PRNGKey(0)
        comp = step_fn.lower(state, key, epoch).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def main():
    if os.environ.get("MORPHEUS_BENCH_NO_PAUSE", "0") != "1":
        _pause_full_run()
        _pause_ab_run()
    from morpheus_tpu.utils import setup_compilation_cache
    setup_compilation_cache()

    from morpheus_tpu.config import merge_defaults
    from morpheus_tpu.data import dataset as data_lib
    from morpheus_tpu.data.synthetic import make_synthetic_scene
    from morpheus_tpu.train.trainer import Trainer

    import copy
    cfg = merge_defaults(copy.deepcopy(BENCH_POINT_CFG))
    scene = make_synthetic_scene(num_frames=8, H=128, W=128)
    ds = data_lib.DeformDataset(cfg, scene=scene)
    trainer = Trainer(cfg, ds)

    rays = cfg["train"]["real_ray_num"]
    import jax.numpy as jnp

    # real-view step at the epoch-300 operating point (10/16 levels unlocked),
    # steady state: global_step = epoch*110 steps, past occ warmup
    trainer.epoch = 300
    epoch = jnp.asarray(300.0)
    state = trainer.state._replace(global_step=jnp.asarray(33000, jnp.int32))
    step_fn = trainer._make_real_step(trainer._active_levels())
    _phase("compiling isolated real step")
    dt_iso, compile_s, state, loss = _time_steps(step_fn, state, epoch)
    _phase("flops estimate")
    flops, hbm_bytes = _flops_estimate(step_fn, trainer.state._replace(
        global_step=jnp.asarray(33000, jnp.int32)), epoch)

    # primary number: the shipped training path — tpu.chain_steps (default on)
    # scans real_freq=10 real steps per dispatch (reference inner loop,
    # morpheus.py:1415-1424), amortizing the ~10 ms/dispatch axon-tunnel RPC
    # that the isolated-step timing above pays per step
    chain_n = 10
    _phase("compiling chained step")
    chained = trainer._make_real_steps_chained(trainer._active_levels(),
                                               n=chain_n)
    ckey = jax.random.PRNGKey(3)
    cstate = state
    for _ in range(2):  # compile + settle
        cstate, ckey, closs = chained(cstate, ckey, epoch)
    float(closs)
    t0 = time.perf_counter()
    n_disp = 4
    for _ in range(n_disp):
        cstate, ckey, closs = chained(cstate, ckey, epoch)
    float(closs)
    dt = (time.perf_counter() - t0) / (n_disp * chain_n)
    rays_per_sec = rays / dt

    # late-curriculum step: all 16 levels active (epoch > 0.95 * n_epochs)
    _phase("compiling late-curriculum step")
    trainer.epoch = 1900
    epoch_late = jnp.asarray(1900.0)
    state_late = state._replace(global_step=jnp.asarray(209000, jnp.int32))
    step_late = trainer._make_real_step(trainer._active_levels())
    dt_late, _, _, _ = _time_steps(step_late, state_late, epoch_late, n=16)

    # sustained rate through the REAL epoch loop (train_one_epoch: host key
    # splits, chained dispatch, EMA step, python overhead) — ties the
    # chained-dispatch headline to what `python morpheus.py` actually holds;
    # the round-3 full-run log implied ~20% below the bench value and nothing
    # committed measured it
    _phase("epoch-loop sustained rate")
    dt_sustained = None
    try:
        trainer.epoch = 300
        trainer.config["train"]["real_freq"] = chain_n
        trainer.config["train"]["n_iters"] = 10
        trainer.state = state._replace(
            global_step=jnp.asarray(33000, jnp.int32))
        trainer._host_step = 33000
        trainer.train_one_epoch()  # compile/settle (single variant + chain)
        steps_per_epoch = (1 + chain_n) * 10
        t0 = time.perf_counter()
        trainer.train_one_epoch()
        trainer.train_one_epoch()
        jax.block_until_ready(trainer.state.params)
        float(jnp.asarray(trainer.state.global_step))
        dt_sustained = (time.perf_counter() - t0) / (2 * steps_per_epoch)
    except Exception as e:  # never lose the headline to the extra metric
        print(f"bench: epoch-loop rate failed: {e!r}", file=sys.stderr,
              flush=True)

    out = {
        "metric": "rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "steps_per_sec": round(1.0 / dt, 2),
        "rays_per_sec_isolated": round(rays / dt_iso, 1),
        "rays_per_sec_late": round(rays / dt_late, 1),
        **({"rays_per_sec_epoch_loop": round(rays / dt_sustained, 1)}
           if dt_sustained else {}),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "loss": float(loss),
    }
    if flops:
        out["step_gflops"] = round(flops / 1e9, 1)
        out["mfu_vs_bf16_peak"] = round(flops / dt / V5E_PEAK_FLOPS, 4)
    if hbm_bytes:
        # XLA cost-analysis 'bytes accessed' per step. This is the compiler's
        # pre-fusion traffic ESTIMATE, not achieved HBM bandwidth — on this
        # step it overstates real traffic ~4x (round-3 published it as
        # "hbm_util_vs_peak: 4.267", i.e. 427% of the v5e's physical 819 GB/s
        # peak, which is unphysical). Labeled as what it is; the achieved
        # per-phase GB/s figure lives in `scripts/profile_step.py --roofline`
        # (wall-clock ablations), not here.
        out["xla_cost_bytes_gb"] = round(hbm_bytes / 1e9, 2)
    # headline prints FIRST so an external timeout during the (multi-minute)
    # SDS compiles below can never lose the whole run; the final print below
    # re-emits a superset with the SDS fields (consumers take the last line)
    print(json.dumps(out), flush=True)

    # full-size random-weight Zero123 SDS virtual steps (no ckpt in image) at
    # the REFERENCE ray counts: 360² scene, novel_view_scale 0.2 → 5,184 rays
    # and 0.5 → 32,400 rays (datasets/dataset.py:540-543, snoopy.yaml:5-6).
    # BENCH_SDS=all adds guidance.compute_dtype=bfloat16 (the reference's
    # fp16-autocast analogue). Each variant is a multi-minute cold compile on
    # this host, so each checks the budget first.
    try:
        # default sized so a fully cold cache still reaches the s05 variant
        # (round-3 skipped it at 900 s; its compile alone is ~15 min here)
        budget_s = float(os.environ.get("BENCH_BUDGET_S", "5400"))
    except ValueError:
        print("bench: malformed BENCH_BUDGET_S, using 5400", file=sys.stderr)
        budget_s = 5400.0
    sds_mode = os.environ.get("BENCH_SDS", "1")
    sds_ms = {}
    sds_skipped = {}
    try:
        import dataclasses

        from morpheus_tpu.guidance import zero123 as z123

        scene_v = make_synthetic_scene(num_frames=8, H=360, W=360)
        ds_v = data_lib.DeformDataset(cfg, scene=scene_v)

        def time_sds(gspec, label, scale, ep=300):
            if sds_mode == "0":
                sds_skipped[label] = "BENCH_SDS=0"
                return
            if time.perf_counter() - _T0 > budget_s:
                _phase(f"SKIP {label} (over {budget_s:.0f}s budget)")
                sds_skipped[label] = f"over {budget_s:.0f}s budget"
                return
            _phase(f"compiling SDS virtual step ({label})")
            g = z123.cast_for_compute(
                z123.Zero123Guidance.init_random(jax.random.PRNGKey(1),
                                                 gspec), gspec)
            trainer_v = Trainer(cfg, ds_v, guidance=g, guidance_spec=gspec)
            # CLIP-less rebind (as morpheus.py main does): the full tree
            # pins the dead ViT-L tower in HBM and OOMs the late variants
            g = trainer_v.guidance
            trainer_v.epoch = ep
            vstep = trainer_v._virtual_step_for_scale(
                scale, trainer_v._active_levels())
            st = trainer_v.state._replace(
                global_step=jnp.asarray(33001, jnp.int32))
            ep_arr = jnp.asarray(float(ep))
            key = jax.random.PRNGKey(2)
            for _ in range(3):
                key, k = jax.random.split(key)
                st, vloss, _ = vstep(st, g, trainer_v._embeddings, k, ep_arr)
            float(vloss)
            t0 = time.perf_counter()
            nv = 8
            for _ in range(nv):
                key, k = jax.random.split(key)
                st, vloss, _ = vstep(st, g, trainer_v._embeddings, k, ep_arr)
            float(vloss)
            sds_ms[label] = (time.perf_counter() - t0) / nv * 1000.0

        gspec = z123.Zero123Spec()
        bf16 = dataclasses.replace(gspec, compute_dtype="bfloat16")
        # s05 first: the post-epoch-800 operating point (32,400 rays) is the
        # number every round so far has been missing — if the budget only
        # covers one variant, it must be this one
        time_sds(gspec, "sds_step_ms_s05", 0.5)
        time_sds(gspec, "sds_step_ms_s02", 0.2)
        # the full-budget run's ACTUAL post-800 operating point: bf16 UNet
        # (configs/synthetic_full.yaml guidance.compute_dtype) + all 16 hash
        # levels (epoch 1900) + 32,400 rays — the regime that owns ~70% of
        # the reference budget's wall-clock (snoopy.yaml:5-6 after ep 800)
        time_sds(bf16, "sds_step_ms_bf16_s05_late", 0.5, ep=1900)
        if sds_mode == "all":
            time_sds(bf16, "sds_step_ms_bf16_s05", 0.5)
            time_sds(bf16, "sds_step_ms_bf16_s02", 0.2)
    except Exception as e:
        # SDS timing is best-effort (full-size UNet may OOM a small host),
        # but a breakage must be visible, not a silently missing field
        import traceback
        print(f"bench: SDS timing failed: {e!r}", file=sys.stderr)
        traceback.print_exc()
        sds_skipped.setdefault("sds", f"failed: {e!r}")

    for label, ms in sds_ms.items():
        out[label] = round(ms, 1)
    if sds_skipped:
        out["sds_skipped"] = sds_skipped
    print(json.dumps(out))


if __name__ == "__main__":
    main()
