"""Small shared utilities (reference: utils.py, morpheus.py:75-103,360-364)."""
from __future__ import annotations

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np


def setup_compilation_cache(path: str = "/tmp/jax_comp_cache") -> None:
    """Enable JAX's persistent compilation cache — the train-step graph takes
    minutes to compile cold on TPU; reruns on the same host then start fast."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy and return a JAX PRNG key (reference: utils.py:63-68)."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """L2-normalize along the last axis (reference: utils.py:70-71)."""
    return x / jnp.sqrt(jnp.clip(jnp.sum(x * x, -1, keepdims=True), min=eps))


def mse2psnr(x: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def coordinates(voxel_dim, flatten: bool = True) -> np.ndarray:
    """Integer grid coordinates of a voxel volume (reference: utils.py:76-89)."""
    if isinstance(voxel_dim, int):
        nx = ny = nz = voxel_dim
    else:
        nx, ny, nz = voxel_dim
    x, y, z = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    if not flatten:
        return np.stack([x, y, z], axis=-1)
    return np.stack([x.ravel(), y.ravel(), z.ravel()])


class Logger:
    """Append-to-file + console logger (reference: morpheus.py:92-103,360-364)."""

    def __init__(self, workspace: str | None, log_name: str = "log.txt"):
        self.workspace = workspace
        self._fh = None
        if workspace is not None:
            os.makedirs(workspace, exist_ok=True)
            self._fh = open(os.path.join(workspace, log_name), "a+")

    def __call__(self, *args):
        msg = " ".join(str(a) for a in args)
        print(msg, flush=True)
        if self._fh is not None:
            stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
            print(f"[{stamp}] {msg}", file=self._fh)
            self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def get_device_mem() -> tuple[float, list[float]]:
    """Per-device HBM usage in GB (reference get_GPU_mem, utils.py:46-53)."""
    mems = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
            mems.append(round(stats.get("bytes_in_use", 0) / 1024 ** 3, 3))
        except Exception:
            mems.append(0.0)
    return sum(mems), mems


class StepTimer:
    """Lightweight per-phase step timing + optional jax.profiler traces
    (SURVEY §5: the reference has no profiling; this is the TPU-native
    observability layer)."""

    def __init__(self, trace_dir: str | None = None):
        self.trace_dir = trace_dir
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._tracing = False

    def start_trace(self):
        if self.trace_dir and not self._tracing:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True

    def stop_trace(self):
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    class _Span:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            t = self.timer
            t.totals[self.name] = t.totals.get(self.name, 0.0) + dt
            t.counts[self.name] = t.counts.get(self.name, 0) + 1

    def span(self, name: str) -> "_Span":
        return self._Span(self, name)

    def summary(self) -> str:
        return " ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1000:.1f}ms"
            for k in sorted(self.totals))


def file_backup(workspace: str, repo_root: str | None = None) -> None:
    """Snapshot the framework sources into workspace/recording/ for
    reproducibility (reference file_backup, morpheus.py:75-90: copies ./,
    ./models, ./datasets *.py)."""
    import shutil

    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    rec = os.path.join(workspace, "recording")
    for base, _dirs, files in os.walk(os.path.join(root, "morpheus_tpu")):
        for f in files:
            if f.endswith((".py", ".cpp", ".h")):
                src = os.path.join(base, f)
                dst = os.path.join(rec, os.path.relpath(src, root))
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)
    for f in os.listdir(root):
        if f.endswith(".py"):
            os.makedirs(rec, exist_ok=True)
            shutil.copyfile(os.path.join(root, f), os.path.join(rec, f))
