"""Occupancy grid + fixed-shape ray marching.

TPU-native replacement for NeRFAcc's OccGridEstimator (reference usage:
morpheus.py:196-202,628-638,905-913). The CUDA estimator returns a *ragged*
(ray_indices, t_starts, t_ends) stream; that is hostile to XLA's static-shape
compilation, so this module instead:

  1. intersects each ray with the AABB,
  2. takes M stratified fixed-step candidates along the ray (step = render
     step_size, like nerfacc's grid marching),
  3. masks candidates by the binarized occupancy grid,
  4. compacts the first K occupied candidates per ray into a dense
     (N, K) buffer with a validity mask (cumsum + scatter, no sorting).

The EMA occupancy update mirrors nerfacc's update_every_n_steps: jittered cell
centers are re-evaluated, occs = max(occs*decay, new), binaries = occs >
min(mean(occs), threshold); all cells during warmup, a random quarter after.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyState(NamedTuple):
    occs: jnp.ndarray      # (R^3,) float32 EMA density·step estimates
    binaries: jnp.ndarray  # (R, R, R) bool


def init_occupancy(resolution: int) -> OccupancyState:
    return OccupancyState(
        occs=jnp.zeros((resolution ** 3,), jnp.float32),
        binaries=jnp.ones((resolution,) * 3, dtype=bool),
    )


def cell_centers(resolution: int, bound: float) -> np.ndarray:
    """(R^3, 3) cell centers of the grid over [-bound, bound]^3."""
    g = (np.arange(resolution) + 0.5) / resolution
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (np.stack([x, y, z], -1).reshape(-1, 3) * 2.0 - 1.0) * bound


def update_occupancy(state: OccupancyState, key: jax.Array, density_fn,
                     step: jnp.ndarray, bound: float,
                     step_size: float, *, warmup_steps: int = 256,
                     ema_decay: float = 0.95, threshold: float = 0.01,
                     sample_fraction: float = 0.25) -> OccupancyState:
    """One EMA update. density_fn(x (M,3)) -> sigma (M,). `step` may be traced:
    warmup (all cells) vs sampled update is a jnp.where blend so the whole train
    step stays one compiled program."""
    R = state.binaries.shape[0]
    n_cells = R ** 3
    k_jit, k_sel = jax.random.split(key)

    centers = jnp.asarray(cell_centers(R, bound), jnp.float32)
    cell = 2.0 * bound / R
    jitter = (jax.random.uniform(k_jit, centers.shape) - 0.5) * cell

    n_sample = int(n_cells * sample_fraction)
    sel = jax.random.randint(k_sel, (n_sample,), 0, n_cells)

    warm = step < warmup_steps

    # Evaluate the full grid during warmup; afterwards only the sampled quarter
    # matters but we keep one fixed shape by evaluating the full grid and
    # masking. To avoid paying 4x after warmup, callers can switch to
    # update_occupancy_sampled once warmup is statically over.
    x = centers + jitter
    occ_new = density_fn(x).reshape(-1) * step_size

    sel_mask = jnp.zeros((n_cells,), bool).at[sel].set(True)
    update_mask = jnp.where(warm, jnp.ones((n_cells,), bool), sel_mask)

    occs = jnp.where(update_mask,
                     jnp.maximum(state.occs * ema_decay, occ_new),
                     state.occs)
    thresh = jnp.minimum(jnp.mean(occs), threshold)
    binaries = (occs > thresh).reshape(R, R, R)
    return OccupancyState(occs=occs, binaries=binaries)


def update_occupancy_sampled(state: OccupancyState, key: jax.Array, density_fn,
                             bound: float, step_size: float, *,
                             ema_decay: float = 0.95, threshold: float = 0.01,
                             sample_fraction: float = 0.25,
                             update_index=None) -> OccupancyState:
    """Post-warmup update that only evaluates the sampled cells (cheaper).

    When `update_index` (traced int: how many sampled updates have happened)
    is given, cells are visited by a strided rotation — sel_i = (i + k·n)·P
    mod R³ with P odd (coprime to the power-of-two cell count) — so EVERY
    cell is refreshed once per ceil(1/fraction) updates, unlike independent
    uniform draws whose coverage has a long tail. The density eval at
    R³·fraction points dominates the cost of this update (measured v5e:
    ~330 ms at 128³·¼ through the full warp+SDF stack), so `sample_fraction`
    is the occ-vs-staleness knob (tpu.occ_sample_fraction)."""
    R = state.binaries.shape[0]
    n_cells = R ** 3
    n_sample = max(1, int(n_cells * sample_fraction))
    k_jit, k_sel = jax.random.split(key)

    if update_index is None:
        sel = jax.random.randint(k_sel, (n_sample,), 0, n_cells)
    else:
        stride = jnp.uint32(2654435761 % n_cells) | jnp.uint32(1)
        base = (jnp.uint32(update_index) * jnp.uint32(n_sample)
                + jnp.arange(n_sample, dtype=jnp.uint32))
        sel = ((base * stride) % jnp.uint32(n_cells)).astype(jnp.int32)
    centers = jnp.asarray(cell_centers(R, bound), jnp.float32)[sel]
    cell = 2.0 * bound / R
    jitter = (jax.random.uniform(k_jit, centers.shape) - 0.5) * cell

    occ_new = density_fn(centers + jitter).reshape(-1) * step_size
    occs = state.occs.at[sel].set(
        jnp.maximum(state.occs[sel] * ema_decay, occ_new))
    thresh = jnp.minimum(jnp.mean(occs), threshold)
    return OccupancyState(occs=occs, binaries=(occs > thresh).reshape(R, R, R))


def ray_aabb(rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: float,
             eps: float = 1e-9):
    """Slab-test ray/AABB intersection → (t_near, t_far), t_near >= 0."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < eps, jnp.sign(rays_d) * eps + eps,
                            rays_d)
    t0 = (-bound - rays_o) * inv_d
    t1 = (bound - rays_o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, 0.0)
    return t_near, t_far


def occupancy_lookup(binaries: jnp.ndarray, x: jnp.ndarray,
                     bound: float) -> jnp.ndarray:
    """Boolean occupancy of points x (..., 3) in [-bound, bound]^3."""
    R = binaries.shape[0]
    idx = jnp.clip(((x + bound) / (2.0 * bound) * R).astype(jnp.int32), 0, R - 1)
    return binaries[idx[..., 0], idx[..., 1], idx[..., 2]]


def occs_lookup(occs: jnp.ndarray, resolution: int, x: jnp.ndarray,
                bound: float) -> jnp.ndarray:
    """Float EMA occupancy (σ·dt estimate) of points x (..., 3)."""
    R = resolution
    idx = jnp.clip(((x + bound) / (2.0 * bound) * R).astype(jnp.int32), 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    return occs[flat]


def march_rays(key: jax.Array, state: OccupancyState, rays_o: jnp.ndarray,
               rays_d: jnp.ndarray, bound: float, step_size: float,
               march_steps: int, max_samples: int, stratified: bool = True,
               return_score: bool = False, score_uniform_mix: float = 0.0,
               occ_threshold: float | None = None):
    """Fixed-shape occupancy-culled ray marching with importance compaction.

    Returns (t_starts (N, K), t_ends (N, K), mask (N, K)) — the dense analogue
    of nerfacc OccGridEstimator.sampling (morpheus.py:628-638). Candidates are
    `march_steps` fixed steps of size `step_size` from t_near (stratified start
    like nerfacc's stratified=True), masked by the binarized grid.

    Where nerfacc returns ALL occupied candidates as a ragged stream, the K-slot
    budget here is filled by *importance*: the grid's float EMA values (already
    σ·dt estimates) give approximate alphas → approximate rendering weights
    along the ray, and the top-K contributing candidates are kept (ties break
    toward earlier samples). This keeps the window centred on the first surface
    even when the occupancy blob is much longer than K·step, and evaluates the
    field on strictly fewer samples than the reference.
    """
    N = rays_o.shape[0]
    M, K = march_steps, max_samples
    t_near, t_far = ray_aabb(rays_o, rays_d, bound)

    if stratified:
        jitter = jax.random.uniform(key, (N, 1))
    else:
        jitter = jnp.full((N, 1), 0.5)

    steps = jnp.arange(M, dtype=jnp.float32)[None, :]          # (1, M)
    t0 = t_near[:, None] + (steps + jitter) * step_size         # starts
    t1 = t0 + step_size
    tm = 0.5 * (t0 + t1)

    inside = tm < t_far[:, None]
    xs = rays_o[:, None, :] + rays_d[:, None, :] * tm[..., None]
    R = state.binaries.shape[0]
    if occ_threshold is None:
        occ = occupancy_lookup(state.binaries, xs, bound) & inside  # (N, M)
        o_val = occs_lookup(state.occs, R, xs, bound)               # (N, M)
    else:
        # single gather: binaries are exactly occs > min(mean, threshold)
        # (update_occupancy:81-82), so the boolean mask is derived from the
        # float lookup — halves the N*M random-access rows of the march.
        # A never-updated grid (occs all zero) is fully occupied, matching
        # the optimistic binaries=ones init — without this, a fresh state
        # marched through this path sees an all-empty grid (o_val > 0 is
        # False everywhere) and every render mask comes back dead.
        o_val = occs_lookup(state.occs, R, xs, bound)               # (N, M)
        mean = jnp.mean(state.occs)
        thresh = jnp.minimum(mean, occ_threshold)
        occ = ((o_val > thresh) | (mean == 0.0)) & inside
    tau = jnp.where(occ, jnp.clip(o_val, 0.0, 20.0), 0.0)
    tau_cum = jnp.concatenate([jnp.zeros_like(tau[:, :1]),
                               jnp.cumsum(tau, -1)[:, :-1]], -1)
    w_approx = -jnp.expm1(-tau) * jnp.exp(-tau_cum)              # (N, M)
    # score: approximate weight, with a small front-to-back bias so that rays
    # with uninformative occs (fresh grid) keep their first K occupied samples
    front_bias = (M - steps) / M * 1e-6
    score = jnp.where(occ, w_approx + front_bias + 1e-8, -1.0)
    if score_uniform_mix > 0.0:
        # mix a uniform random term so that, when the downstream sample
        # budget binds, the tail of the budget fills ~uniformly at random
        # from occupied candidates instead of strictly by approximate weight
        # — preserving free-space (pre-surface) coverage for fs_loss, whose
        # support the reference's take-everything ragged stream keeps in full
        # (ADVICE r1: weight-ranked dropping preferentially starves fs
        # supervision). Off by default; opt in via tpu.budget_uniform_mix.
        u = jax.random.uniform(jax.random.fold_in(key, 11), (N, M))
        score = jnp.where(occ, score + score_uniform_mix * u, score)

    # approx_max_k: TPU's fused approximate top-k (recall ~0.95) — exact
    # lax.top_k costs 18 ms for this (N, M)->K selection on v5e vs ~1 ms
    # approximate; misses drop borderline candidates, and the stratified
    # jitter re-randomizes them every step. Non-TPU backends fall back to an
    # exact sort-based top-k, so CPU tests keep exact semantics.
    _, idx = jax.lax.approx_max_k(score, K, recall_target=0.95)  # (N, K)
    idx = jnp.sort(idx, axis=-1)                                 # ascending t
    take = jnp.take_along_axis
    t_starts = take(t0, idx, axis=-1)
    t_ends = take(t1, idx, axis=-1)
    mask = take(occ, idx, axis=-1)
    t_starts = jnp.where(mask, t_starts, 0.0)
    t_ends = jnp.where(mask, t_ends, 0.0)
    if return_score:
        return t_starts, t_ends, mask, take(score, idx, axis=-1)
    return t_starts, t_ends, mask


def compact_samples(t_starts: jnp.ndarray, t_ends: jnp.ndarray,
                    mask: jnp.ndarray, score: jnp.ndarray, budget: int):
    """Global sample-budget compaction: (N, K) masked sample grid → flat (B,)
    ray-sorted stream keeping the top-`budget` samples by march score.

    This is the fixed-shape analogue of what NeRFAcc's ragged stream buys the
    reference (morpheus.py:628-638): rays that miss the object consume no
    field evaluations, so the per-step field-eval cost tracks the number of
    *occupied* samples instead of N*K. The selection is by the occupancy
    grid's approximate rendering weight (stop-gradient), so when the budget
    binds, the least-contributing samples are dropped first.

    Returns dict(ray_id (B,) int32 nondecreasing, t_starts/t_ends (B,),
    valid (B,) bool, starts (N+1,) segment boundaries).
    """
    N, K = mask.shape
    B = int(budget)
    flat_score = jnp.where(mask, score, -jnp.inf).reshape(-1)
    # approximate top-k (see march_rays) — exact on non-TPU backends
    _, perm = jax.lax.approx_max_k(flat_score, B, recall_target=0.95)
    perm = jnp.sort(perm)                       # ray-major, t-ascending
    valid = jnp.take(mask.reshape(-1), perm)
    ray_id = (perm // K).astype(jnp.int32)
    from . import volrender
    starts = volrender.segment_starts(ray_id, N)
    return {
        "ray_id": ray_id,
        "t_starts": jnp.take(t_starts.reshape(-1), perm),
        "t_ends": jnp.take(t_ends.reshape(-1), perm),
        "valid": valid,
        "starts": starts,
    }
