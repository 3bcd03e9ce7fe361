"""Volume renderer + inline regularizers (reference: morpheus.py:558-794).

One pure function over fixed shapes: N rays × K compacted samples. Everything
the reference computes inside render_rays (orientation loss, 3-D normal
smoothness, temporal code reg, surface-band normal smoothness, TSDF losses) is
returned as loss components; the trainer weights and sums them.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .model import field
from .ops import occupancy, volrender
from .train import losses
from .utils import safe_normalize


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    bound: float = 1.01
    step_size: float = 0.01
    march_steps: int = 256
    max_samples: int = 64
    trunc: float = 0.1
    smoothness_std: float = 0.005
    topo_none: bool = True
    num_frames: int = 1
    bg_radius: float = 1.4
    # global sample budget, expressed as an AVERAGE samples-per-ray: after
    # occupancy marching only the top (N * sample_budget) samples by
    # approximate contribution (across the WHOLE ray batch) get field
    # evaluations — rays that miss the object consume no budget, mirroring the
    # reference's ragged NeRFAcc stream (morpheus.py:628-638) with fixed
    # shapes. 0 = off (B = N*K). Individual rays may still use up to
    # max_samples slots.
    sample_budget: int = 0
    # uniform-random score mix for budget compaction (tpu.budget_uniform_mix,
    # opt-in): fills the tail of a binding budget ~uniformly from occupied
    # candidates instead of strictly by approximate weight, preserving
    # free-space coverage for fs_loss (ADVICE r1 #4). 0 = pure weight rank.
    budget_uniform_mix: float = 0.0
    # binarization threshold of the occupancy EMA (tpu.occ_threshold); passed
    # to the march so the boolean mask derives from the single float lookup
    occ_threshold: float = 0.01
    # which extra terms to compute (static; mirrors config weights > 0)
    compute_normals: bool = True
    normal_smooth_3d: bool = True
    normal_smoothness: bool = True
    normal_smooth_2d: bool = False
    code_reg: bool = True
    outside_radius: float = 1.1
    # perturbed-normal smoothness site budget (avg sites/ray): the 3-D
    # smoothness terms are means over samples — evaluating them on a random
    # subset of the compacted samples is an unbiased estimate of the same
    # regularizer at a fraction of the (encode + normal-VJP + backward
    # sort/scatter) cost, the dominant per-step cost after compaction.
    # 0 = all samples (exact reference semantics).
    smooth_budget: int = 0
    # ride the perturbed-smoothness sites on the main forward's single
    # encode/value_and_grad closure (one merged backward stream) instead of a
    # separate sdf-only normal pass; which wins depends on the cotangent
    # path (the separate pass is a cheaper C=2 stream, the merge avoids a
    # second kernel dispatch chain) — measured per vjp_mode, see PARITY.md
    merge_smooth: bool = True
    # surface-band point budget (avg points/ray): the band ladder spawns
    # P=trunc*100+1 points per ray but only those with |x| < outside_radius
    # contribute (morpheus.py:539-541 filters them out BEFORE evaluating;
    # background rays put the whole ladder at the camera, |x|≈2.5). Budgeting
    # to N*band_budget drops the filtered points pre-eval. 0 = no budget.
    band_budget: int = 0
    # TPU redesign of the surface band (tpu.band_reuse): sample-budget
    # compaction already concentrates the render samples at the surface, so
    # the band's FIRST normal is taken from the in-band render samples'
    # already-computed normals instead of re-evaluating a depth-centred
    # ladder — one perturbed eval instead of two (the ladder re-walks
    # near-identical points; measured ~half the 21 ms band block at the
    # bench point). False = exact reference ladder semantics
    # (morpheus.py:530-556, :778-785).
    band_reuse: bool = True
    # dormant reference options (all 0/False in shipped configs, but flipping
    # the knob must produce the loss — morpheus.py:716-760)
    normal_dir: bool = False          # perturb along ortho-normal dirs (:716-718)
    normal_smooth_3d_t: bool = False  # time-perturbed topo normals (:743-748)
    deform_smooth: bool = False       # deform at perturbed points (:750-754)
    deform_smooth_t: bool = False     # deform at perturbed time (:756-760)
    topo_smooth_t: bool = False       # topo at perturbed time (:756-760)

    @staticmethod
    def from_config(config: dict, num_frames: int, bound: float) -> "RenderConfig":
        tr, tpu = config["train"], config["tpu"]
        return RenderConfig(
            bound=float(bound), step_size=config["render"]["step_size"],
            sample_budget=int(tpu.get("sample_budget", 0)),
            budget_uniform_mix=float(tpu.get("budget_uniform_mix", 0.0)),
            occ_threshold=float(tpu.get("occ_threshold", 0.01)),
            merge_smooth=bool(tpu.get("merge_smooth", True)),
            band_reuse=bool(tpu.get("band_reuse", True)),
            band_budget=int(tpu.get("band_budget", 0)),
            smooth_budget=int(tpu.get("smooth_budget", 0)),
            march_steps=tpu["march_steps"], max_samples=tpu["max_samples_per_ray"],
            trunc=tr["trunc"], smoothness_std=tr["smoothness_std"],
            topo_none=tr["topo_none"], num_frames=num_frames,
            bg_radius=config["model"]["bg_radius"],
            normal_smooth_3d=tr["normal_smooth_3d"] > 0,
            normal_smoothness=tr["normal_smoothness"] > 0,
            normal_smooth_2d=tr["normal_smooth_2d"] > 0,
            code_reg=tr["code_reg"] > 0,
            normal_dir=bool(tr["normal_dir"]),
            normal_smooth_3d_t=tr["normal_smooth_3d_t"] > 0,
            deform_smooth=tr["deform_smooth"] > 0,
            deform_smooth_t=tr["deform_smooth_t"] > 0,
            topo_smooth_t=tr["topo_smooth_t"] > 0,
        )


def _smooth_subset_sel(k_perturb, valid, Bs: int, B: int):
    """Uniform random subset of the valid compacted samples for the
    smoothness terms (None = keep all). Random-score selection via
    approx_max_k (exact on CPU) — the subset is random anyway."""
    if not Bs or Bs >= B:
        return None
    k_sel = jax.random.fold_in(k_perturb, 7)
    s_score = jnp.where(valid, jax.random.uniform(k_sel, (B,)), -1.0)
    _, sel = jax.lax.approx_max_k(s_score, Bs, recall_target=0.95)
    return sel


def _subset5(sel, x_flat, t_flat, normals, valid, deform):
    """Gather the 5 per-sample arrays the smoothness terms share onto the
    subset `sel` (identity when sel is None) — one definition for both the
    merged and non-merged branches so they cannot drift apart."""
    if sel is None:
        return x_flat, t_flat, normals, valid, deform
    return (jnp.take(x_flat, sel, axis=0), jnp.take(t_flat, sel, axis=0),
            jnp.take(normals, sel, axis=0), jnp.take(valid, sel, axis=0),
            jnp.take(deform, sel, axis=0) if deform is not None else None)


def render_rays(params: dict, spec: field.FieldSpec, occ_state, key,
                rays_o, rays_d, rays_t, rays_id, rcfg: RenderConfig, *,
                bg_color=None, ambient_ratio=1.0,
                shading_id=field.SHADING_ALBEDO, light_d=None,
                real_view: bool = True, cano: bool = False,
                rays_depth=None, rays_mask=None, optimize_pose: bool = False,
                max_level=None, train: bool = True):
    """Render N rays. All array args are (N, ...); static flags select the
    compiled variant (reference branches at morpheus.py:558-794).

    Returns a dict with image/depth/opacity and loss components.
    """
    k_march, k_light, k_perturb, k_smooth = jax.random.split(key, 4)
    N = rays_o.shape[0]
    K = rcfg.max_samples

    if (not cano) and optimize_pose:
        rays_o, rays_d = field.pose_optimisation(params, rays_o, rays_d, rays_id)

    t_starts, t_ends, mask, score = occupancy.march_rays(
        k_march, occ_state, rays_o, rays_d, rcfg.bound, rcfg.step_size,
        rcfg.march_steps, rcfg.max_samples, stratified=True, return_score=True,
        score_uniform_mix=rcfg.budget_uniform_mix,
        occ_threshold=rcfg.occ_threshold)

    # flatten the (N, K) masked grid into a ray-sorted (B,) stream; when a
    # sample budget is set, compaction drops padding so field-eval cost tracks
    # occupied samples (the TPU analogue of NeRFAcc's ragged stream)
    budget = rcfg.sample_budget * N
    if budget and budget < N * K:
        cs = occupancy.compact_samples(t_starts, t_ends, mask, score, budget)
    else:
        cs = {
            "ray_id": jnp.repeat(jnp.arange(N, dtype=jnp.int32), K),
            "t_starts": t_starts.reshape(-1),
            "t_ends": t_ends.reshape(-1),
            "valid": mask.reshape(-1),
            "starts": jnp.arange(N + 1, dtype=jnp.int32) * K,
        }
    ray_id, starts = cs["ray_id"], cs["starts"]
    valid = cs["valid"]                                          # (B,)
    B = valid.shape[0]

    if light_d is None:
        light_d = safe_normalize(rays_o + jax.random.normal(k_light, (3,)))

    t_mid = 0.5 * (cs["t_starts"] + cs["t_ends"])                # (B,)
    x_flat = (jnp.take(rays_o, ray_id, axis=0)
              + jnp.take(rays_d, ray_id, axis=0) * t_mid[:, None])
    t_flat = jnp.take(rays_t, ray_id, axis=0)                    # (B, 1)
    light_flat = jnp.take(light_d, ray_id, axis=0)               # (B, 3)
    dirs_unit = safe_normalize(rays_d)

    # Perturbed-smoothness sites are known BEFORE the field evaluation
    # (default isotropic perturbation + topo_none), so they ride the main
    # forward's single encode/value_and_grad closure — one merged backward
    # sort/segment-sum stream instead of a separate normal pass
    # (field.forward extra_normal_x). normal_dir / topo'd variants need the
    # main normals first and keep the separate pass below.
    merge_smooth = (rcfg.merge_smooth and train and rcfg.compute_normals
                    and rcfg.normal_smooth_3d
                    and not rcfg.normal_dir and rcfg.topo_none
                    and spec.normal_mode == "analytic")
    s_sel = None
    n_p = None
    if merge_smooth:
        s_sel = _smooth_subset_sel(k_perturb, valid,
                                   rcfg.smooth_budget * N, B)
        x_s = x_flat if s_sel is None else jnp.take(x_flat, s_sel, axis=0)
        xp = x_s + jax.random.normal(k_perturb, x_s.shape) \
            * rcfg.smoothness_std
        res = field.forward(
            params, spec, x_flat, t_flat, light_d=light_flat,
            ratio=ambient_ratio, shading_id=shading_id, cano=cano,
            compute_normals=True, max_level=max_level, extra_normal_x=xp)
        sdf, sigmas, rgbs, normals, deform, normal_raw, n_p = res
    else:
        sdf, sigmas, rgbs, normals, deform, normal_raw = field.forward(
            params, spec, x_flat, t_flat, light_d=light_flat,
            ratio=ambient_ratio, shading_id=shading_id, cano=cano,
            compute_normals=rcfg.compute_normals, max_level=max_level)

    weights, trans, alphas = volrender.flat_render_weights(
        cs["t_starts"], cs["t_ends"], sigmas, valid, ray_id)
    opacity = volrender.flat_accumulate(weights, None, ray_id, starts)  # (N,1)
    depth = volrender.flat_accumulate(weights, t_mid[:, None], ray_id,
                                      starts)[..., 0]            # (N,)
    rgb = volrender.flat_accumulate(weights, rgbs, ray_id, starts)  # (N, 3)

    if bg_color is None:
        if rcfg.bg_radius > 0 and cano and (not real_view):
            bg_color = field.background(params, spec, rays_d, rays_t)
        else:
            bg_color = 1.0
    image = rgb + (1.0 - opacity) * bg_color

    out = {
        "image": image, "depth": depth, "opacity": opacity[..., 0],
        "weights": weights, "mask": valid, "sdf": sdf, "t_mid": t_mid,
        "ray_id": ray_id,
    }

    if not train:
        return out

    valid3 = valid[:, None]                                      # (B, 1)

    def masked_mean(x):
        m = jnp.broadcast_to(valid3, x.shape)
        return jnp.sum(jnp.where(m, x, 0.0)) / (jnp.sum(m) + 1e-8)

    if rcfg.compute_normals and normals is not None:
        # orientation loss (morpheus.py:709-712); weights detached
        out["loss_orient"] = losses.orientation_loss_flat(
            jax.lax.stop_gradient(weights), normals,
            jnp.take(dirs_unit, ray_id, axis=0), valid, N)

        if rcfg.normal_smooth_3d:
            # 3-D perturbation, canonical-space normals with zero topo
            # (morpheus.py:714-741, topo_none branch). normal_dir perturbs
            # along random directions orthogonal to the normals (:716-718)
            # instead of isotropic gaussians.
            #
            # smooth_budget subsamples the evaluation sites uniformly among
            # the valid compacted samples (unbiased estimate of the same
            # mean); all perturb terms below share the subset.
            if merge_smooth:
                # n_p already computed inside the main forward closure;
                # s_sel from the pre-forward block keeps both paths on the
                # same subset. xp (the perturbed sites) is also still in
                # scope for the dormant deform_smooth branch.
                x_s, t_s, n_s, v_s, d_s = _subset5(
                    s_sel, x_flat, t_flat, normals, valid, deform)
            else:
                s_sel = _smooth_subset_sel(k_perturb, valid,
                                           rcfg.smooth_budget * N, B)
                x_s, t_s, n_s, v_s, d_s = _subset5(
                    s_sel, x_flat, t_flat, normals, valid, deform)
                if rcfg.normal_dir:
                    xp = x_s + _ortho_normal_dir(k_perturb, n_s) \
                        * rcfg.smoothness_std
                else:
                    xp = x_s + jax.random.normal(k_perturb, x_s.shape) \
                        * rcfg.smoothness_std
                if rcfg.topo_none:
                    n_p, _ = field.normal(params, spec, xp, topo=None,
                                          cano=cano, max_level=max_level)
                else:
                    topo_p = field.get_topo(params, spec, xp, t_s, max_level)
                    n_p, _ = field.normal(params, spec, xp, topo=topo_p,
                                          cano=cano, max_level=max_level)
            out["loss_normal_perturb"] = losses.normal_perturb_loss(
                n_s, n_p, v_s)

            if rcfg.normal_smooth_3d_t:
                # time-perturbed topo normals (morpheus.py:743-748)
                k_t3 = jax.random.fold_in(k_perturb, 1)
                t_jit = t_s + jax.random.uniform(k_t3, t_s.shape) \
                    / rcfg.num_frames
                topo_t = field.get_topo(params, spec, x_s, t_jit, max_level)
                n_t, _ = field.normal(params, spec, x_s, topo=topo_t,
                                      cano=cano, max_level=max_level)
                out["loss_normal_perturb_t"] = losses.normal_perturb_loss(
                    n_s, n_t, v_s)

            if rcfg.deform_smooth and not cano and d_s is not None:
                # deform smoothness at the perturbed points (morpheus.py:750-754)
                deform_p, _ = field.warp(params, spec, xp, t_s, max_level)
                m_s = jnp.broadcast_to(v_s[:, None], d_s.shape)
                dd = jnp.abs(d_s - deform_p)
                out["loss_deform_perturb"] = (
                    jnp.sum(jnp.where(m_s, dd, 0.0))
                    / (jnp.sum(m_s) + 1e-8))

        if normal_raw is not None:
            out["normal_raw_eik"] = losses.eikonal_loss(normal_raw, valid)

        if rcfg.normal_smooth_2d and not real_view:
            # accumulated normal image for 2-D smoothness (morpheus.py:773-776)
            out["normal_image"] = volrender.flat_accumulate(
                weights, (normals + 1.0) / 2.0, ray_id, starts)

    if (rcfg.deform_smooth_t or rcfg.topo_smooth_t) and not cano \
            and deform is not None:
        # deform/topo smoothness under time perturbation (morpheus.py:756-760);
        # the unperturbed warp re-call CSEs with forward()'s internal warp
        k_ts = jax.random.fold_in(k_perturb, 2)
        t_jit = t_flat + jax.random.uniform(k_ts, t_flat.shape) / rcfg.num_frames
        _, topo0 = field.warp(params, spec, x_flat, t_flat, max_level)
        deform_t, topo_t = field.warp(params, spec, x_flat, t_jit, max_level)
        if rcfg.deform_smooth_t:
            out["loss_deform_perturb_t"] = masked_mean(
                jnp.abs(deform - deform_t))
        if rcfg.topo_smooth_t:
            out["loss_topo_perturb_t"] = masked_mean(jnp.abs(topo0 - topo_t))

    if rcfg.code_reg and not cano:
        # temporal second-difference code smoothness (morpheus.py:762-771)
        t0 = rays_t[:1]
        dt = 1.0 / rcfg.num_frames
        code = field.get_deform_code(params, t0)
        code_prev = field.get_deform_code(params, t0 - dt)
        code_next = field.get_deform_code(params, t0 + dt)
        out["loss_code"] = losses.code_smoothness(code, code_prev, code_next)

    if rcfg.normal_smoothness:
        if rcfg.band_reuse and rcfg.band_budget and normals is not None:
            out["normal_reg"] = _band_reuse_normal_smoothness(
                params, spec, k_smooth, x_flat, t_flat, normals, valid,
                t_mid, depth, ray_id, rcfg, max_level)
        else:
            out["normal_reg"] = _surface_band_normal_smoothness(
                params, spec, k_smooth, rays_o, rays_d, rays_t, depth, rcfg,
                max_level)

    if rays_depth is not None:
        fs_loss, sdf_loss = losses.sdf_losses_flat(
            t_mid, rays_depth.reshape(-1), sdf, rcfg.trunc, valid, ray_id,
            starts,
            ray_mask=rays_mask.reshape(-1) if rays_mask is not None else None)
        out["fs_loss"] = fs_loss
        out["sdf_loss"] = sdf_loss

    if deform is not None:
        out["deform_abs"] = masked_mean(jnp.abs(deform))

    return out


def _ortho_normal_dir(key, normals):
    """Random direction orthogonal to the normals (morpheus.py:518-528)."""
    n = safe_normalize(normals)
    u = safe_normalize(n[..., jnp.array([1, 0, 2])]
                       * jnp.array([1.0, -1.0, 0.0]))
    v = jnp.cross(n, u)
    phi = jax.random.uniform(key, normals.shape[:-1] + (1,)) * 2.0 * jnp.pi
    return jnp.cos(phi) * u + jnp.sin(phi) * v


def _band_reuse_normal_smoothness(params, spec, key, x_flat, t_flat, normals,
                                  valid, t_mid, depth, ray_id,
                                  rcfg: RenderConfig, max_level):
    """TPU redesign of the surface-band L_smooth (morpheus.py:530-556,
    :778-785): the reference re-evaluates a depth-centred P-point ladder twice
    (n1, then n2 at an ortho-perturbed site). Under sample-budget compaction
    the render samples already concentrate in exactly that band, with their
    normals computed by the main closure — so n1 is REUSED from the in-band
    render samples and only the perturbed n2 needs a field evaluation
    (sdf-only C=2 stream; halves the band's gather/accumulate rows). Selection
    is uniform among samples within trunc/2 of the rendered depth, inside the
    |x| < outside_radius filter, budgeted to band_budget*N sites."""
    k1, k2 = jax.random.split(key)
    depth_r = jax.lax.stop_gradient(jnp.take(depth, ray_id))
    in_band = valid & (jnp.abs(t_mid - depth_r) < 0.5 * rcfg.trunc) \
        & (jnp.linalg.norm(x_flat, axis=-1) < rcfg.outside_radius)
    N = depth.shape[0]
    Bb = rcfg.band_budget * N
    if Bb and Bb < in_band.shape[0]:
        score = jnp.where(in_band, jax.random.uniform(k1, in_band.shape), -1.0)
        _, sel = jax.lax.approx_max_k(score, Bb, recall_target=0.95)
        x_b = jnp.take(x_flat, sel, axis=0)
        t_b = jnp.take(t_flat, sel, axis=0)
        n1 = jnp.take(normals, sel, axis=0)
        m_b = jnp.take(in_band, sel, axis=0)
    else:
        x_b, t_b, n1, m_b = x_flat, t_flat, normals, in_band
    w = _ortho_normal_dir(k2, n1)
    n2, _ = field.normal(params, spec, x_b + w * rcfg.smoothness_std,
                         t=t_b, max_level=max_level)
    # both n1 and n2 carry gradients, like the reference ladder; n1's path
    # shares the main closure's existing backward
    sq = jnp.sum((n1 - n2) ** 2, -1) / 3.0
    return jnp.sum(jnp.where(m_b, sq, 0.0)) / (jnp.sum(m_b) + 1e-8)


def _surface_band_normal_smoothness(params, spec, key, rays_o, rays_d, rays_t,
                                    depth, rcfg: RenderConfig, max_level):
    """L_smooth in observation space near the rendered surface
    (morpheus.py:530-556). The reference filters points with |x|<1.1 to a ragged
    set; here the filter is a weight mask over the fixed (P, N) ladder."""
    k1, k2, k3 = jax.random.split(key, 3)
    P = int(rcfg.trunc * 100 + 1)
    N = depth.shape[0]
    ladder = jnp.linspace(-0.5 * rcfg.trunc, 0.5 * rcfg.trunc, P)
    ladder = ladder + 0.01 * jax.random.uniform(k1, (P,))

    depth_sg = jax.lax.stop_gradient(depth)
    pts = (depth_sg[None, :] + ladder[:, None])[..., None] * rays_d[None] \
        + rays_o[None]                                           # (P, N, 3)
    pts = pts.reshape(-1, 3)
    ts = jnp.broadcast_to(rays_t[None], (P,) + rays_t.shape).reshape(-1, 1)
    in_band = jnp.linalg.norm(pts, axis=-1) < rcfg.outside_radius

    if rcfg.band_budget and rcfg.band_budget * N < P * N:
        # keep only (a random subset of) in-band points: the filter is known
        # before any field evaluation, so background rays — whose whole
        # ladder sits at the camera, outside the radius — cost nothing
        B = rcfg.band_budget * N
        score = jnp.where(in_band,
                          jax.random.uniform(k3, in_band.shape), -1.0)
        _, sel = jax.lax.approx_max_k(score, B, recall_target=0.95)
        pts = jnp.take(pts, sel, axis=0)
        ts = jnp.take(ts, sel, axis=0)
        in_band = jnp.take(in_band, sel, axis=0)

    n1, _ = field.normal(params, spec, pts, t=ts, max_level=max_level)
    w = _ortho_normal_dir(k2, n1)
    # n2 shares n1's evaluation machinery but needs n1 first (the ortho
    # direction), so the two encodes cannot be one batch; n1 however can be
    # batched with nothing else — the win is merging the WARP: both sites use
    # the same (pts, ts) warp, which CSEs. The dominant remaining cost is the
    # two backward sort/segment-sum streams, fundamentally sequential here.
    n2, _ = field.normal(params, spec, pts + w * rcfg.smoothness_std, t=ts,
                         max_level=max_level)
    sq = jnp.sum((n1 - n2) ** 2, -1) / 3.0
    return jnp.sum(jnp.where(in_band, sq, 0.0)) / (jnp.sum(in_band) + 1e-8)
