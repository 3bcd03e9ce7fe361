"""Hyper-dimensional canonical SDF field + NDR-style deformation/topology
networks + per-frame pose correction.

Functional re-design of the reference `scene_representation`
(models/model.py:31-533): parameters are one pytree, every query is a pure
function of (params, spec, inputs), so the whole train step jits end-to-end and
shards with pjit. Normals use jax.grad of the SDF wrt position (exact, one
extra VJP) instead of the reference's 6-point finite differences
(models/model.py:367-385); an FD mode is kept for parity experiments.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..cameras import euler_to_rotation
from ..ops import codes, density, encodings, hashgrid, mlp
from ..utils import safe_normalize


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static architecture description (defaults = reference defaults,
    models/model.py:32-53 + configs/snoopy.yaml `model:`)."""
    num_frames: int = 1
    bound: float = 1.01
    # decoder dims
    num_layers: int = 3
    num_layers_t: int = 6
    hidden_dim: int = 64
    hidden_dim_t: int = 128
    hidden_dim_tpo: int = 128
    num_layers_bg: int = 2
    hidden_dim_bg: int = 32
    geo_dim: int = 32
    deform_dim: int = 16
    amb_dim: int = 2
    # options
    use_t: bool = False
    use_app: bool = False
    use_joint: bool = True
    color_grid: bool = True
    encode_topo: bool = False
    encode_deform: bool = True
    bg_radius: float = 1.4
    # encodings
    multires_deform: int = 6
    multires_xyz: int = 6
    multires_bg: int = 6
    multires_bg_t: int = 6
    multires_t: int = 6
    grid: hashgrid.HashGridSpec = dataclasses.field(
        default_factory=lambda: hashgrid.HashGridSpec(
            input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
            log2_hashmap_size=15, desired_resolution=128))
    normal_mode: str = "analytic"   # 'analytic' | 'fd'
    fd_eps: float = 2e-3
    # 'bfloat16' = mixed policy: MLP matmuls bf16 on the MXU, f32 accumulation
    # and master weights (the reference's AMP semantics, morpheus.py:158)
    # AND bf16 hash-table gathers. Measured on v5e the table half is a
    # REGRESSION (+25 ms/step: the dtype convert at the gather boundary
    # defeats XLA fusion, PARITY.md), so mlp_dtype exposes the MLP half
    # alone: matmuls ride the MXU in bf16 with f32 accumulation while the
    # gathers stay f32.
    compute_dtype: str = "float32"
    mlp_dtype: str = "float32"
    # static hash-level truncation for the coarse-to-fine curriculum: levels
    # >= active_levels skip their gather/VJP entirely (ops/hashgrid.encode)
    active_levels: int | None = None

    @property
    def cdt(self):
        """Hash-table gather dtype (None = keep f32)."""
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def mdt(self):
        """MLP matmul dtype (None = keep f32); compute_dtype implies it."""
        if "bfloat16" in (self.compute_dtype, self.mlp_dtype):
            return jnp.bfloat16
        return None

    # ---- derived dims (mirror models/model.py:99-185) ----
    @property
    def in_dim_t(self) -> int:
        return encodings.freq_output_dim(1, self.multires_t) if self.use_t else 0

    @property
    def in_dim_deform(self) -> int:
        return (encodings.freq_output_dim(3, self.multires_deform)
                if self.encode_deform else 3)

    @property
    def code_sizes(self):
        n = self.num_frames
        return (max(n // 8, 1), max(n // 4, 1), n)

    @property
    def code_dim(self) -> int:
        return codes.multicode_dim(self.code_sizes, self.deform_dim)

    @property
    def in_dim_amb(self) -> int:
        # encode_topo would freq-encode; final version feeds raw amb coords
        return (encodings.freq_output_dim(self.amb_dim, 4)
                if self.encode_topo else self.amb_dim)

    @property
    def in_dim_xyz(self) -> int:
        return (encodings.freq_output_dim(3, self.multires_xyz)
                if self.use_joint else 3)

    @property
    def sdf_in_dim(self) -> int:
        return self.grid.output_dim + self.in_dim_amb + self.in_dim_xyz

    @property
    def color_enc_dim(self) -> int:
        return (self.grid.output_dim if self.color_grid
                else encodings.freq_output_dim(3, 6))

    @property
    def color_in_dim(self) -> int:
        return self.color_enc_dim + self.geo_dim + (self.deform_dim
                                                    if self.use_app else 0)

    @property
    def deform_in_dim(self) -> int:
        return self.in_dim_t + self.in_dim_deform + self.code_dim


def init_field(key: jax.Array, spec: FieldSpec) -> dict:
    """Initialize all parameters (reference: models/model.py:96-193)."""
    ks = jax.random.split(key, 10)
    params = {
        "pose": jnp.zeros((spec.num_frames, 6), jnp.float32),
        "deform_code": codes.init_multicode(ks[0], spec.code_sizes,
                                            spec.deform_dim),
        "deform_net": mlp.init_mlp(ks[1], spec.deform_in_dim, 3,
                                   spec.hidden_dim_t, spec.num_layers_t),
        "topo_net": mlp.init_mlp(ks[2], spec.deform_in_dim, spec.amb_dim,
                                 spec.hidden_dim_tpo, spec.num_layers_t),
        "sdf_grid": hashgrid.init_embeddings(ks[3], spec.grid),
        "sdf_net": mlp.init_mlp(ks[4], spec.sdf_in_dim, 1 + spec.geo_dim,
                                spec.hidden_dim, spec.num_layers,
                                geo_init=True, geo_bias=0.4),
        "color_net": mlp.init_mlp(ks[5], spec.color_in_dim, 3,
                                  spec.hidden_dim, spec.num_layers),
        "beta": jnp.asarray(0.1, jnp.float32),
    }
    if spec.color_grid:
        params["color_grid"] = hashgrid.init_embeddings(ks[6], spec.grid)
    if spec.use_app:
        params["app_code"] = codes.init_multicode(ks[7], spec.code_sizes,
                                                  spec.deform_dim)
    if spec.bg_radius > 0:
        bg_in = (encodings.freq_output_dim(3, spec.multires_bg)
                 + encodings.freq_output_dim(1, spec.multires_bg_t))
        params["bg_net"] = mlp.init_mlp(ks[8], bg_in, 3, spec.hidden_dim_bg,
                                        spec.num_layers_bg)
    return params


# ---- pose correction (reference: models/pose.py, models/model.py:335-346) ----

def get_RT(params: dict, frame_ids: jnp.ndarray):
    data = params["pose"][frame_ids]
    R = euler_to_rotation(data[..., 0:3])
    T = data[..., 3:6]
    return R, T


def pose_optimisation(params: dict, rays_o, rays_d, frame_ids):
    """Apply the learned 6-DoF per-frame correction to rays
    (models/model.py:335-346)."""
    R, T = get_RT(params, frame_ids.reshape(-1))
    rays_o = rays_o + T
    rays_d = jnp.sum(rays_d[..., None, :] * R, -1)
    return rays_o, rays_d


# ---- deformation / topology ----

def get_deform_code(params: dict, t: jnp.ndarray, app: bool = False):
    vols = params["app_code" if app else "deform_code"]
    return codes.sample_multicode(vols, t)


def _deform_inputs(params: dict, spec: FieldSpec, x, t, max_level):
    if spec.encode_deform:
        x_enc = encodings.freq_encode(x, spec.multires_deform, max_level)
    else:
        x_enc = x
    code = get_deform_code(params, t)
    feats = [x_enc]
    if spec.use_t:
        feats.append(encodings.freq_encode(t, spec.multires_t, max_level))
    feats.append(code)
    return jnp.concatenate(feats, axis=-1)


def warp(params: dict, spec: FieldSpec, x, t, max_level=None):
    """(deform, topo): observation→canonical offset + ambient coords
    (models/model.py:412-437)."""
    h = _deform_inputs(params, spec, x, t, max_level)
    deform = mlp.apply_mlp(params["deform_net"], h, spec.mdt)
    topo = mlp.apply_mlp(params["topo_net"], h, spec.mdt)
    if spec.encode_topo:
        topo = encodings.freq_encode(topo, 4, max_level)
    return deform, topo


def get_topo(params: dict, spec: FieldSpec, x, t, max_level=None):
    """Ambient/topology coords only (models/model.py:252-271)."""
    h = _deform_inputs(params, spec, x, t, max_level)
    topo = mlp.apply_mlp(params["topo_net"], h, spec.mdt)
    if spec.encode_topo:
        topo = encodings.freq_encode(topo, 4, max_level)
    return topo


# ---- canonical field ----

def _grid_features(params: dict, spec: FieldSpec, x, max_level=None,
                   with_color: bool = True):
    """(enc_sdf, enc_color) hash features of canonical positions.

    When a color grid exists, BOTH grids share the same corner indices (same
    spec, same positions), so they are gathered as one fused (T, 2C) table —
    one row-gather and one sorted-segment-sum cotangent stream instead of two
    of each (gather/scatter cost on v5e is row-count-bound, not width-bound).

    with_color=False skips the color half: normal-only evaluation sites
    (perturbed-normal smoothness, the surface band) and density-only queries
    would otherwise gather color features just to discard them — and, worse,
    drag two all-zero cotangent payload columns through the backward sort.
    """
    import dataclasses as _dc
    if spec.color_grid and with_color:
        emb = jnp.concatenate([params["sdf_grid"], params["color_grid"]], -1)
        gspec = _dc.replace(spec.grid, level_dim=2 * spec.grid.level_dim)
        out = hashgrid.encode(x, emb, gspec, bound=spec.bound,
                              max_level=max_level,
                              active_levels=spec.active_levels,
                              compute_dtype=spec.cdt)
        L, C = spec.grid.num_levels, spec.grid.level_dim
        o = out.reshape(x.shape[:-1] + (L, 2 * C))
        enc_sdf = o[..., :C].reshape(x.shape[:-1] + (L * C,))
        enc_col = o[..., C:].reshape(x.shape[:-1] + (L * C,))
        return enc_sdf, enc_col
    enc_sdf = hashgrid.encode(x, params["sdf_grid"], spec.grid,
                              bound=spec.bound, max_level=max_level,
                              active_levels=spec.active_levels,
                              compute_dtype=spec.cdt)
    return enc_sdf, None


def _sdf_head(params: dict, spec: FieldSpec, x, enc, topo, max_level):
    if topo is None:
        topo = jnp.zeros(x.shape[:-1] + (spec.in_dim_amb,), x.dtype)
    if spec.use_joint:
        enc_xyz = encodings.freq_encode(x, spec.multires_xyz, max_level)
        feat = jnp.concatenate([enc_xyz, enc, topo], axis=-1)
    else:
        feat = jnp.concatenate([x, enc, topo], axis=-1)
    h = mlp.apply_mlp(params["sdf_net"], feat, spec.mdt)
    return h[..., 0], h[..., 1:]


def sdf_geo(params: dict, spec: FieldSpec, x, topo, max_level=None,
            with_color: bool = False):
    """(sdf, geo_feat) of canonical positions (models/model.py:273-293).
    Gathers only the SDF grid by default — every current caller (normals,
    mesh export) discards color; pass with_color=True to share the fused
    gather with a co-located color query."""
    enc, _ = _grid_features(params, spec, x, max_level, with_color=with_color)
    return _sdf_head(params, spec, x, enc, topo, max_level)


def albedo(params: dict, spec: FieldSpec, x, geo_feat, app_code=None,
           max_level=None):
    """Color branch (models/model.py:295-302)."""
    if spec.color_grid:
        enc_c = hashgrid.encode(x, params["color_grid"], spec.grid,
                                bound=spec.bound, max_level=max_level,
                                compute_dtype=spec.cdt)
    else:
        enc_c = encodings.freq_encode(x, 6, max_level)
    feat = jnp.concatenate([enc_c, geo_feat], axis=-1)
    if spec.use_app:
        if app_code is None:
            app_code = jnp.zeros(x.shape[:-1] + (spec.deform_dim,), x.dtype)
        feat = jnp.concatenate([feat, app_code], axis=-1)
    return jax.nn.sigmoid(mlp.apply_mlp(params["color_net"], feat, spec.mdt))


def sigma_albedo(params: dict, spec: FieldSpec, x, topo=None, app_code=None,
                 return_color: bool = True, max_level=None):
    """(sdf, sigma, albedo) of canonical positions (models/model.py:273-307).
    One fused grid gather serves both the SDF and color branches."""
    enc_sdf, enc_col = _grid_features(params, spec, x, max_level,
                                      with_color=return_color)
    sdf, geo_feat = _sdf_head(params, spec, x, enc_sdf, topo, max_level)
    sigma = density.laplace_density(sdf, params["beta"])
    rgb = None
    if return_color:
        if enc_col is None:
            enc_col = encodings.freq_encode(x, 6, max_level)
        feat = jnp.concatenate([enc_col, geo_feat], axis=-1)
        if spec.use_app:
            if app_code is None:
                app_code = jnp.zeros(x.shape[:-1] + (spec.deform_dim,),
                                     x.dtype)
            feat = jnp.concatenate([feat, app_code], axis=-1)
        rgb = jax.nn.sigmoid(mlp.apply_mlp(params["color_net"], feat,
                                           spec.mdt))
    return sdf, sigma, rgb


def query_density(params: dict, spec: FieldSpec, x, t=None, cano: bool = False,
                  return_color: bool = True, max_level=None):
    """Density/SDF query with optional deformation (models/model.py:439-481).
    t: None/(N,1) normalized time; scalar t broadcasts to all points."""
    topo = None
    app_code = None
    if not (cano or t is None):
        t = jnp.asarray(t, x.dtype)
        if t.ndim == 0 or t.size == 1:
            # scalar time broadcasts to all points (ref 'allow_shape' path,
            # models/model.py:468-473)
            t = jnp.broadcast_to(t.reshape(1, 1), (x.shape[0], 1))
        deform, topo = warp(params, spec, x, t, max_level)
        if spec.use_app:
            app_code = get_deform_code(params, t, app=True)
        x = x + deform
    sdf, sigma, rgb = sigma_albedo(params, spec, x, topo, app_code,
                                   return_color, max_level)
    return {"sdf": sdf, "sigma": sigma, "albedo": rgb}


# ---- normals ----

def _sdf_fn(params, spec, x, topo, max_level):
    sdf, _ = sdf_geo(params, spec, x, topo, max_level)
    return sdf


def normal(params: dict, spec: FieldSpec, x, t=None, cano: bool = False,
           topo=None, max_level=None):
    """Unit + raw canonical-space normals (models/model.py:387-398).

    When t is given and cano is False, x is first warped (topo comes from the
    warp); the spatial gradient itself is always taken in canonical space with
    topo held fixed — matching the reference's cost-saving choice
    (models/model.py:516-521).
    """
    if t is not None and not cano:
        deform, topo = warp(params, spec, x, t, max_level)
        x = x + deform

    if spec.normal_mode == "fd":
        eps = spec.fd_eps
        raw = []
        for d in range(3):
            offs = jnp.zeros((1, 3), x.dtype).at[0, d].set(eps)
            sp = _sdf_fn(params, spec, jnp.clip(x + offs, -spec.bound, spec.bound),
                         topo, max_level)
            sn = _sdf_fn(params, spec, jnp.clip(x - offs, -spec.bound, spec.bound),
                         topo, max_level)
            raw.append(0.5 * (sp - sn) / eps)
        normal_raw = jnp.stack(raw, axis=-1)
    else:
        grad_fn = jax.grad(lambda pts: jnp.sum(_sdf_fn(params, spec, pts, topo,
                                                       max_level)))
        normal_raw = grad_fn(x)

    n = safe_normalize(normal_raw)
    return jnp.nan_to_num(n), normal_raw


# ---- background (models/model.py:400-410) ----

def background(params: dict, spec: FieldSpec, d, t, max_level=None):
    h = encodings.freq_encode(d, spec.multires_bg)
    h_t = encodings.freq_encode(t, spec.multires_bg_t, max_level)
    return jax.nn.sigmoid(mlp.apply_mlp(params["bg_net"],
                                        jnp.concatenate([h, h_t], -1),
                                        spec.mdt))


# ---- full forward (models/model.py:483-533) ----
# shading ids (traced int): 0=albedo, 1=lambertian, 2=textureless, 3=normal
SHADING_ALBEDO, SHADING_LAMBERTIAN, SHADING_TEXTURELESS, SHADING_NORMAL = 0, 1, 2, 3


def forward(params: dict, spec: FieldSpec, x, t, light_d=None, ratio=1.0,
            shading_id=SHADING_ALBEDO, cano: bool = False,
            compute_normals: bool = True, max_level=None,
            extra_normal_x=None, extra_normal_topo=None):
    """Returns (sdf, sigma, color, normal, deform, normal_raw[, normal_extra]).

    `shading_id` may be traced; `compute_normals` is static (False skips the
    normal VJP entirely, e.g. albedo-only eval renders).

    extra_normal_x (E, 3) — additional CANONICAL-space sites whose analytic
    normals are wanted (perturbed-smoothness / surface-band points): they ride
    the SAME encode + value_and_grad closure as the render samples, so their
    embedding cotangents merge into the one sorted segment-sum stream instead
    of paying a separate gather + sort + scatter per regularizer
    (morpheus.py:714-741, :530-556 evaluate them as separate forward passes —
    on TPU the launch/sort overhead dominates, hence the merge).
    extra_normal_topo: their topo features (zeros when None = topo_none).
    When extra_normal_x is given, an (E, 3) `normal_extra` (unit) is appended
    to the return tuple.
    """
    if cano:
        x_cano, deform, topo = x, None, None
    else:
        deform, topo = warp(params, spec, x, t)
        x_cano = x + deform

    E = 0 if extra_normal_x is None else extra_normal_x.shape[0]
    if compute_normals and spec.normal_mode == "analytic":
        # ONE encode instance serves the sdf value, the color features AND the
        # normal: value_and_grad over a shared closure means the backward pass
        # accumulates all embedding cotangents into a single sorted
        # segment-sum stream, instead of one stream per hash-grid re-encode
        # (the gather itself would CSE, but the transposed scatters would not).
        B = x_cano.shape[0]
        if E:
            x_all = jnp.concatenate([x_cano, extra_normal_x], 0)
            if extra_normal_topo is None:
                extra_normal_topo = jnp.zeros(
                    (E, spec.in_dim_amb), x_cano.dtype)
            topo_all = (jnp.concatenate([topo, extra_normal_topo], 0)
                        if topo is not None else
                        jnp.concatenate(
                            [jnp.zeros((B, spec.in_dim_amb), x_cano.dtype),
                             extra_normal_topo], 0))
        else:
            x_all, topo_all = x_cano, topo

        def _sdf_closure(xc):
            enc_sdf, enc_col = _grid_features(params, spec, xc, max_level)
            sdf, geo_feat = _sdf_head(params, spec, xc, enc_sdf, topo_all,
                                      max_level)
            return jnp.sum(sdf), (sdf, geo_feat, enc_col)

        (_, (sdf, geo_feat, enc_col)), n_raw = jax.value_and_grad(
            _sdf_closure, has_aux=True)(x_all)
        n_extra = None
        if E:
            n_extra = jnp.nan_to_num(safe_normalize(n_raw[B:]))
            sdf, geo_feat, n_raw = sdf[:B], geo_feat[:B], n_raw[:B]
            if enc_col is not None:
                enc_col = enc_col[:B]
        x_cano = x_all[:B] if E else x_cano
        sigma = density.laplace_density(sdf, params["beta"])
        if enc_col is None:
            enc_col = encodings.freq_encode(x_cano, 6, max_level)
        feat = jnp.concatenate([enc_col, geo_feat], axis=-1)
        if spec.use_app:
            feat = jnp.concatenate(
                [feat, jnp.zeros(x_cano.shape[:-1] + (spec.deform_dim,),
                                 x_cano.dtype)], axis=-1)
        alb = jax.nn.sigmoid(mlp.apply_mlp(params["color_net"], feat,
                                           spec.mdt))
        n = jnp.nan_to_num(safe_normalize(n_raw))
    else:
        sdf, sigma, alb = sigma_albedo(params, spec, x_cano, topo,
                                       max_level=max_level)
        if not compute_normals:
            if extra_normal_x is not None:
                return sdf, sigma, alb, None, deform, None, None
            return sdf, sigma, alb, None, deform, None
        n, n_raw = normal(params, spec, x_cano, topo=topo,
                          max_level=max_level)
        if extra_normal_x is not None:
            # fd / fallback mode: evaluate the extra sites separately
            n_extra, _ = normal(params, spec, extra_normal_x,
                                topo=extra_normal_topo, cano=True,
                                max_level=max_level)
    lambertian = ratio + (1.0 - ratio) * jnp.clip(
        jnp.sum(n * light_d, -1), 0.0, None)

    shading_id = jnp.asarray(shading_id)
    color = jnp.where(shading_id == SHADING_ALBEDO, alb,
            jnp.where(shading_id == SHADING_TEXTURELESS,
                      jnp.broadcast_to(lambertian[..., None], alb.shape),
            jnp.where(shading_id == SHADING_NORMAL, (n + 1.0) / 2.0,
                      alb * lambertian[..., None])))
    if extra_normal_x is not None:
        return sdf, sigma, color, n, deform, n_raw, n_extra
    return sdf, sigma, color, n, deform, n_raw
