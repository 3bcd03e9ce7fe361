"""Mesh extraction from the field (reference: morpheus.py:367-416)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .model import field
from .ops import meshing


from functools import partial


@partial(jax.jit, static_argnames=("spec", "cano", "return_color"))
def _query_chunk(params, p, t, spec, cano, return_color):
    out = field.query_density(params, spec, p, t=t, cano=cano,
                              return_color=return_color)
    return out["albedo"] if return_color else out["sdf"]


@partial(jax.jit, static_argnames=("spec", "cano"))
def _query_grid_scan(params, pts, t, spec, cano):
    """Sequential lax.map over chunks — ONE device dispatch + ONE host
    readback for the whole dense grid (per-chunk readbacks over the TPU
    tunnel cost ~0.5 s each and dominated mesh export)."""
    def body(p):
        return field.query_density(params, spec, p, t=t, cano=cano,
                                   return_color=False)["sdf"]
    return jax.lax.map(body, pts)


def query_sdf_grid(params: dict, spec: field.FieldSpec, resolution: int = 128,
                   t=None, cano: bool = False, chunk: int = 2 ** 18,
                   bound: float = 1.0) -> np.ndarray:
    """Dense SDF over a [-1,1]^3 grid (chunked; morpheus.py:382-395)."""
    lin = np.linspace(-bound, bound, resolution, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], -1)

    cano = cano or t is None
    tval = jnp.asarray(0.0 if t is None else t, jnp.float32)

    n = pts.shape[0]
    n_chunks = max(1, -(-n // chunk))
    csize = -(-n // n_chunks)
    pad = n_chunks * csize - n
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    res = np.asarray(_query_grid_scan(params, jnp.asarray(
        pts.reshape(n_chunks, csize, 3)), tval, spec, cano))
    return res.reshape(-1)[:n].reshape(resolution, resolution, resolution)


def export_mesh(params: dict, spec: field.FieldSpec, mesh_path: str,
                resolution: int = 128, t=None, cano: bool = False,
                color_mesh: bool = True, chunk: int = 2 ** 18):
    """Dense SDF query → iso-surface → vertex colors → PLY
    (morpheus.py:367-408). Returns (vertices, faces)."""
    os.makedirs(os.path.dirname(mesh_path) or ".", exist_ok=True)
    sdf = query_sdf_grid(params, spec, resolution, t=t, cano=cano, chunk=chunk)
    verts_idx, faces = meshing.extract_isosurface(sdf, level=0.0)
    verts = verts_idx / (resolution - 1.0) * 2.0 - 1.0

    colors = None
    if color_mesh and len(verts):
        cano_c = cano or t is None
        tval = jnp.asarray(0.0 if t is None else t, jnp.float32)
        cols = []
        for i in range(0, len(verts), chunk):
            p = np.asarray(verts[i:i + chunk], np.float32)
            # pad to a bucketed size so vertex-count jitter doesn't retrace
            padded = 1 << max(int(np.ceil(np.log2(max(len(p), 1)))), 10)
            p_pad = np.concatenate([p, np.zeros((padded - len(p), 3),
                                                np.float32)])
            res = np.asarray(_query_chunk(params, jnp.asarray(p_pad), tval,
                                          spec, cano_c, True))
            cols.append(res[:len(p)])
        colors = np.concatenate(cols, 0)

    meshing.save_ply(mesh_path, verts.astype(np.float32), faces, colors)
    return verts, faces


def export_all_meshes(params, spec, out_dir: str, num_frames: int, epoch: int,
                      resolution: int = 128, color: bool = False):
    """Per-frame meshes (morpheus.py:410-416)."""
    for i in range(num_frames):
        t = i / num_frames
        export_mesh(params, spec,
                    os.path.join(out_dir, f"mesh_{epoch:04d}_{i:04d}.ply"),
                    resolution=resolution, t=t, color_mesh=color)
