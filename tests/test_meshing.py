import numpy as np

from morpheus_tpu.ops import meshing


def _sphere_sdf(res, radius=0.5):
    lin = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x ** 2 + y ** 2 + z ** 2) - radius


def test_marching_tetrahedra_sphere_radius():
    res = 48
    sdf = _sphere_sdf(res, 0.5)
    verts_idx, faces = meshing.marching_tetrahedra(sdf)
    assert len(verts_idx) > 100 and len(faces) > 100
    verts = verts_idx / (res - 1) * 2 - 1
    r = np.linalg.norm(verts, axis=-1)
    # vertices lie on the sphere within a voxel
    assert abs(r.mean() - 0.5) < 2.0 / res
    assert r.std() < 2.0 / res
    # all face indices valid
    assert faces.max() < len(verts) and faces.min() >= 0


def test_marching_tetrahedra_empty():
    sdf = np.ones((8, 8, 8), np.float32)
    v, f = meshing.marching_tetrahedra(sdf)
    assert len(v) == 0 and len(f) == 0


def test_mesh_area_close_to_sphere():
    res = 64
    sdf = _sphere_sdf(res, 0.6)
    verts_idx, faces = meshing.marching_tetrahedra(sdf)
    verts = verts_idx / (res - 1) * 2 - 1
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1).sum()
    expected = 4 * np.pi * 0.6 ** 2
    assert abs(area - expected) / expected < 0.05


def test_ply_roundtrip(tmp_path):
    res = 24
    sdf = _sphere_sdf(res, 0.5)
    verts_idx, faces = meshing.marching_tetrahedra(sdf)
    verts = (verts_idx / (res - 1) * 2 - 1).astype(np.float32)
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3)).astype(
        np.float32)
    p = str(tmp_path / "m.ply")
    meshing.save_ply(p, verts, faces, colors)
    v2, f2, c2 = meshing.load_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2, colors, atol=1 / 255.0 + 1e-6)

    # no-color roundtrip
    p2 = str(tmp_path / "m2.ply")
    meshing.save_ply(p2, verts, faces)
    v3, f3, c3 = meshing.load_ply(p2)
    np.testing.assert_allclose(v3, verts, atol=1e-6)
    assert c3 is None


def test_native_backend_matches_numpy():
    import pytest
    try:
        from morpheus_tpu.native import mcubes_native
        res = 32
        sdf = _sphere_sdf(res, 0.5).astype(np.float32)
        v1, f1 = mcubes_native.marching_cubes(sdf, 0.0)
    except Exception:
        pytest.skip("native toolchain unavailable")
    v2, f2 = meshing.marching_tetrahedra(sdf, 0.0)
    assert len(v1) == len(v2) and len(f1) == len(f2)
    # same vertex set (order may differ)
    s1 = np.sort(np.round(v1, 4).view([('x','f4'),('y','f4'),('z','f4')]), axis=0)
    s2 = np.sort(np.round(v2, 4).view([('x','f4'),('y','f4'),('z','f4')]), axis=0)
    assert np.array_equal(s1, s2)
