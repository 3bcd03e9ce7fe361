import pytest
import jax
import jax.numpy as jnp
import numpy as np

from morpheus_tpu import cameras
from morpheus_tpu.ops import codes, density, occupancy, volrender


# ---- Laplace density (reference: models/density.py) ----

def test_laplace_density_values():
    beta = jnp.asarray(0.1)
    sdf = jnp.array([-0.5, -0.01, 0.0, 0.01, 0.5])
    got = density.laplace_density(sdf, beta)
    b = 0.1 + 1e-4
    ref = (1 / b) * (0.5 + 0.5 * np.sign(sdf) * np.expm1(-np.abs(sdf) / b))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # deep inside (sdf<<0) density -> alpha; far outside -> 0
    assert np.isclose(float(density.laplace_density(jnp.asarray(-10.0), beta)),
                      1 / b, rtol=1e-4)
    assert float(density.laplace_density(jnp.asarray(10.0), beta)) < 1e-6


def test_trunc_exp_gradient_clamped():
    g = jax.grad(lambda x: density.trunc_exp(x))(jnp.asarray(20.0))
    assert np.isclose(float(g), np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: density.trunc_exp(x))(jnp.asarray(2.0))
    assert np.isclose(float(g2), np.exp(2.0), rtol=1e-5)


# ---- MultiCode (reference: models/deform_code.py) ----

def test_multicode_linear_interp():
    vols = [jnp.arange(5, dtype=jnp.float32)[:, None]]  # (5,1) values 0..4
    t = jnp.array([[0.0], [0.25], [0.5], [1.0], [2.0]])
    out = codes.sample_multicode(vols, t)
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 2.0, 4.0, 4.0], atol=1e-6)


def test_multicode_multires_concat():
    key = jax.random.PRNGKey(0)
    vols = codes.init_multicode(key, (2, 4, 8), 3)
    out = codes.sample_multicode(vols, jnp.array([[0.3]]))
    assert out.shape == (1, 9)


# ---- Euler rotations (reference: models/pose.py:35-58) ----

def test_euler_identity_and_known_rotation():
    R = cameras.euler_to_rotation(jnp.zeros((1, 3)))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    # alpha=90deg about z-ish axis per the reference parametrization
    R = np.asarray(cameras.euler_to_rotation(jnp.array([[np.pi / 2, 0, 0]])))[0]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-6)


# ---- rays (reference: datasets/utils.py:28-65) ----

def test_camera_rays_center_pixel_points_forward():
    H = W = 4
    fx = 100.0
    d = cameras.get_camera_rays(H, W, fx)
    assert d.shape == (H, W, 3)
    assert np.all(np.asarray(d[..., 2]) == -1.0)  # OpenGL forward = -z
    # symmetric around the principal point
    np.testing.assert_allclose(np.asarray(d[..., 0]).sum(), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d[..., 1]).sum(), 0.0, atol=1e-5)


def test_polar_c2w_looks_at_origin():
    c2w = cameras.c2w_from_polar(radius=jnp.asarray([3.0]),
                                 theta_deg=jnp.asarray([90.0]),
                                 phi_deg=jnp.asarray([0.0]))
    center = np.asarray(c2w[0, :3, 3])
    np.testing.assert_allclose(center, [0, 0, 3.0], atol=1e-5)
    fwd = np.asarray(c2w[0, :3, 2])  # OpenGL: camera looks along -forward
    np.testing.assert_allclose(fwd, [0, 0, 1.0], atol=1e-5)


# ---- volume rendering vs brute force ----

def test_render_weights_matches_bruteforce():
    rng = np.random.default_rng(0)
    N, K = 8, 16
    t0 = np.cumsum(rng.uniform(0.01, 0.02, (N, K)), -1)
    t1 = t0 + 0.01
    sig = rng.uniform(0, 50, (N, K)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.3
    w, trans, alphas = volrender.render_weights(
        jnp.asarray(t0, jnp.float32), jnp.asarray(t1, jnp.float32),
        jnp.asarray(sig), jnp.asarray(mask))
    # brute force per-ray
    for i in range(N):
        T = 1.0
        for j in range(K):
            if not mask[i, j]:
                assert w[i, j] == 0
                continue
            a = 1 - np.exp(-sig[i, j] * (t1[i, j] - t0[i, j]))
            np.testing.assert_allclose(w[i, j], a * T, rtol=1e-4, atol=1e-6)
            T *= 1 - a


def test_accumulate_shapes():
    w = jnp.ones((4, 8)) / 8
    vals = jnp.ones((4, 8, 3)) * 2.0
    acc = volrender.accumulate(w, vals)
    np.testing.assert_allclose(acc, 2.0, rtol=1e-6)
    op = volrender.accumulate(w)
    np.testing.assert_allclose(op, 1.0, rtol=1e-6)


# ---- occupancy marching ----

def test_ray_aabb():
    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tn, tf = occupancy.ray_aabb(o, d, 1.0)
    np.testing.assert_allclose(tn, [4.0], atol=1e-5)
    np.testing.assert_allclose(tf, [6.0], atol=1e-5)


@pytest.mark.slow
def test_march_rays_hits_occupied_region():
    R = 32
    state = occupancy.init_occupancy(R)
    # only a central sphere occupied
    centers = occupancy.cell_centers(R, 1.0)
    occ = (np.linalg.norm(centers, axis=-1) < 0.3).reshape(R, R, R)
    state = state._replace(binaries=jnp.asarray(occ))

    o = jnp.array([[0.0, 0.0, -3.0], [0.9, 0.9, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t0, t1, mask = occupancy.march_rays(jax.random.PRNGKey(0), state, o, d,
                                        bound=1.0, step_size=0.01,
                                        march_steps=256, max_samples=64)
    assert t0.shape == (2, 64)
    # ray through the center has samples; corner ray misses the sphere
    assert int(mask[0].sum()) > 10
    assert int(mask[1].sum()) == 0
    # all sampled midpoints lie in the occupied sphere (within a cell margin)
    tm = np.asarray(0.5 * (t0[0] + t1[0]))[np.asarray(mask[0])]
    pts = np.asarray(o[0]) + np.asarray(d[0]) * tm[:, None]
    assert np.all(np.linalg.norm(pts, axis=-1) < 0.3 + 2 * 2.0 / R)
    # samples are ordered and contiguous in t
    assert np.all(np.diff(tm) > 0)


def test_update_occupancy_marks_dense_region():
    R = 16
    state = occupancy.init_occupancy(R)

    def density_fn(x):
        return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.4, 1000.0, 0.0)

    state = occupancy.update_occupancy(state, jax.random.PRNGKey(0), density_fn,
                                       step=jnp.asarray(0), bound=1.0,
                                       step_size=0.01)
    bins = np.asarray(state.binaries)
    centers = occupancy.cell_centers(R, 1.0).reshape(R, R, R, 3)
    inside = np.linalg.norm(centers, axis=-1) < 0.3
    outside = np.linalg.norm(centers, axis=-1) > 0.6
    assert bins[inside].mean() > 0.9
    assert bins[outside].mean() < 0.1


# ---- flat (compacted) segment rendering ----

def test_flat_render_matches_dense():
    rng = np.random.default_rng(1)
    N, K = 8, 16
    t0 = np.cumsum(rng.uniform(0.01, 0.02, (N, K)), -1).astype(np.float32)
    t1 = (t0 + 0.01).astype(np.float32)
    sig = rng.uniform(0, 50, (N, K)).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.3
    vals = rng.normal(size=(N, K, 3)).astype(np.float32)

    w_d, _, _ = volrender.render_weights(*map(jnp.asarray, (t0, t1, sig, mask)))
    acc_d = volrender.accumulate(w_d, jnp.asarray(vals))

    ray_id = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
    starts = jnp.arange(N + 1, dtype=jnp.int32) * K
    w_f, _, _ = volrender.flat_render_weights(
        jnp.asarray(t0.reshape(-1)), jnp.asarray(t1.reshape(-1)),
        jnp.asarray(sig.reshape(-1)), jnp.asarray(mask.reshape(-1)), ray_id)
    np.testing.assert_allclose(np.asarray(w_f).reshape(N, K), np.asarray(w_d),
                               rtol=1e-5, atol=1e-7)
    acc_f = volrender.flat_accumulate(w_f, jnp.asarray(vals.reshape(-1, 3)),
                                      ray_id, starts)
    np.testing.assert_allclose(np.asarray(acc_f), np.asarray(acc_d),
                               rtol=1e-5, atol=1e-6)


def test_compact_samples_keeps_all_when_budget_ample():
    rng = np.random.default_rng(2)
    N, K = 6, 8
    t0 = np.cumsum(rng.uniform(0.01, 0.02, (N, K)), -1).astype(np.float32)
    t1 = (t0 + 0.01).astype(np.float32)
    mask = rng.uniform(size=(N, K)) > 0.5
    score = np.where(mask, rng.uniform(0.1, 1.0, (N, K)), -1.0).astype(np.float32)

    cs = occupancy.compact_samples(jnp.asarray(t0), jnp.asarray(t1),
                                   jnp.asarray(mask), jnp.asarray(score),
                                   budget=N * K)
    # every valid sample survives, ray-sorted, with correct boundaries
    assert int(cs["valid"].sum()) == int(mask.sum())
    rid = np.asarray(cs["ray_id"])
    assert (np.diff(rid) >= 0).all()
    starts = np.asarray(cs["starts"])
    for r in range(N):
        seg = slice(starts[r], starts[r + 1])
        v = np.asarray(cs["valid"])[seg]
        ts = np.asarray(cs["t_starts"])[seg][v]
        np.testing.assert_allclose(np.sort(ts), np.sort(t0[r][mask[r]]),
                                   rtol=1e-6)


def test_compact_samples_budget_drops_lowest_score():
    N, K = 2, 4
    t0 = np.tile(np.arange(K, dtype=np.float32)[None] * 0.01 + 0.01, (N, 1))
    t1 = t0 + 0.01
    mask = np.ones((N, K), bool)
    score = np.array([[0.9, 0.8, 0.1, 0.2], [0.7, 0.05, 0.6, 0.02]],
                     np.float32)
    cs = occupancy.compact_samples(jnp.asarray(t0), jnp.asarray(t1),
                                   jnp.asarray(mask), jnp.asarray(score),
                                   budget=4)
    kept = set(zip(np.asarray(cs["ray_id"]).tolist(),
                   np.round(np.asarray(cs["t_starts"]) / 0.01).astype(int).tolist()))
    assert kept == {(0, 1), (0, 2), (1, 1), (1, 3)}


def test_march_rays_single_gather_fresh_state_fully_occupied():
    """The single-gather march (occ_threshold path) must treat a NEVER-updated
    grid (occs all zero, binaries=ones init) as fully occupied, exactly like
    the two-gather binaries path — regression: a fresh state marched through
    the derived mask saw an all-empty grid and every render mask came back
    dead."""
    R = 16
    state = occupancy.init_occupancy(R)
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    kw = dict(bound=1.0, step_size=0.02, march_steps=128, max_samples=32)
    _, _, m_two = occupancy.march_rays(jax.random.PRNGKey(0), state, o, d,
                                       **kw)
    _, _, m_one = occupancy.march_rays(jax.random.PRNGKey(0), state, o, d,
                                       occ_threshold=0.01, **kw)
    assert int(m_two.sum()) > 0
    np.testing.assert_array_equal(np.asarray(m_one), np.asarray(m_two))

    # and after an update that empties most cells, the two paths still agree
    centers = occupancy.cell_centers(R, 1.0)
    occs = jnp.where(jnp.linalg.norm(centers, axis=-1) < 0.3, 0.5, 0.0)
    state2 = state._replace(
        occs=occs, binaries=(occs > jnp.minimum(jnp.mean(occs), 0.01))
        .reshape(R, R, R))
    _, _, m_two2 = occupancy.march_rays(jax.random.PRNGKey(1), state2, o, d,
                                        **kw)
    _, _, m_one2 = occupancy.march_rays(jax.random.PRNGKey(1), state2, o, d,
                                        occ_threshold=0.01, **kw)
    np.testing.assert_array_equal(np.asarray(m_one2), np.asarray(m_two2))
