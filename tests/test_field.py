import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morpheus_tpu.model import field
from morpheus_tpu.ops import hashgrid


@pytest.fixture(scope="module")
def small_spec():
    return field.FieldSpec(
        num_frames=8, bound=1.0,
        grid=hashgrid.HashGridSpec(input_dim=3, num_levels=4, level_dim=2,
                                   base_resolution=4, desired_resolution=32,
                                   log2_hashmap_size=10))


@pytest.fixture(scope="module")
def params(small_spec):
    return field.init_field(jax.random.PRNGKey(0), small_spec)


def test_geo_init_gives_sphere_like_sdf(small_spec, params):
    """Geometric init (decoders.py:25-43) should make the canonical SDF roughly
    |x| - geo_bias at init (SAL sphere init)."""
    x = jnp.array([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 0.9, 0.0]])
    out = field.query_density(params, small_spec, x, cano=True)
    sdf = np.asarray(out["sdf"])
    assert sdf[0] < 0          # center inside
    assert sdf[1] > 0 and sdf[2] > 0   # near boundary outside (radius ~0.4)
    r = np.linalg.norm(np.asarray(x), axis=-1)
    np.testing.assert_allclose(sdf, r - 0.4, atol=0.15)


def test_warp_shapes_and_zero_topo_canonical(small_spec, params):
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-1, maxval=1)
    t = jnp.full((16, 1), 0.5)
    deform, topo = field.warp(params, small_spec, x, t)
    assert deform.shape == (16, 3)
    assert topo.shape == (16, small_spec.amb_dim)


def test_density_cano_vs_deformed_differ(small_spec, params):
    # perturb the deform net so the warp is non-trivial
    p = jax.tree.map(lambda a: a + 0.05, params)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 3), minval=-0.5, maxval=0.5)
    d_cano = field.query_density(p, small_spec, x, cano=True)["sdf"]
    d_t = field.query_density(p, small_spec, x, t=0.5)["sdf"]
    assert not np.allclose(np.asarray(d_cano), np.asarray(d_t))


def test_normal_analytic_matches_fd(small_spec, params):
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 3), minval=-0.5,
                           maxval=0.5)
    n_a, raw_a = field.normal(params, small_spec, x, cano=True)
    spec_fd = field.FieldSpec(**{**small_spec.__dict__, "normal_mode": "fd"})
    n_f, raw_f = field.normal(params, spec_fd, x, cano=True)
    np.testing.assert_allclose(np.asarray(n_a), np.asarray(n_f), atol=0.05)
    nn = np.linalg.norm(np.asarray(n_a), axis=-1)
    np.testing.assert_allclose(nn, 1.0, atol=1e-4)


def test_pose_optimisation_identity_at_init(small_spec, params):
    o = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    ids = jnp.array([3])
    o2, d2 = field.pose_optimisation(params, o, d, ids)
    np.testing.assert_allclose(o2, o, atol=1e-6)
    np.testing.assert_allclose(d2, d, atol=1e-6)


def test_forward_shading_modes(small_spec, params):
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 3), minval=-0.5,
                           maxval=0.5)
    t = jnp.full((8, 1), 0.25)
    light = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (8, 3))
    for sid in range(4):
        sdf, sigma, color, n, deform, n_raw = field.forward(
            params, small_spec, x, t, light_d=light, ratio=0.5,
            shading_id=jnp.asarray(sid))
        assert color.shape == (8, 3)
        assert n.shape == (8, 3)
        assert np.all(np.isfinite(np.asarray(color)))
    # albedo-only (no normals) skips the VJP
    sdf, sigma, color, n, deform, n_raw = field.forward(
        params, small_spec, x, t, compute_normals=False)
    assert n is None and n_raw is None


def test_background_shape(small_spec, params):
    d = jnp.ones((8, 3)) / np.sqrt(3)
    t = jnp.full((8, 1), 0.5)
    bg = field.background(params, small_spec, d, t)
    assert bg.shape == (8, 3)
    assert np.all((np.asarray(bg) >= 0) & (np.asarray(bg) <= 1))


def test_forward_jits_with_traced_shading(small_spec, params):
    x = jnp.zeros((4, 3))
    t = jnp.full((4, 1), 0.5)
    light = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))

    @jax.jit
    def f(p, sid, ratio):
        return field.forward(p, small_spec, x, t, light, ratio, sid)[2]

    c1 = f(params, jnp.asarray(1), jnp.asarray(0.3))
    c2 = f(params, jnp.asarray(2), jnp.asarray(0.3))
    assert c1.shape == c2.shape == (4, 3)


@pytest.mark.slow
@pytest.mark.parametrize("policy", ["compute_dtype", "mlp_dtype"])
def test_bf16_compute_policy_loss_parity(small_spec, policy):
    """tpu.compute_dtype=bfloat16 runs MLPs in bf16 (f32 accumulation) —
    field outputs must track the f32 path within bf16 tolerance and keep
    f32 output dtypes (master weights stay f32). tpu.mlp_dtype=bfloat16 is
    the MLP-only half of the policy (tables stay f32 — the table cast
    measured +25 ms on v5e, PARITY.md). Slow tier: non-default policy
    (shipped configs run f32 compute), compile-heavy on CPU."""
    import dataclasses
    spec32 = small_spec
    spec16 = dataclasses.replace(spec32, **{policy: "bfloat16"})
    params = field.init_field(jax.random.PRNGKey(0), spec32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3),
                           minval=-0.8, maxval=0.8)
    t = jnp.full((128, 1), 0.25)
    r32 = field.query_density(params, spec32, x, t=t)
    r16 = field.query_density(params, spec16, x, t=t)
    assert r16["sdf"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(r16["sdf"]), np.asarray(r32["sdf"]),
                               atol=0.03)
    np.testing.assert_allclose(np.asarray(r16["albedo"]),
                               np.asarray(r32["albedo"]), atol=0.03)
    # gradients stay finite and close in direction
    def loss(p, s):
        out = field.query_density(p, s, x, t=t)
        return jnp.mean(out["sdf"] ** 2) + jnp.mean(out["albedo"] ** 2)
    g32 = jax.grad(loss)(params, spec32)
    g16 = jax.grad(loss)(params, spec16)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        assert np.all(np.isfinite(np.asarray(b)))
        assert b.dtype == a.dtype
