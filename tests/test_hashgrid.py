import pytest
import jax
import jax.numpy as jnp
import numpy as np

from morpheus_tpu.ops import hashgrid
from morpheus_tpu.ops.hashgrid import HashGridSpec, encode, init_embeddings

PRIMES = (1, 2654435761, 805459861)


def naive_encode(x01, emb, spec):
    """Slow float64 numpy reference of the grid lookup (independent impl)."""
    B = x01.shape[0]
    out = np.zeros((B, spec.num_levels * spec.level_dim))
    offsets = spec.offsets
    for level, res in enumerate(spec.resolutions):
        hsize = offsets[level + 1] - offsets[level]
        for b in range(B):
            if np.any(x01[b] < 0) or np.any(x01[b] > 1):
                continue
            if spec.align_corners:
                pos = x01[b] * (res - 1)
                g0 = np.minimum(np.floor(pos), res - 2)
            else:
                pos = np.clip(x01[b] * res - 0.5, 0, res - 1)
                g0 = np.floor(pos)
            frac = pos - g0
            if spec.interpolation == "smoothstep":
                frac = frac * frac * (3 - 2 * frac)
            acc = np.zeros(spec.level_dim)
            D = spec.input_dim
            for corner in range(1 << D):
                w = 1.0
                cg = np.zeros(D, dtype=np.uint64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        cg[d] = min(g0[d] + 1, res - 1)
                    else:
                        w *= 1 - frac[d]
                        cg[d] = g0[d]
                stride, index = 1, 0
                for d in range(D):
                    if stride <= hsize:
                        index += int(cg[d]) * stride
                    stride *= res
                if spec.gridtype == "hash" and stride > hsize:
                    h = 0
                    for d in range(D):
                        h ^= (int(cg[d]) * PRIMES[d]) & 0xFFFFFFFF
                    index = h
                acc += w * emb[index % hsize + offsets[level]]
            out[b, level * spec.level_dim:(level + 1) * spec.level_dim] = acc
    return out


def test_encode_matches_naive_dense_and_hash():
    # small table so upper levels overflow into the hash path
    spec = hashgrid.HashGridSpec(input_dim=3, num_levels=6, level_dim=2,
                                 base_resolution=4, log2_hashmap_size=8,
                                 desired_resolution=32)
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (spec.table_size, spec.level_dim))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    got = np.asarray(hashgrid.encode(x, emb, spec, bound=1.0))
    ref = naive_encode(np.asarray((x + 1) / 2, np.float64), np.asarray(emb), spec)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_out_of_range_inputs_zero():
    spec = hashgrid.HashGridSpec(num_levels=2, base_resolution=4,
                                 desired_resolution=8, log2_hashmap_size=10)
    emb = jnp.ones((spec.table_size, spec.level_dim))
    x = jnp.array([[2.0, 0.0, 0.0], [0.1, 0.2, 0.3]])
    out = np.asarray(hashgrid.encode(x, emb, spec, bound=1.0))
    assert np.all(out[0] == 0)
    assert np.all(out[1] != 0)


@pytest.mark.slow
def test_max_level_masks_levels():
    spec = hashgrid.HashGridSpec(num_levels=8, base_resolution=4,
                                 desired_resolution=64, log2_hashmap_size=12)
    emb = jnp.ones((spec.table_size, spec.level_dim))
    x = jnp.zeros((3, 3))
    out = np.asarray(hashgrid.encode(x, emb, spec, bound=1.0, max_level=0.5))
    C = spec.level_dim
    assert np.all(out[:, :4 * C] != 0)        # ceil(0.5*8)=4 active levels
    assert np.all(out[:, 4 * C:] == 0)
    # traced max_level
    out_j = jax.jit(lambda ml: hashgrid.encode(x, emb, spec, 1.0, ml))(
        jnp.asarray(0.5))
    np.testing.assert_allclose(out_j, out)


@pytest.mark.slow
def test_gradients_flow_to_embeddings_and_inputs():
    spec = hashgrid.HashGridSpec(num_levels=4, base_resolution=4,
                                 desired_resolution=32, log2_hashmap_size=10)
    emb = hashgrid.init_embeddings(jax.random.PRNGKey(0), spec) + 0.01
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.9,
                           maxval=0.9)

    def loss(e, xx):
        return jnp.sum(hashgrid.encode(xx, e, spec) ** 2)

    ge, gx = jax.grad(loss, argnums=(0, 1))(emb, x)
    assert float(jnp.abs(ge).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0
    # finite-difference check of input grads
    eps = 1e-3
    d = jnp.zeros_like(x).at[0, 0].set(eps)
    fd = (loss(emb, x + d) - loss(emb, x - d)) / (2 * eps)
    np.testing.assert_allclose(fd, gx[0, 0], rtol=2e-2, atol=1e-3)


def test_offsets_match_reference_formula():
    spec = hashgrid.HashGridSpec(input_dim=3, num_levels=16, level_dim=2,
                                 base_resolution=16, log2_hashmap_size=15,
                                 desired_resolution=128)
    offs = spec.offsets
    assert len(offs) == 17
    assert offs[0] == 0
    # the reference's ceil(base * scale^level) yields 129 at the top level too
    # (grid.py:129 with desired_resolution=128)
    assert spec.resolutions[0] == 16 and spec.resolutions[-1] == 129
    for i, res in enumerate(spec.resolutions):
        n = min(2 ** 15, res ** 3)
        n = int(np.ceil(n / 8) * 8)
        assert offs[i + 1] - offs[i] == n


@pytest.mark.parametrize("mode", [
    # fast tier golden-tests the SHIPPED default (hist_rows) + the pallas
    # row path it falls back to; non-default modes (legacy sort/cumsum,
    # rejected mxu_rows — PARITY #10) run in the slow tier (VERDICT r3 #8)
    pytest.param("sort_pallas", marks=pytest.mark.slow),
    "sort_pallas_rows", "hist_rows",
    pytest.param("mxu_rows", marks=pytest.mark.slow),
    pytest.param("sort", marks=pytest.mark.slow)])
def test_vjp_modes_match_scatter(mode):
    """All embedding-cotangent paths must agree with plain XLA scatter on
    values, embedding grads, input grads, and grad-of-grad (normals
    differentiate through the encode twice)."""
    import dataclasses
    base = HashGridSpec(input_dim=3, num_levels=4, level_dim=2,
                        base_resolution=4, log2_hashmap_size=6,
                        desired_resolution=16, vjp_mode="scatter")
    spec = dataclasses.replace(base, vjp_mode=mode)
    key = jax.random.PRNGKey(3)
    emb = init_embeddings(key, base) * 1e4   # O(1) values
    x = jax.random.uniform(key, (257, 3), minval=-0.9, maxval=0.9)

    def loss(spec_):
        def f(e, xx):
            out = encode(xx, e, spec_, bound=1.0)
            return jnp.sum(jnp.sin(out) ** 2)
        return f

    # the legacy cumsum-based 'sort' path has larger f32 summation-order
    # noise (long cumsums); the pallas paths are scatter-exact
    rtol, atol = (1e-3, 1e-5) if mode == "sort" else (2e-5, 1e-6)
    f_ref, f_new = loss(base), loss(spec)
    np.testing.assert_allclose(np.asarray(f_new(emb, x)),
                               np.asarray(f_ref(emb, x)), rtol=1e-5)
    ge_ref, gx_ref = jax.grad(f_ref, argnums=(0, 1))(emb, x)
    ge_new, gx_new = jax.grad(f_new, argnums=(0, 1))(emb, x)
    np.testing.assert_allclose(np.asarray(ge_new), np.asarray(ge_ref),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=rtol, atol=atol)

    # second order: grad wrt emb of a loss built from dfeat/dx
    def g2(spec_):
        def f(e):
            def sdf(xx):
                return jnp.sum(encode(xx, e, spec_, bound=1.0))
            n = jax.grad(sdf)(x)
            return jnp.sum(n ** 2)
        return f

    h_ref = jax.grad(g2(base))(emb)
    h_new = jax.grad(g2(spec))(emb)
    np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref),
                               rtol=rtol, atol=atol)


@pytest.mark.slow
def test_static_active_levels_matches_traced_mask():
    """encode(active_levels=k) must equal encode with the traced max_level
    mask alone — truncated levels are zero-filled either way. Slow tier:
    pure numerics-equivalence sweep (the fast train-loop smokes exercise
    active-levels in situ)."""
    spec = HashGridSpec(input_dim=3, num_levels=8, level_dim=2,
                        base_resolution=4, log2_hashmap_size=8,
                        desired_resolution=64)
    emb = init_embeddings(jax.random.PRNGKey(0), spec) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (97, 3),
                           minval=-0.9, maxval=0.9)
    for k in (1, 3, 8):
        ml = k / spec.num_levels
        ref = encode(x, emb, spec, bound=1.0, max_level=ml)
        got = encode(x, emb, spec, bound=1.0, max_level=ml, active_levels=k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)
        # gradients agree too (truncated levels get zero grad)
        f = lambda e, al: jnp.sum(encode(x, e, spec, bound=1.0, max_level=ml,
                                         active_levels=al) ** 2)
        g_ref = jax.grad(f)(emb, None)
        g_new = jax.grad(f)(emb, k)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # mxu_rows is a non-default path (PARITY #10)
@pytest.mark.parametrize("payload", [None, "bfloat16"])
def test_take_mxu_rows_matches_take(payload):
    """The Pallas MXU gather (ops/gather_pallas.py) must match jnp.take on a
    C=4 fused table with uneven level sizes and a non-BLK-multiple stream;
    its embedding cotangent must match a scatter-add. bf16 payload rounds the
    gathered values (and cotangents) to bf16 — the reference's AMP fp16
    embedding semantics (grid.py:44-47)."""
    spec = HashGridSpec(input_dim=3, num_levels=6, level_dim=4,
                        base_resolution=4, log2_hashmap_size=9,
                        desired_resolution=64)
    offsets = spec.offsets
    L = 5                                  # active subset, uneven sizes
    Np = 777                               # not a multiple of gather BLK
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (spec.table_size, 4))
    ks = jax.random.split(key, L)
    idx = jnp.concatenate([
        jax.random.randint(ks[l], (Np,), 0, offsets[l + 1] - offsets[l])
        + offsets[l] for l in range(L)]).astype(jnp.int32)

    pd = jnp.bfloat16 if payload == "bfloat16" else None
    got = jax.jit(lambda e: hashgrid.take_mxu_rows(e, idx, offsets, L,
                                                   payload_dtype=pd))(emb)
    ref = jnp.take(emb, idx, axis=0)
    if pd is None:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
    else:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref.astype(jnp.bfloat16), np.float32),
            rtol=1e-6, atol=1e-6)

    ct = jax.random.normal(jax.random.PRNGKey(1), (L * Np, 4))

    def loss(fn):
        return lambda e: jnp.sum(fn(e) * ct)

    g_ref = jax.grad(loss(lambda e: jnp.take(e, idx, axis=0)))(emb)
    g_new = jax.grad(loss(lambda e: hashgrid.take_mxu_rows(
        e, idx, offsets, L, payload_dtype=pd)))(emb)
    tol = dict(rtol=1e-5, atol=1e-5) if pd is None else \
        dict(rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), **tol)


@pytest.mark.parametrize("align,interp", [
    (False, "linear"), (True, "linear"),
    # smoothstep is config-reachable but no shipped scene uses it → slow tier
    pytest.param(False, "smoothstep", marks=pytest.mark.slow)])
def test_pack_dense_matches_unpacked(align, interp):
    """Oct-packed dense-level gathers (pack_dense) must be exact vs the
    unpacked path — values, emb/input grads, and second order — including at
    lattice borders where the +1 corners clamp (their lerp weight is zero, so
    the packed table's wrapped rows must never leak through)."""
    import dataclasses
    spec_p = HashGridSpec(input_dim=3, num_levels=6, level_dim=2,
                          base_resolution=4, log2_hashmap_size=10,
                          desired_resolution=24, vjp_mode="hist_rows",
                          align_corners=align, interpolation=interp)
    spec_u = dataclasses.replace(spec_p, pack_dense=False)
    # dense prefix: res 4..24 with 1024-slot tables -> several packed levels
    assert any(r ** 3 <= 2 ** 10 for r in spec_p.resolutions)
    key = jax.random.PRNGKey(5)
    emb = init_embeddings(key, spec_p) * 1e4
    # include exact border/vertex points (clamped corners) + random interior
    xs = [jax.random.uniform(key, (251, 3), minval=-1.0, maxval=1.0),
          jnp.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [1.0, -1.0, 0.0]])]
    x = jnp.concatenate(xs, 0)

    def f(spec_):
        return lambda e, xx: jnp.sum(
            jnp.sin(encode(xx, e, spec_, bound=1.0)) ** 2)

    np.testing.assert_allclose(np.asarray(f(spec_p)(emb, x)),
                               np.asarray(f(spec_u)(emb, x)), rtol=1e-6)
    gp = jax.grad(f(spec_p), argnums=(0, 1))(emb, x)
    gu = jax.grad(f(spec_u), argnums=(0, 1))(emb, x)
    for a, b in zip(gp, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)

    def g2(spec_):
        def f2(e):
            n = jax.grad(lambda xx: jnp.sum(encode(xx, e, spec_,
                                                   bound=1.0)))(x)
            return jnp.sum(n ** 2)
        return f2

    np.testing.assert_allclose(np.asarray(jax.grad(g2(spec_p))(emb)),
                               np.asarray(jax.grad(g2(spec_u))(emb)),
                               rtol=2e-5, atol=1e-6)
