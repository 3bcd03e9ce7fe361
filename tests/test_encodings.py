import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morpheus_tpu.ops import encodings


def test_freq_encode_matches_closed_form():
    x = jnp.array([[0.3, -0.2, 0.9]])
    out = encodings.freq_encode(x, n_freqs=4)
    assert out.shape == (1, encodings.freq_output_dim(3, 4))
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    # layout: [x, sin(1x), cos(1x), sin(2x), cos(2x), ...]
    for i, f in enumerate([1.0, 2.0, 4.0, 8.0]):
        sl = 3 + i * 6
        np.testing.assert_allclose(out[0, sl:sl + 3], np.sin(f * np.array(x[0])),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out[0, sl + 3:sl + 6], np.cos(f * np.array(x[0])),
                                   rtol=1e-5, atol=1e-6)


def test_freq_encode_max_level_masks_top_freqs():
    x = jnp.ones((2, 3)) * 0.5
    out = encodings.freq_encode(x, n_freqs=6, max_level=0.5)
    # floor(0.5*6)=3 active freq bands -> bands 3..5 zero
    start = 3 + 3 * 6
    assert np.all(np.asarray(out[:, start:]) == 0.0)
    assert not np.all(np.asarray(out[:, 3:start]) == 0.0)
    # traced max_level also works
    out_j = jax.jit(lambda ml: encodings.freq_encode(x, 6, ml))(jnp.asarray(0.5))
    np.testing.assert_allclose(out_j, out, rtol=1e-6)


def _scipy_real_sh(l, m, theta, phi):
    from scipy.special import sph_harm_y
    # scipy's P_l^m includes Condon-Shortley; our basis does not -> (-1)^m
    y = sph_harm_y(l, abs(m), theta, phi)
    cs = (-1.0) ** abs(m)
    if m > 0:
        return cs * math.sqrt(2.0) * y.real
    if m < 0:
        return cs * math.sqrt(2.0) * y.imag
    return y.real


@pytest.mark.parametrize("degree", [1, 2, 4, 8])
def test_sh_encode_matches_scipy(degree):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(32, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    out = np.asarray(encodings.sh_encode(jnp.asarray(v, jnp.float32), degree))
    theta = np.arccos(np.clip(v[:, 2], -1, 1))
    phi = np.arctan2(v[:, 1], v[:, 0])
    idx = 0
    for l in range(degree):
        for m in range(-l, l + 1):
            ref = np.array([_scipy_real_sh(l, m, th, ph)
                            for th, ph in zip(theta, phi)])
            np.testing.assert_allclose(out[:, idx], ref, rtol=2e-4, atol=2e-4,
                                       err_msg=f"l={l} m={m}")
            idx += 1
