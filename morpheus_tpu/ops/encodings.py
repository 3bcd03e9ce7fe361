"""Coordinate encodings: frequency PE with progressive max_level masking and a
general real-spherical-harmonics direction encoding.

Reference parity: FreqEncoder_torch (models/encodings.py:10-57), the fused CUDA
freqencoder (external/encoders/freqencoder/src/freqencoder.cu), and the CUDA SH
encoder degrees 1-8 (external/encoders/shencoder/src/shencoder.cu). On TPU both
are closed-form jnp expressions that XLA fuses into neighbouring matmuls, so the
"fused kernel" and "torch" variants of the reference collapse into one function.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def freq_output_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    return input_dim * (1 if include_input else 0) + input_dim * n_freqs * 2


def freq_encode(x: jnp.ndarray, n_freqs: int, max_level=None,
                include_input: bool = True, log_sampling: bool = True) -> jnp.ndarray:
    """Sin/cos positional encoding, layout [x, sin(f0 x), cos(f0 x), sin(f1 x), ...].

    max_level ∈ (0, 1] masks the top frequencies to zero exactly like the
    reference's coarse-to-fine schedule (models/encodings.py:35-54):
    active levels = floor(max_level * n_freqs). max_level may be a traced scalar.
    """
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    freqs = jnp.asarray(freqs, dtype=x.dtype)                     # (F,)

    xb = x[..., None, :] * freqs[:, None]                          # (..., F, D)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)           # (..., F, 2, D)
    if max_level is not None:
        n_active = jnp.floor(jnp.asarray(max_level) * n_freqs).astype(jnp.int32)
        level_ids = jax.lax.broadcasted_iota(jnp.int32, (n_freqs, 1, 1), 0)
        enc = jnp.where(level_ids < n_active, enc, 0.0)
    enc = enc.reshape(*x.shape[:-1], n_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


# --- real spherical harmonics -------------------------------------------------

def sh_output_dim(degree: int) -> int:
    return degree * degree


@partial(jax.jit, static_argnames=("degree",))
def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical harmonics basis of unit directions, degrees 1..8.

    Output layout: Y_{l,m} for l in [0, degree), m in [-l, l], i.e. degree²
    coefficients (matches the CUDA shencoder's capability, sphere_harmonics.py:61).
    Computed via the associated-Legendre recurrence instead of hand-unrolled
    polynomials — exact for any degree and fully fusible by XLA.
    """
    assert 1 <= degree <= 8
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    # spherical convention: z = cos(theta); (x, y) azimuthal
    ct = z
    st = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, None))
    # azimuthal cos(m phi), sin(m phi) via Chebyshev-style recurrence on (x, y)/st.
    # Use st*cos(phi)=x, st*sin(phi)=y directly: define A_m = st^m cos(m phi),
    # B_m = st^m sin(m phi) with A_0=1, B_0=0, A_{m+1}=x A_m - y B_m, ...
    L = degree
    # P~_{l,m} = P_{l,m} / st^m (removes the st^m singularity; recombined via A/B)
    # recurrences: P~_{m,m} = (2m-1)!! * (-1)^m-less (no Condon-Shortley here),
    # P~_{m+1,m} = ct (2m+1) P~_{m,m},
    # P~_{l,m} = ((2l-1) ct P~_{l-1,m} - (l+m-1) P~_{l-2,m}) / (l-m)
    Pt = {}
    Pt[(0, 0)] = jnp.ones_like(ct)
    for m in range(1, L):
        Pt[(m, m)] = Pt[(m - 1, m - 1)] * (2 * m - 1)
    for m in range(0, L):
        if m + 1 < L:
            Pt[(m + 1, m)] = ct * (2 * m + 1) * Pt[(m, m)]
        for l in range(m + 2, L):
            Pt[(l, m)] = ((2 * l - 1) * ct * Pt[(l - 1, m)]
                          - (l + m - 1) * Pt[(l - 2, m)]) / (l - m)

    A = {0: jnp.ones_like(x)}
    B = {0: jnp.zeros_like(x)}
    for m in range(1, L):
        A[m] = x * A[m - 1] - y * B[m - 1]
        B[m] = x * B[m - 1] + y * A[m - 1]

    out = []
    for l in range(L):
        row = [None] * (2 * l + 1)
        # m = 0
        k0 = math.sqrt((2 * l + 1) / (4.0 * math.pi))
        row[l] = k0 * Pt[(l, 0)]
        for m in range(1, l + 1):
            k = math.sqrt((2 * l + 1) / (2.0 * math.pi)
                          * math.factorial(l - m) / math.factorial(l + m))
            # Pt already has st^m divided out; A/B carry st^m via x,y powers
            row[l + m] = k * Pt[(l, m)] * A[m]
            row[l - m] = k * Pt[(l, m)] * B[m]
        out.extend(row)
    return jnp.stack(out, axis=-1)
