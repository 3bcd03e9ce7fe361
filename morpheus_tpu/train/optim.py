"""Optimizers: per-group Adam (torch-parity betas/eps) and Adan
(reference: morpheus.py:142-166, models/optimizer.py).

Instead of torch param groups with mutable lr, each leaf carries a static lr
multiplier (group structure, reference get_params_all models/model.py:309-333)
and the *traced* base lr + a traced freeze factor for the deformation group are
passed per step — so LR scheduling and the virtual-step deform freeze
(morpheus.py:504-516) live inside one compiled train step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# param-tree top-level key → (group name, static lr multiplier)
# (mirrors models/model.py:309-333: pose lr/10, density lr/2, rest lr)
GROUP_MULTIPLIERS = {
    "sdf_grid": 1.0,      # 'encoder_sdf'
    "color_grid": 1.0,    # 'encoder_color'
    "sdf_net": 1.0,       # 'decoder_sdf'
    "topo_net": 1.0,      # 'decoder_topo'
    "color_net": 1.0,     # 'decoder_color'
    "beta": 0.5,          # 'density'
    "deform_net": 1.0,    # 'decoder_deform'
    "deform_code": 1.0,   # 'code_deform'
    "pose": 0.1,          # 'pose'
    "bg_net": 1.0,        # 'decoder_bg'
    "app_code": 1.0,      # 'code_app'
}

# groups zeroed while the deformation field is frozen (morpheus.py:504-511)
FREEZE_GROUPS = ("deform_code", "deform_net", "topo_net")


def group_scale_tree(params: dict, freeze_deform) -> dict:
    """Per-top-level-key traced lr scale; freeze_deform ∈ {0.,1.} multiplies the
    deform groups by (1 - freeze_deform)."""
    scales = {}
    for k in params:
        mult = GROUP_MULTIPLIERS.get(k, 1.0)
        s = jnp.asarray(mult, jnp.float32)
        if k in FREEZE_GROUPS:
            s = s * (1.0 - freeze_deform)
        scales[k] = s
    return scales


class AdamState(NamedTuple):
    step: jnp.ndarray
    mu: dict
    nu: dict


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.zeros_like, params))


def adam_update(state: AdamState, grads, params, lr, freeze_deform=0.0,
                b1: float = 0.9, b2: float = 0.99, eps: float = 1e-15):
    """torch.optim.Adam semantics (betas=(0.9,0.99), eps=1e-15;
    morpheus.py:154-155) with per-group lr scaling."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    scales = group_scale_tree(params, freeze_deform)

    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t

    new_params = {}
    for k in params:
        scale = scales[k] * lr
        new_params[k] = jax.tree.map(
            lambda p, m, v: p - scale * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            params[k], mu[k], nu[k])
    return AdamState(step=step, mu=mu, nu=nu), new_params


class AdanState(NamedTuple):
    step: jnp.ndarray
    m: dict       # EMA of grads
    v: dict       # EMA of grad differences
    n: dict       # EMA of squared (g + (1-b2) diff)
    prev_grad: dict


def adan_init(params) -> AdanState:
    z = lambda: jax.tree.map(jnp.zeros_like, params)
    return AdanState(step=jnp.zeros((), jnp.int32), m=z(), v=z(), n=z(),
                     prev_grad=z())


def adan_update(state: AdanState, grads, params, lr, freeze_deform=0.0,
                b1: float = 0.98, b2: float = 0.92, b3: float = 0.99,
                eps: float = 1e-8, weight_decay: float = 2e-5,
                max_grad_norm: float = 5.0):
    """Adan (Nesterov-momentum) optimizer, matching the vendored reference
    (models/optimizer.py:23-257): global grad-norm clip, three EMAs,
    decoupled weight decay as a (1 + lr*wd) divisor."""
    # global grad clipping — clamp(max_norm / (||g|| + eps), max=1)
    # (models/optimizer.py:120-127)
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    clip = jnp.minimum(1.0, max_grad_norm / (gnorm + eps))
    grads = jax.tree.map(lambda g: g * clip, grads)

    step = state.step + 1
    t = step.astype(jnp.float32)
    first = (t <= 1.0).astype(jnp.float32)
    scales = group_scale_tree(params, freeze_deform)

    bc1 = 1 - b1 ** t
    bc2 = 1 - b2 ** t
    bc3 = 1 - b3 ** t

    def upd(p, g, m, v, n, pg, scale):
        diff = (1.0 - first) * (g - pg)
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * diff
        u = g + b2 * diff
        n2 = b3 * n + (1 - b3) * u * u
        denom = jnp.sqrt(n2 / bc3) + eps
        step_val = (m2 / bc1 + b2 * v2 / bc2) / denom
        p2 = p - scale * lr * step_val
        return p2 / (1.0 + scale * lr * weight_decay), m2, v2, n2

    new_params, new_m, new_v, new_n = {}, {}, {}, {}
    for k in params:
        res = jax.tree.map(
            lambda p, g, m, v, n, pg: upd(p, g, m, v, n, pg, scales[k]),
            params[k], grads[k], state.m[k], state.v[k], state.n[k],
            state.prev_grad[k],
            is_leaf=lambda x: isinstance(x, jnp.ndarray))
        # unzip the per-leaf tuples
        new_params[k] = jax.tree.map(lambda r: r[0], res,
                                     is_leaf=lambda x: isinstance(x, tuple))
        new_m[k] = jax.tree.map(lambda r: r[1], res,
                                is_leaf=lambda x: isinstance(x, tuple))
        new_v[k] = jax.tree.map(lambda r: r[2], res,
                                is_leaf=lambda x: isinstance(x, tuple))
        new_n[k] = jax.tree.map(lambda r: r[3], res,
                                is_leaf=lambda x: isinstance(x, tuple))
    return AdanState(step=step, m=new_m, v=new_v, n=new_n,
                     prev_grad=grads), new_params


# ---- EMA over model params (reference: torch_ema, morpheus.py:160-164) ----

def ema_init(params):
    return jax.tree.map(jnp.array, params)


def ema_update(ema, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1 - decay) * p, ema, params)
