import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morpheus_tpu.train import losses, optim
from morpheus_tpu.train.schedule import Curriculum


# ---- LR schedule parity with morpheus.py:472-502 ----

def _ref_lr_factor(epoch, warm_up_end=200, n_epochs=2000):
    if epoch < warm_up_end:
        if epoch < 100:
            return 0.01
        return 0.01 + (epoch - 100) / (warm_up_end - 100) * 0.99
    alpha = 0.05
    progress = (epoch - warm_up_end) / (n_epochs - warm_up_end)
    return (np.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha


@pytest.mark.parametrize("epoch", [0, 50, 100, 150, 199, 200, 500, 1000, 2000])
def test_lr_factor_matches_reference(epoch):
    c = Curriculum(n_epochs=2000, warm_up_end=200)
    got = float(c.lr_factor(epoch))
    np.testing.assert_allclose(got, _ref_lr_factor(epoch), rtol=1e-5)


def test_curriculum_swaps():
    c = Curriculum(n_epochs=2000, warm_up_end=200)
    ori, rgb, beta = c.loss_weights(100)
    np.testing.assert_allclose([float(ori), float(rgb), float(beta)],
                               [0.01, 5.0, 0.1], rtol=1e-6)
    ori, rgb, beta = c.loss_weights(401)
    np.testing.assert_allclose([float(ori), float(rgb), float(beta)],
                               [0.002, 10.0, 0.3], rtol=1e-6)
    assert float(c.freeze_deform(400)) == 1.0
    assert float(c.freeze_deform(401)) == 0.0
    # t-range anneal: 0.5 at start, ~0.02 at the end (morpheus.py:1459)
    lo, hi = c.sds_t_range(100)
    assert float(hi) == 0.5
    lo, hi = c.sds_t_range(2000)
    np.testing.assert_allclose(float(hi), 0.02, atol=1e-6)


def test_max_level_progression():
    c = Curriculum(n_epochs=2000)
    assert float(c.max_level(0)) == 0.5
    assert float(c.max_level(2000)) == 1.0


# ---- Adam parity with torch.optim.Adam (morpheus.py:154-155) ----

def test_adam_matches_torch():
    import torch
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    steps = 7
    grads_seq = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(steps)]
    lr = 1e-3

    # torch
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, betas=(0.9, 0.99), eps=1e-15)
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    # ours
    params = {"sdf_net": jnp.asarray(w0)}
    st = optim.adam_init(params)
    for g in grads_seq:
        st, params = optim.adam_update(st, {"sdf_net": jnp.asarray(g)}, params,
                                       lr, 0.0)
    np.testing.assert_allclose(np.asarray(params["sdf_net"]),
                               wt.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_adam_group_multiplier_and_freeze():
    params = {"pose": jnp.ones((2, 6)), "deform_net": jnp.ones((3,)),
              "sdf_net": jnp.ones((3,))}
    grads = jax.tree.map(jnp.ones_like, params)
    st = optim.adam_init(params)
    st, p2 = optim.adam_update(st, grads, params, lr=1e-2, freeze_deform=1.0)
    # frozen deform group unchanged
    np.testing.assert_array_equal(np.asarray(p2["deform_net"]),
                                  np.ones((3,)))
    # pose moves 10x slower than sdf_net
    d_pose = float(jnp.abs(params["pose"] - p2["pose"]).mean())
    d_sdf = float(jnp.abs(params["sdf_net"] - p2["sdf_net"]).mean())
    np.testing.assert_allclose(d_pose / d_sdf, 0.1, rtol=1e-3)


def test_adan_matches_reference_torch():
    """Bitwise-ish parity with the vendored Adan (models/optimizer.py:23-257),
    covering the global-clip (large grads vs max_grad_norm=5) and decoupled-wd
    (prox divisor) paths."""
    import importlib.util
    import torch

    spec_ = importlib.util.spec_from_file_location(
        "ref_optimizer", "/root/reference/models/optimizer.py")
    ref_opt = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(ref_opt)

    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    steps = 9
    # mix small grads and one huge grad so the global clip actually binds
    grads_seq = [rng.normal(size=(6, 4)).astype(np.float32)
                 * (50.0 if i == 3 else 1.0) for i in range(steps)]
    lr = 2.5e-3

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = ref_opt.Adan([wt], lr=lr, eps=1e-8, weight_decay=2e-5,
                       max_grad_norm=5.0, foreach=False)
    for g in grads_seq:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    params = {"sdf_net": jnp.asarray(w0)}
    st = optim.adan_init(params)
    for g in grads_seq:
        st, params = optim.adan_update(st, {"sdf_net": jnp.asarray(g)}, params,
                                       lr, 0.0)
    np.testing.assert_allclose(np.asarray(params["sdf_net"]),
                               wt.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_adan_runs_and_descends():
    def loss_fn(p):
        return jnp.sum((p["sdf_net"] - 3.0) ** 2)

    params = {"sdf_net": jnp.zeros((4,))}
    st = optim.adan_init(params)
    for _ in range(200):
        g = jax.grad(loss_fn)(params)
        st, params = optim.adan_update(st, g, params, lr=5e-2)
    assert float(loss_fn(params)) < 0.5


# ---- SDF losses vs the reference formula (utils.py:91-113) ----

def test_sdf_losses_bands():
    # one ray, depth 1.0, trunc 0.1; samples straddle the surface
    t_mid = jnp.array([[0.5, 0.85, 0.95, 1.0, 1.05, 1.3]])
    sdf = jnp.array([[0.5, 0.15, 0.05, 0.0, -0.05, -0.3]])
    target = jnp.array([[1.0]])
    mask = jnp.ones_like(t_mid, bool)
    fs, sdfl = losses.sdf_losses(t_mid, target, sdf, 0.1, mask)
    # free-space samples (t < 0.9) have sdf == bound -> no fs penalty
    assert float(fs) < 1e-4
    # truncation-band samples have sdf == target - t -> no sdf penalty
    assert float(sdfl) < 1e-4
    # wrong sdf in the band is penalized
    sdf_bad = sdf.at[0, 3].set(0.08)
    _, sdfl_bad = losses.sdf_losses(t_mid, target, sdf_bad, 0.1, mask)
    assert float(sdfl_bad) > 1e-3
    # negative sdf in free space is penalized
    sdf_bad2 = sdf.at[0, 0].set(-0.2)
    fs_bad, _ = losses.sdf_losses(t_mid, target, sdf_bad2, 0.1, mask)
    assert float(fs_bad) > 1e-3


def test_mask_loss_is_bce():
    p = jnp.array([0.7])
    gt = jnp.array([1.0])
    got = float(losses.mask_loss(p, gt))
    np.testing.assert_allclose(got, -np.log(0.7), rtol=1e-5)


def test_ema():
    ema = {"a": jnp.zeros(3)}
    p = {"a": jnp.ones(3)}
    ema = optim.ema_update(ema, p, 0.95)
    np.testing.assert_allclose(np.asarray(ema["a"]), 0.05, rtol=1e-6)
