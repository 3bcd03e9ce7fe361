"""Training curriculum as pure functions of (epoch, step).

The reference mutates its config dict and optimizer param groups mid-run
(morpheus.py:472-516,1452-1469); here every time-varying quantity is a traced
scalar computed from the epoch/step, so one compiled train step covers the whole
curriculum (only shape changes — the novel-view scale bump at epoch 800 — force
a recompile).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Curriculum:
    """Static schedule constants pulled from the config."""
    lr: float = 5e-4
    n_epochs: int = 2000
    warm_up_end: int = 200          # lr warmup end (epochs)
    warm_up_steps: int = 100        # force real view below this global step
    freeze_epoch: int = 400         # deform freeze active while epoch <= this
    progressive_level: bool = True
    albedo_iter_ratio: float = 0.1
    min_ambient_ratio: float = 0.1
    textureless_ratio: float = 0.2
    # loss-weight swap at epoch > warm_up_end + 200 (morpheus.py:1455-1466)
    ori_weight: float = 0.01
    ori_weight_late: float = 0.002
    rgb_weight: float = 5.0
    rgb_weight_late: float = 10.0
    beta_weight: float = 0.1
    beta_weight_late: float = 0.3
    t_range: tuple = (0.02, 0.5)
    # progressive view expansion (morpheus.py:796-806); off in shipped configs
    progressive_view: bool = False
    progressive_view_init_ratio: float = 0.2
    default_polar: float = 90.0
    default_azimuth: float = 0.0
    full_theta_range: tuple = (45.0, 105.0)
    full_phi_range: tuple = (-180.0, 180.0)

    @property
    def swap_epoch(self) -> int:
        return 200 + self.warm_up_end

    def lr_factor(self, epoch):
        """NDR warmup + cosine decay (morpheus.py:472-502): 0.01 below ep 100,
        linear 0.01→1 to warm_up_end, then cosine to alpha=0.05."""
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = jnp.where(
            epoch < 100, 0.01,
            0.01 + (epoch - 100) / max(self.warm_up_end - 100, 1) * 0.99)
        progress = (epoch - self.warm_up_end) / max(
            self.n_epochs - self.warm_up_end, 1)
        alpha = 0.05
        cos = (jnp.cos(np.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(epoch < self.warm_up_end, warm, cos)

    def learning_rate(self, epoch):
        return self.lr * self.lr_factor(epoch)

    def max_level(self, epoch):
        """Coarse-to-fine hash/freq level schedule (morpheus.py:808-813)."""
        if not self.progressive_level:
            return jnp.asarray(1.0)
        ratio = jnp.asarray(epoch, jnp.float32) / self.n_epochs
        return jnp.minimum(1.0, 0.5 + 0.5 * ratio)

    def freeze_deform(self, epoch):
        """1.0 while the virtual-step deform freeze is active
        (morpheus.py:1452-1453: freeze_lr turns off after freeze_epoch)."""
        return (jnp.asarray(epoch) <= self.freeze_epoch).astype(jnp.float32)

    def loss_weights(self, epoch):
        """(ori, rgb, beta) weights with the late swap (morpheus.py:1462-1466)."""
        late = jnp.asarray(epoch) > self.swap_epoch
        ori = jnp.where(late, self.ori_weight_late, self.ori_weight)
        rgb = jnp.where(late, self.rgb_weight_late, self.rgb_weight)
        beta = jnp.where(late, self.beta_weight_late, self.beta_weight)
        return ori, rgb, beta

    def view_ranges(self, epoch):
        """Progressive-view theta/phi ranges as traced scalars
        (morpheus.py:796-806: r anneals from init_ratio to 1 at twice the
        epoch ratio; ranges blend from the default polar/azimuth toward the
        full ranges). Returns ((th_lo, th_hi), (ph_lo, ph_hi))."""
        ratio = jnp.asarray(epoch, jnp.float32) / self.n_epochs
        r = jnp.minimum(1.0, self.progressive_view_init_ratio + 2.0 * ratio)
        th = tuple(self.default_polar * (1 - r) + f * r
                   for f in self.full_theta_range)
        ph = tuple(self.default_azimuth * (1 - r) + f * r
                   for f in self.full_phi_range)
        return th, ph

    def sds_t_range(self, epoch):
        """Annealed SDS timestep range (morpheus.py:1455-1461)."""
        epoch = jnp.asarray(epoch, jnp.float32)
        start = float(self.swap_epoch)
        end_t = 0.02 + 0.48 * (1.0 - (epoch - start) / max(
            self.n_epochs - start, 1.0))
        end_t = jnp.where(epoch > start, end_t, self.t_range[1])
        return jnp.asarray(self.t_range[0]), end_t

    @staticmethod
    def from_config(config: dict) -> "Curriculum":
        tr = config["train"]
        # Adan runs at 5x the base lr (morpheus.py:149: get_params_all(5*lr))
        lr = tr["lr"] * (5.0 if tr.get("optim") == "adan" else 1.0)
        return Curriculum(
            lr=lr, n_epochs=tr["n_epochs"],
            warm_up_end=tr["warm_up_end"], warm_up_steps=tr["warm_up_steps"],
            freeze_epoch=tr["freeze_epoch"],
            progressive_level=tr["progressive_level"],
            albedo_iter_ratio=tr["albedo_iter_ratio"],
            min_ambient_ratio=tr["min_ambient_ratio"],
            textureless_ratio=tr["textureless_ratio"],
            ori_weight=tr["ori_weight"], rgb_weight=tr["rgb_weight"],
            beta_weight=tr["beta_weight"],
            t_range=tuple(config["guidance"]["t_range"]),
            progressive_view=bool(tr["progressive_view"]),
            progressive_view_init_ratio=tr["progressive_view_init_ratio"],
            default_polar=config["data"]["default_polar"],
            default_azimuth=config["data"]["default_azimuth"],
            full_theta_range=tuple(config["data"]["full_theta_range"]),
            full_phi_range=tuple(config["data"]["full_phi_range"]),
        )
