"""GAN losses (framework capability; unused by the shipped SAVSR configs —
reference: lbasicsr/losses/gan_loss.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register()
class GANLoss:
    """vanilla | lsgan | wgan | wgan_softplus | hinge."""

    def __init__(self, gan_type: str, real_label_val: float = 1.0,
                 fake_label_val: float = 0.0, loss_weight: float = 1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
            raise NotImplementedError(f"GAN type {gan_type} is not implemented.")

    def _target(self, x, target_is_real: bool):
        val = self.real_label_val if target_is_real else self.fake_label_val
        return jnp.full_like(x, val)

    def __call__(self, x, target_is_real: bool, is_disc: bool = False):
        if self.gan_type == "vanilla":
            t = self._target(x, target_is_real)
            loss = jnp.mean(
                jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
            )
        elif self.gan_type == "lsgan":
            t = self._target(x, target_is_real)
            loss = jnp.mean((x - t) ** 2)
        elif self.gan_type == "wgan":
            loss = -x.mean() if target_is_real else x.mean()
        elif self.gan_type == "wgan_softplus":
            loss = jax.nn.softplus(-x).mean() if target_is_real else jax.nn.softplus(x).mean()
        elif self.gan_type == "hinge":
            if is_disc:
                x = -x if target_is_real else x
                loss = jax.nn.relu(1 + x).mean()
            else:
                loss = -x.mean()
        return loss if is_disc else loss * self.loss_weight


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GANLoss averaged over a list (of lists) of multi-scale predictions."""

    def __call__(self, x, target_is_real: bool, is_disc: bool = False):
        if isinstance(x, list):
            losses = []
            for pred in x:
                if isinstance(pred, list):
                    pred = pred[-1]
                losses.append(super().__call__(pred, target_is_real, is_disc).mean())
            return jnp.stack(losses).mean()
        return super().__call__(x, target_is_real, is_disc)


def r1_penalty(real_grad, real_img_shape=None):
    """R1 gradient penalty given d(real_pred)/d(real_img)."""
    return (real_grad.reshape(real_grad.shape[0], -1) ** 2).sum(1).mean()


def gradient_penalty_loss_value(grad_interp):
    """WGAN-GP penalty given the interpolated-sample gradient."""
    norm = jnp.sqrt((grad_interp.reshape(grad_interp.shape[0], -1) ** 2).sum(1) + 1e-12)
    return ((norm - 1) ** 2).mean()
