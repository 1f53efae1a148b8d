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


def g_path_regularize(gen_fn, latents, mean_path_length, key=None, noise=None,
                      decay: float = 0.01):
    """StyleGAN2 path-length regularization (reference:
    lbasicsr/losses/gan_loss.py:160-169), as a functional transform.

    The torch original materializes ``fake_img`` then autograds
    ``(fake_img * noise).sum()`` back to ``latents``; here the same
    quantity is one ``jax.vjp`` pull-back of the noise cotangent through
    ``gen_fn`` (linearization at ``latents`` — no separate graph retention
    needed, and it stays differentiable for the second-order generator
    update).

    Args:
        gen_fn: ``latents [B, n_latent, D] -> fake_img [B, C, H, W]``
            (close it over the generator params).
        latents: the latent batch the path length is measured at.
        mean_path_length: running mean (scalar) carried by the caller.
        key: PRNG key used to draw the image-space noise (ignored when
            ``noise`` is given explicitly).
        noise: optional explicit noise tensor (testing / determinism).
        decay: running-mean decay (reference default 0.01).

    Returns:
        (path_penalty, mean(path_lengths) [stopped], new_mean_path_length
        [stopped]) — mirroring the reference's three return values.
    """
    import math

    fake_img, pullback = jax.vjp(gen_fn, latents)
    if noise is None:
        if key is None:
            raise ValueError("g_path_regularize needs `key` or explicit `noise`")
        noise = jax.random.normal(key, fake_img.shape, fake_img.dtype)
    noise = noise / math.sqrt(fake_img.shape[2] * fake_img.shape[3])
    (grad,) = pullback(noise)
    path_lengths = jnp.sqrt((grad ** 2).sum(2).mean(1))
    path_mean = mean_path_length + decay * (path_lengths.mean() - mean_path_length)
    path_penalty = ((path_lengths - path_mean) ** 2).mean()
    return (
        path_penalty,
        jax.lax.stop_gradient(path_lengths.mean()),
        jax.lax.stop_gradient(path_mean),
    )


def r1_penalty(real_grad, real_img_shape=None):
    """R1 gradient penalty given d(real_pred)/d(real_img)."""
    return (real_grad.reshape(real_grad.shape[0], -1) ** 2).sum(1).mean()


def gradient_penalty_loss_value(grad_interp):
    """WGAN-GP penalty given the interpolated-sample gradient."""
    norm = jnp.sqrt((grad_interp.reshape(grad_interp.shape[0], -1) ** 2).sum(1) + 1e-12)
    return ((norm - 1) ** 2).mean()
