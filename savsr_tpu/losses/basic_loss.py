"""Pixel-space losses (reference: lbasicsr/losses/basic_loss.py).

Losses are pure jnp callables (usable inside the jitted train step),
instantiated by name through LOSS_REGISTRY from YAML.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import LOSS_REGISTRY
from .loss_util import weighted_loss

_reduction_modes = ["none", "mean", "sum"]


@weighted_loss
def l1_loss(pred, target):
    return jnp.abs(pred - target)


@weighted_loss
def mse_loss(pred, target):
    return (pred - target) ** 2


@weighted_loss
def charbonnier_loss(pred, target, eps=1e-12):
    return jnp.sqrt((pred - target) ** 2 + eps)


class _WeightedLoss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        if reduction not in _reduction_modes:
            raise ValueError(f"Unsupported reduction mode: {reduction}")
        self.loss_weight = loss_weight
        self.reduction = reduction


@LOSS_REGISTRY.register()
class L1Loss(_WeightedLoss):
    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * l1_loss(pred, target, weight, reduction=self.reduction)


@LOSS_REGISTRY.register()
class MSELoss(_WeightedLoss):
    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * mse_loss(pred, target, weight, reduction=self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss(_WeightedLoss):
    """Charbonnier (robust L1): sqrt((x-y)^2 + eps). The shipped SAVSR
    training loss (train_SAVSR_Vimeo90K_asBI.yml:138-141, eps=1e-12)."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean", eps: float = 1e-12):
        super().__init__(loss_weight, reduction)
        self.eps = eps

    def __call__(self, pred, target, weight=None, **kwargs):
        return self.loss_weight * charbonnier_loss(
            pred, target, weight, reduction=self.reduction, eps=self.eps
        )


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """VGG-feature (+ optional Gram style) loss (reference
    basic_loss.py:147-253). Requires converted VGG19 weights
    (vgg_weights_path) — see archs/vgg_arch.py."""

    def __init__(
        self,
        layer_weights: dict,
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        perceptual_weight: float = 1.0,
        style_weight: float = 0.0,
        criterion: str = "l1",
        vgg_weights_path: str | None = None,
    ):
        import jax

        from ..archs.vgg_arch import VGGFeatureExtractor

        self.layer_weights = layer_weights
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion_type = criterion
        self.vgg = VGGFeatureExtractor(
            layer_name_list=list(layer_weights.keys()),
            vgg_type=vgg_type,
            use_input_norm=use_input_norm,
            range_norm=range_norm,
            vgg_weights_path=vgg_weights_path,
        )
        self.vgg_params = self.vgg.init(jax.random.PRNGKey(0))

    def _crit(self, a, b):
        if self.criterion_type == "l1":
            return jnp.abs(a - b).mean()
        if self.criterion_type == "l2" or self.criterion_type == "mse":
            return ((a - b) ** 2).mean()
        if self.criterion_type == "fro":
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(f"{self.criterion_type} criterion not supported.")

    @staticmethod
    def _gram(x):
        n, h, w, c = x.shape
        feat = x.reshape(n, h * w, c)
        return jnp.einsum("nic,nid->ncd", feat, feat) / (c * h * w)

    def __call__(self, x, gt, **kwargs):
        x_features = self.vgg.apply(self.vgg_params, x)
        gt_features = self.vgg.apply(self.vgg_params, jax.lax.stop_gradient(gt))

        percep_loss = None
        if self.perceptual_weight > 0:
            percep_loss = 0.0
            for k in x_features.keys():
                percep_loss += self._crit(x_features[k], gt_features[k]) * self.layer_weights[k]
            percep_loss *= self.perceptual_weight

        style_loss = None
        if self.style_weight > 0:
            style_loss = 0.0
            for k in x_features.keys():
                style_loss += (
                    self._crit(self._gram(x_features[k]), self._gram(gt_features[k]))
                    * self.layer_weights[k]
                )
            style_loss *= self.style_weight
        return percep_loss, style_loss


@LOSS_REGISTRY.register()
class WeightedTVLoss(_WeightedLoss):
    """Total-variation loss (L1 of spatial gradients), NHWC."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        if reduction not in ["mean", "sum"]:
            raise ValueError(f"TV loss supports mean|sum, got {reduction}")
        super().__init__(loss_weight, reduction)

    def __call__(self, pred, weight=None, **kwargs):
        if weight is None:
            y_weight = x_weight = None
        else:
            y_weight = weight[:, :-1, :, :]
            x_weight = weight[:, :, :-1, :]
        y_diff = l1_loss(
            pred[:, :-1, :, :], pred[:, 1:, :, :], y_weight, reduction=self.reduction
        )
        x_diff = l1_loss(
            pred[:, :, :-1, :], pred[:, :, 1:, :], x_weight, reduction=self.reduction
        )
        return self.loss_weight * (y_diff + x_diff)
