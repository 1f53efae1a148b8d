"""Loss reduction helpers (role of lbasicsr/losses/loss_util.py)."""

from __future__ import annotations

import functools

import jax.numpy as jnp


def reduce_loss(loss: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    raise ValueError(f"invalid reduction {reduction}")


def weight_reduce_loss(loss, weight=None, reduction="mean"):
    """Apply elementwise weights then reduce; for 'mean' with weights the
    normalizer matches the reference (averages over all elements)."""
    if weight is not None:
        loss = loss * weight
    return reduce_loss(loss, reduction)


def weighted_loss(loss_func):
    """Decorator adding (weight, reduction) handling to an elementwise loss."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction="mean", **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction)

    return wrapper


def get_local_weights(residual: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Per-pixel unbiased variance of the residual over a local k x k window
    (reflect-padded), the pixel-level LDL weight
    (lbasicsr/losses/loss_util.py:99-118). NHWC: residual is [B, H, W, 1].

    The k^2 window taps are static shifted slices of the padded map stacked
    on a new trailing axis — an XLA-friendly unfold (k is a small compile
    time constant; no gather)."""
    pad = (ksize - 1) // 2
    rp = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    h, w = residual.shape[1], residual.shape[2]
    taps = [
        rp[:, dy:dy + h, dx:dx + w, :]
        for dy in range(ksize) for dx in range(ksize)
    ]
    win = jnp.stack(taps, axis=-1)  # [B, H, W, 1, k*k]
    return jnp.var(win, axis=-1, ddof=1)  # unbiased, matching torch.var


def get_refined_artifact_map(img_gt, img_output, img_ema, ksize: int = 7):
    """LDL artifact map (Liang et al., CVPR 2022) — counterpart of
    lbasicsr/losses/loss_util.py:120-145, in NHWC.

    Pixels where the optimizing model's residual beats the EMA model's are
    not artifacts (weight 0); elsewhere the weight is the product of a
    patch-level global variance term (var over the whole map, ^(1/5)) and
    the local-window variance from :func:`get_local_weights`.

    Args:
        img_gt / img_output / img_ema: [B, H, W, C] images.
        ksize: local window size.
    Returns:
        [B, H, W, 1] per-pixel artifact weights.
    """
    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1, keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1, keepdims=True)

    patch_level_weight = jnp.var(
        residual_sr, axis=(1, 2, 3), keepdims=True, ddof=1
    ) ** (1 / 5)
    pixel_level_weight = get_local_weights(residual_sr, ksize)
    overall_weight = patch_level_weight * pixel_level_weight
    return jnp.where(residual_sr < residual_ema, 0.0, overall_weight)
