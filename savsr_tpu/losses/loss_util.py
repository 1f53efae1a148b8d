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
