"""Fused bias + LeakyReLU (+ sqrt(2) gain) — StyleGAN2's fused_act op.

The reference ships a CUDA kernel for this (lbasicsr/ops/fused_act, 224
LoC); on TPU the op is a single VPU expression that XLA fuses into its
producer, so the "kernel" is the expression itself. The op surface
(function + parameterized module) is kept for parity.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jnp.ndarray:
    """scale * leaky_relu(x + bias); bias broadcasts over the channel axis
    (last axis, NHWC)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * negative_slope) * scale


class FusedLeakyReLU:
    """Channel-bias + LeakyReLU module (params: ``name.bias``)."""

    def __init__(self, channel: int, negative_slope: float = 0.2, scale: float = math.sqrt(2.0)):
        self.channel = channel
        self.negative_slope = negative_slope
        self.scale = scale

    def init(self, key=None) -> dict:
        return {"bias": jnp.zeros((self.channel,), jnp.float32)}

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return fused_leaky_relu(x, params["bias"], self.negative_slope, self.scale)
