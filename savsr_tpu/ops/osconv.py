"""Batched dynamic convolution: per-sample kernels on the MXU.

This is the execution engine of OSConv2d (reference savsr_arch.py:139-172),
which torch runs as a ``groups=B`` conv over a ``[1, B*C, h, w]`` view. That
trick maps poorly to TPU; here the default formulation is im2col patches
contracted against per-sample kernels with a single batched matmul
(``einsum('bhwpi,bpio->bhwo')``), which XLA tiles directly onto the MXU.
A feature-group formulation is kept for cross-checking, and a fused Pallas
kernel (savsr_tpu/ops/pallas/osconv_kernel.py) is the performance path.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def extract_patches(
    x: jnp.ndarray, ksize: Tuple[int, int], stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """[B,H,W,C] -> [B,Ho,Wo,kh*kw,C] patch tensor (zero padded)."""
    kh, kw = ksize
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    ho = (h - kh) // stride + 1
    wo = (w - kw) // stride + 1
    slices = []
    for dy in range(kh):
        for dx in range(kw):
            slices.append(
                x[:, dy : dy + ho * stride : stride, dx : dx + wo * stride : stride, :]
            )
    return jnp.stack(slices, axis=3)


def osconv_apply_einsum(
    x: jnp.ndarray, weight: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Apply per-sample kernels ``weight [B,kh,kw,I,O]`` to ``x [B,H,W,I]``."""
    b, kh, kw, ci, co = weight.shape
    patches = extract_patches(x, (kh, kw), stride, padding)  # [B,Ho,Wo,P,I]
    w = weight.reshape(b, kh * kw, ci, co)
    return jnp.einsum("bhwpi,bpio->bhwo", patches, w)


def osconv_apply_grouped(
    x: jnp.ndarray, weight: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Feature-group formulation (the reference's groups=B trick, adapted to
    NHWC): one conv with feature_group_count=B."""
    b, h, w_, ci = x.shape
    _, kh, kw, _, co = weight.shape
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w_, b * ci)
    wg = jnp.transpose(weight, (1, 2, 3, 0, 4)).reshape(kh, kw, ci, b * co)
    y = lax.conv_general_dilated(
        xg,
        wg,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b,
    )
    ho, wo = y.shape[1], y.shape[2]
    return jnp.transpose(y.reshape(ho, wo, b, co), (2, 0, 1, 3))


def osconv_apply_batchgroup(
    x: jnp.ndarray, weight: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """batch_group_count formulation: XLA's native per-sample-weight conv
    (the primitive behind grouped-conv weight gradients)."""
    b, h, w_, ci = x.shape
    _, kh, kw, _, co = weight.shape
    wg = jnp.transpose(weight, (1, 2, 3, 0, 4)).reshape(kh, kw, ci, b * co)
    y = lax.conv_general_dilated(
        x,
        wg,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        batch_group_count=b,
    )
    # output: [1, Ho, Wo, B*Cout], feature blocks per batch group
    ho, wo = y.shape[1], y.shape[2]
    return jnp.transpose(y.reshape(ho, wo, b, co), (2, 0, 1, 3))


def osconv_apply_taps(
    x: jnp.ndarray, weight: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Tap-decomposed batched matmul: y = sum over the kh*kw taps of
    shift_t(x) @ W[:, t] — 9 MXU-shaped batched GEMMs (batch=B, M=H*W,
    K=Cin, N=Cout) on shifted slices of the padded input, with NO
    materialized patch tensor (the einsum engine's [B,H,W,9,Cin] copy is
    a measured train-step hotspot) and no feature-grouped conv (XLA's
    grouped path idles the MXU at these shapes)."""
    b, kh, kw = weight.shape[0], weight.shape[1], weight.shape[2]
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h, w_ = x.shape[1], x.shape[2]
    ho = (h - kh) // stride + 1
    wo = (w_ - kw) // stride + 1
    y = None
    for dy in range(kh):
        for dx in range(kw):
            xs = x[:, dy : dy + ho * stride : stride, dx : dx + wo * stride : stride, :]
            yt = jnp.einsum("bhwi,bio->bhwo", xs, weight[:, dy, dx])
            y = yt if y is None else y + yt
    return y


def osconv_apply_kpatch3(
    x: jnp.ndarray, weight: jnp.ndarray, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Half-im2col: patch only the WIDTH taps (kw shifted slices stacked
    along the channel axis -> [B, Hp, W, kw*Cin], a kw-times copy instead of
    the einsum engine's kh*kw-times patch tensor), then contract one batched
    GEMM per ROW tap: y = sum_dy P3[:, dy:dy+H] @ W_dy with
    W_dy = weight[:, dy] reshaped [B, kw*Cin, Cout]. kh matmuls of
    K = kw*Cin (e.g. 576 at Cin=192) instead of the taps engine's kh*kw
    small K=Cin dots -- fewer, deeper MXU contractions, 3x less operand
    re-materialization."""
    b, kh, kw, ci, co = weight.shape
    if stride != 1:
        return osconv_apply_einsum(x, weight, stride, padding)
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h, w_ = x.shape[1], x.shape[2]
    ho = h - kh + 1
    wo = w_ - kw + 1
    # [B, Hp, Wo, kw*Cin]: width taps stacked along channels
    p3 = jnp.concatenate([x[:, :, dx : dx + wo, :] for dx in range(kw)], axis=-1)
    # weight rows: [B, kh, kw*Cin, Cout]
    wr = weight.reshape(b, kh, kw * ci, co)
    y = None
    for dy in range(kh):
        yt = jnp.einsum("bhwi,bio->bhwo", p3[:, dy : dy + ho], wr[:, dy])
        y = yt if y is None else y + yt
    return y


def osconv_apply(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    impl: str = "einsum",
) -> jnp.ndarray:
    if impl == "einsum":
        return osconv_apply_einsum(x, weight, stride, padding)
    if impl == "grouped":
        return osconv_apply_grouped(x, weight, stride, padding)
    if impl == "batchgroup":
        return osconv_apply_batchgroup(x, weight, stride, padding)
    if impl == "taps":
        return osconv_apply_taps(x, weight, stride, padding)
    if impl == "kpatch3":
        return osconv_apply_kpatch3(x, weight, stride, padding)
    if impl == "pallas_train":
        from .pallas.osconv_kernel import osconv_agg_train

        assert stride == 1
        return osconv_agg_train(x, weight, padding)
    raise ValueError(f"unknown osconv impl {impl}")
    # the fully-fused Pallas path lives in ops/pallas/osconv_kernel.py and is
    # invoked from the arch (it consumes raw x + attentions, not the
    # materialized per-sample weights this signature implies)
