"""upfirdn2d: upsample -> FIR filter -> downsample, fused.

Replaces the reference CUDA op (lbasicsr/ops/upfirdn2d, 584 LoC). On TPU
the exact op is one ``lax.conv_general_dilated`` call: lhs_dilation
implements the zero-stuffing upsample, asymmetric padding the pad step, and
window strides the downsample — XLA lowers the whole thing to a single
fused convolution. Gradients come from XLA's conv transpose rules (the
reference needed a hand-written autograd Function).

Semantics match the reference's ``upfirdn2d_native`` (upfirdn2d.py:162):
the kernel is applied as a true convolution (flipped correlation).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from jax import lax


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Tuple[int, ...] = (0, 0),
) -> jnp.ndarray:
    """x: [B, H, W, C]; kernel: [kh, kw] FIR filter shared across channels.

    pad: (pad0, pad1) applied to both axes — (left/top, right/bottom),
    matching the reference call convention. Negative pads crop.
    """
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])  # (x0, x1, y0, y1)
    pad_x0, pad_x1, pad_y0, pad_y1 = pad

    b, h, w, c = x.shape
    kh, kw = kernel.shape
    # flip: lax conv correlates; upfirdn applies the FIR as a convolution
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # depthwise

    # lhs_dilation produces (h-1)*up+1 samples; upfirdn zero-stuffs to h*up,
    # so the up-1 trailing zeros fold into the trailing padding
    y = lax.conv_general_dilated(
        x,
        k,
        window_strides=(down[0], down[1]),
        padding=((pad_y0, pad_y1 + up[0] - 1), (pad_x0, pad_x1 + up[1] - 1)),
        lhs_dilation=(up[0], up[1]),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return y


def make_resample_kernel(k) -> jnp.ndarray:
    """1-D list -> normalized 2-D separable resampling kernel
    (reference upfirdn2d.py usage in StyleGAN2 up/down layers)."""
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


def upsample2d(x: jnp.ndarray, kernel, factor: int = 2) -> jnp.ndarray:
    k = make_resample_kernel(kernel) * (factor**2)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, down=1,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample2d(x: jnp.ndarray, kernel, factor: int = 2) -> jnp.ndarray:
    k = make_resample_kernel(kernel)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=1, down=factor, pad=((p + 1) // 2, p // 2))
