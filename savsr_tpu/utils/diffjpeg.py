"""Differentiable JPEG compression in JAX (role of lbasicsr/utils/diffjpeg.py).

Standard DiffJPEG pipeline: RGB->YCbCr, 4:2:0 chroma subsampling, 8x8 block
DCT, quality-scaled quantization with a differentiable rounding surrogate
(round(x) + (x - round(x))^3), dequantization, IDCT, upsampling, YCbCr->RGB.
Used by blind-SR degradation pipelines; fully jit/grad-compatible.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

# Annex-K luma / chroma quantization tables
Y_TABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
C_TABLE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _dct_matrix() -> np.ndarray:
    """8x8 type-II DCT tensor [8,8,8,8] (block -> coefficients)."""
    t = np.zeros((8, 8, 8, 8), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        t[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
            (2 * y + 1) * v * np.pi / 16
        )
    alpha = np.array([1.0 / np.sqrt(2)] + [1] * 7, dtype=np.float32)
    scale = np.outer(alpha, alpha) * 0.25
    return t, scale


_DCT_T, _DCT_SCALE = _dct_matrix()


def diff_round(x: jnp.ndarray) -> jnp.ndarray:
    """Differentiable rounding surrogate: round(x) + (x-round(x))^3."""
    return jnp.round(x) + (x - jnp.round(x)) ** 3


def quality_to_factor(quality) -> jnp.ndarray:
    """JPEG quality (1-100) -> quantization scale factor."""
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2) / 100.0


def _rgb_to_ycbcr(img: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray(
        [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]],
        img.dtype,
    )
    shift = jnp.asarray([0.0, 128.0, 128.0], img.dtype)
    return img @ m.T + shift


def _ycbcr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], img.dtype
    )
    shift = jnp.asarray([0.0, 128.0, 128.0], img.dtype)
    return (img - shift) @ m.T


def _blockify(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W] -> [B, H/8 * W/8, 8, 8]."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, -1, 8, 8)


def _unblockify(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _dct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    t = jnp.asarray(_DCT_T, blocks.dtype)
    s = jnp.asarray(_DCT_SCALE, blocks.dtype)
    return s * jnp.einsum("bnxy,xyuv->bnuv", blocks - 128.0, t)


def _idct8x8(coefs: jnp.ndarray) -> jnp.ndarray:
    alpha = np.array([1.0 / np.sqrt(2)] + [1] * 7, dtype=np.float32)
    a = jnp.asarray(np.outer(alpha, alpha), coefs.dtype)
    t = jnp.asarray(_DCT_T, coefs.dtype)
    # inverse: x[xy] = 0.25 * sum_uv alpha_uv C[xy,uv] X[uv]
    return 0.25 * jnp.einsum("bnuv,xyuv->bnxy", coefs * a, t) + 128.0


def diff_jpeg(img: jnp.ndarray, quality=90, rounding=diff_round) -> jnp.ndarray:
    """Differentiable JPEG of NHWC RGB [0,1] images (H, W multiples of 16).

    Returns NHWC RGB [0,1].
    """
    b, h, w, _ = img.shape
    assert h % 16 == 0 and w % 16 == 0, "diff_jpeg needs H, W multiples of 16"
    factor = quality_to_factor(quality)

    ycbcr = _rgb_to_ycbcr(img * 255.0)
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]
    # 4:2:0 chroma subsampling (2x2 mean)
    cb_s = cb.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    cr_s = cr.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    y_tab = jnp.asarray(Y_TABLE) * factor
    c_tab = jnp.asarray(C_TABLE) * factor
    y_tab = jnp.clip(jnp.round(y_tab), 1, None)
    c_tab = jnp.clip(jnp.round(c_tab), 1, None)

    def codec(plane, tab, ph, pw):
        blocks = _blockify(plane)
        coefs = _dct8x8(blocks)
        q = rounding(coefs / tab) * tab
        return _unblockify(_idct8x8(q), ph, pw)

    y_r = codec(y, y_tab, h, w)
    cb_r = codec(cb_s, c_tab, h // 2, w // 2)
    cr_r = codec(cr_s, c_tab, h // 2, w // 2)

    # chroma upsample (nearest, as DiffJPEG)
    cb_u = jnp.repeat(jnp.repeat(cb_r, 2, axis=1), 2, axis=2)
    cr_u = jnp.repeat(jnp.repeat(cr_r, 2, axis=1), 2, axis=2)

    out = _ycbcr_to_rgb(jnp.stack([y_r, cb_u, cr_u], axis=-1))
    return jnp.clip(out / 255.0, 0.0, 1.0)


class DiffJPEG:
    """Module-style wrapper (reference DiffJPEG class interface)."""

    def __init__(self, differentiable: bool = True):
        self.rounding = diff_round if differentiable else jnp.round

    def __call__(self, img: jnp.ndarray, quality=90) -> jnp.ndarray:
        return diff_jpeg(img, quality, self.rounding)
