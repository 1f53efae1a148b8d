"""Color space conversions (MATLAB-compatible BT.601 YCbCr).

Numerically equivalent to lbasicsr/utils/color_util.py so that Y-channel
PSNR/SSIM match the reference bit-for-bit. Pure numpy; a jnp variant of the
Y-only transform is provided for on-device metric computation.
"""

from __future__ import annotations

import numpy as np


def _convert_input_type_range(img: np.ndarray) -> np.ndarray:
    """Normalize to float32 in [0, 1] (accepts uint8 [0,255] or float [0,1])."""
    img_type = img.dtype
    img = img.astype(np.float32)
    if img_type == np.uint8:
        img /= 255.0
    elif img_type not in (np.float32, np.float64):
        raise TypeError(f"Image type must be uint8/float32/float64, got {img_type}")
    return img


def _convert_output_type_range(img: np.ndarray, dst_type) -> np.ndarray:
    """Restore [0,255] uint8 (rounded) or float of the input's range."""
    if dst_type not in (np.uint8, np.float32, np.float64):
        raise TypeError(f"dst_type must be uint8/float32/float64, got {dst_type}")
    if dst_type == np.uint8:
        img = img.round()
    else:
        img /= 255.0
    return img.astype(dst_type)


# BT.601 full-swing matrices (MATLAB rgb2ycbcr convention)
_RGB2YCBCR = np.array(
    [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786], [24.966, 112.0, -18.214]]
)
_Y_FROM_RGB = np.array([65.481, 128.553, 24.966])


def rgb2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    img_type = img.dtype
    img = _convert_input_type_range(img)
    if y_only:
        out = np.dot(img, _Y_FROM_RGB) + 16.0
    else:
        out = np.matmul(img, _RGB2YCBCR) + [16, 128, 128]
    return _convert_output_type_range(out, img_type)


def bgr2ycbcr(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    img_type = img.dtype
    img = _convert_input_type_range(img)
    if y_only:
        out = np.dot(img, _Y_FROM_RGB[::-1]) + 16.0
    else:
        out = np.matmul(img, _RGB2YCBCR[::-1]) + [16, 128, 128]
    return _convert_output_type_range(out, img_type)


def ycbcr2rgb(img: np.ndarray) -> np.ndarray:
    img_type = img.dtype
    img = _convert_input_type_range(img) * 255
    inv = np.linalg.inv(_RGB2YCBCR) * 255
    out = np.matmul(img, inv) - np.matmul(np.array([16, 128, 128]), inv)
    return _convert_output_type_range(out, img_type)


def ycbcr2bgr(img: np.ndarray) -> np.ndarray:
    return ycbcr2rgb(img)[..., ::-1].copy()


def rgb2ycbcr_jnp(img, y_only: bool = True):
    """jnp colorspace transform for on-device metrics: img float [0,1] NHWC
    RGB -> Y in [16/255 .. 235/255] (y_only) or full YCbCr [..., 3],
    matching rgb2ycbcr_pt semantics (reference color_util.py)."""
    import jax.numpy as jnp

    if y_only:
        weight = jnp.asarray(_Y_FROM_RGB, dtype=img.dtype)
        y = img @ weight + 16.0
        return y / 255.0
    mat = jnp.asarray(_RGB2YCBCR, dtype=img.dtype)
    off = jnp.asarray([16.0, 128.0, 128.0], dtype=img.dtype)
    return (img @ mat + off) / 255.0
