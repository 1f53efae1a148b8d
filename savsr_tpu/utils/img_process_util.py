"""Image processing helpers (role of lbasicsr/utils/img_process_util.py):
unsharp masking and per-image 2-D filtering, host (numpy/cv2) and device
(jnp) variants."""

from __future__ import annotations

import cv2
import numpy as np


def usm_sharp(img: np.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: int = 10) -> np.ndarray:
    """Unsharp masking with a soft mask: sharpened where the local residual
    exceeds ``threshold`` (on [0,1] float HWC images)."""
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = np.abs(residual) * 255 > threshold
    mask = mask.astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)

    sharp = img + weight * residual
    sharp = np.clip(sharp, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def filter2D_jnp(img, kernel):
    """Per-image 2-D filtering on device: img [B,H,W,C], kernel [B,kh,kw]
    (each sample filtered by its own kernel — the degradation-pipeline use).
    Implemented as kh*kw shifted multiply-accumulates (VPU)."""
    import jax.numpy as jnp

    b, h, w, c = img.shape
    _, kh, kw = kernel.shape
    pad = kh // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    out = jnp.zeros_like(img)
    for dy in range(kh):
        for dx in range(kw):
            out = out + x[:, dy : dy + h, dx : dx + w, :] * kernel[:, dy, dx][:, None, None, None]
    return out
