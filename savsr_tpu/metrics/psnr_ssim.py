"""PSNR / SSIM, MATLAB-faithful (Y-channel option, 11x11 Gaussian SSIM in
valid mode). Numerically equivalent to lbasicsr/metrics/psnr_ssim.py.

Host (numpy) versions are the canonical evaluation path; ``*_jnp`` variants
run the same math on device for fast in-loop validation.
"""

from __future__ import annotations

import numpy as np

from ..utils.color_util import rgb2ycbcr_jnp
from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image, to_y_channel


def _gaussian_kernel_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2.0 * sigma**2))
    return g / g.sum()


def _crop_and_y(img, img2, crop_border, input_order, test_y_channel):
    assert img.shape == img2.shape, (
        f"Image shapes are different: {img.shape}, {img2.shape}."
    )
    img = reorder_image(np.asarray(img), input_order=input_order)
    img2 = reorder_image(np.asarray(img2), input_order=input_order)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel:
        img = to_y_channel(img)
        img2 = to_y_channel(img2)
    return img.astype(np.float64), img2.astype(np.float64)


@METRIC_REGISTRY.register()
def calculate_psnr(
    img, img2, crop_border, input_order="HWC", test_y_channel=False, **kwargs
) -> float:
    """PSNR on [0,255] images (BGR HWC by convention, as written by
    ``array2img``)."""
    img, img2 = _crop_and_y(img, img2, crop_border, input_order, test_y_channel)
    mse = np.mean((img - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _valid_gaussian_filter(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable valid-mode 2-D Gaussian filtering of an HW image."""
    size = k.shape[0]
    h, w = img.shape
    # horizontal pass
    out = np.zeros((h, w - size + 1), dtype=np.float64)
    for j in range(size):
        out += k[j] * img[:, j : j + w - size + 1]
    # vertical pass
    out2 = np.zeros((h - size + 1, out.shape[1]), dtype=np.float64)
    for i in range(size):
        out2 += k[i] * out[i : i + h - size + 1, :]
    return out2


def _ssim_single(img: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM, 11x11 Gaussian sigma 1.5, valid mode, [0,255]."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    k = _gaussian_kernel_1d(11, 1.5)

    mu1 = _valid_gaussian_filter(img, k)
    mu2 = _valid_gaussian_filter(img2, k)
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _valid_gaussian_filter(img**2, k) - mu1_sq
    sigma2_sq = _valid_gaussian_filter(img2**2, k) - mu2_sq
    sigma12 = _valid_gaussian_filter(img * img2, k) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


@METRIC_REGISTRY.register()
def calculate_ssim(
    img, img2, crop_border, input_order="HWC", test_y_channel=False, **kwargs
) -> float:
    """SSIM on [0,255] images; channels averaged."""
    img, img2 = _crop_and_y(img, img2, crop_border, input_order, test_y_channel)
    ssims = [_ssim_single(img[..., i], img2[..., i]) for i in range(img.shape[2])]
    return float(np.mean(ssims))


# ---------------------------------------------------------------------------
# Device-side variants (float inputs in [0, 1], NHWC RGB)
# ---------------------------------------------------------------------------


def calculate_psnr_jnp(img, img2, crop_border=0, test_y_channel=False):
    """PSNR of NHWC RGB [0,1] device arrays; returns per-sample values.

    Note: operates on float arrays directly (no uint8 rounding), matching
    calculate_psnr_pt rather than the canonical uint8 path.
    """
    import jax.numpy as jnp

    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        img = rgb2ycbcr_jnp(img)[..., None]
        img2 = rgb2ycbcr_jnp(img2)[..., None]
    mse = jnp.mean((img - img2) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-8))


def calculate_ssim_jnp(img, img2, crop_border=0, test_y_channel=False):
    """SSIM of NHWC RGB [0,1] device arrays; per-sample values."""
    import jax.numpy as jnp
    from jax import lax

    if crop_border != 0:
        img = img[:, crop_border:-crop_border, crop_border:-crop_border, :]
        img2 = img2[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        img = rgb2ycbcr_jnp(img)[..., None]
        img2 = rgb2ycbcr_jnp(img2)[..., None]
    img = img * 255.0
    img2 = img2 * 255.0

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    k = jnp.asarray(_gaussian_kernel_1d(11, 1.5), dtype=img.dtype)
    c = img.shape[-1]
    window = (k[:, None] * k[None, :])[..., None, None]  # [11,11,1,1]
    window = jnp.tile(window, (1, 1, 1, c))

    def filt(x):
        return lax.conv_general_dilated(
            x,
            window,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = filt(img), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = filt(img * img) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img * img2) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.mean(axis=(1, 2, 3))
