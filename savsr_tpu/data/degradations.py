"""Blind-SR degradation zoo: blur kernels, noise, JPEG.

Capability parity with lbasicsr/data/degradations.py (not used by the
shipped SAVSR configs). Pure numpy/cv2, host-side; kernels can be applied
on-device via lax.conv when needed.

Derivation notes (all three blur families are radial profiles of the
Mahalanobis distance d(x) = x^T S^-1 x for a 2x2 covariance S built from
axis sigmas + rotation; see e.g. Real-ESRGAN sec. 3 / standard multivariate
Gaussian identities):

- gaussian:             k(x) ~ exp(-d/2)
- generalized gaussian: k(x) ~ exp(-(d/2)^beta)     (beta=1 -> gaussian)
- plateau:              k(x) ~ 1 / (d^beta + 1)

The public function names/signatures intentionally match the BasicSR zoo so
configs and user code written against the reference keep working; the
implementation below is structured around a single profile-parameterized
builder instead of one function body per family.
"""

from __future__ import annotations

import math
import random
from typing import Callable, Optional, Sequence, Tuple

import cv2
import numpy as np


def _kernel_grid(kernel_size: int) -> np.ndarray:
    """[k, k, 2] grid of (x, y) offsets centred on the kernel (integer
    offsets, shifted by +0.5 cell for even sizes — the zoo convention)."""
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    return np.stack(np.meshgrid(ax, ax), axis=-1)


def _covariance(sig_x: float, sig_y: Optional[float], theta: float,
                isotropic: bool) -> np.ndarray:
    """2x2 covariance: R(theta) diag(sx^2, sy^2) R(theta)^T."""
    if isotropic:
        return np.diag([sig_x**2, sig_x**2]).astype(np.float64)
    c, s = math.cos(theta), math.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    return rot @ np.diag([sig_x**2, sig_y**2]) @ rot.T


def _mahalanobis_sq(cov: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """d(x) = x^T cov^-1 x over a [k, k, 2] grid."""
    prec = np.linalg.inv(cov)
    return np.einsum("hwi,ij,hwj->hw", grid, prec, grid)


def _profile_kernel(
    profile: Callable[[np.ndarray], np.ndarray],
    kernel_size: int,
    cov: np.ndarray,
    grid: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Normalized blur kernel from a radial profile of the Mahalanobis
    distance."""
    if grid is None:
        grid = _kernel_grid(kernel_size)
    k = profile(_mahalanobis_sq(cov, grid))
    return k / k.sum()


# --- BasicSR-compatible public API ----------------------------------------


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """2x2 covariance matrix from axis sigmas and rotation."""
    return _covariance(sig_x, sig_y, theta, isotropic=False)


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Unnormalized bivariate Gaussian pdf on a kernel grid."""
    return np.exp(-0.5 * _mahalanobis_sq(sigma_matrix, grid))


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=0.0, grid=None,
                       isotropic=True):
    cov = _covariance(sig_x, sig_y, theta, isotropic)
    return _profile_kernel(lambda d: np.exp(-0.5 * d), kernel_size, cov, grid)


def bivariate_generalized_gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   grid=None, isotropic=True):
    cov = _covariance(sig_x, sig_y, theta, isotropic)
    return _profile_kernel(
        lambda d: np.exp(-0.5 * np.power(d, beta)), kernel_size, cov, grid
    )


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None,
                      isotropic=True):
    cov = _covariance(sig_x, sig_y, theta, isotropic)
    return _profile_kernel(
        lambda d: np.reciprocal(np.power(d, beta) + 1), kernel_size, cov, grid
    )


def circular_lowpass_kernel(cutoff: float, kernel_size: int, pad_to: int = 0) -> np.ndarray:
    """2-D sinc (ideal circular low-pass) filter for ringing/overshoot
    degradations: k(r) = cutoff * J1(cutoff*r) / (2*pi*r), the inverse
    Fourier transform of a disc of radius ``cutoff``."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    from scipy import special  # scipy ships with the image

    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    r = np.hypot(ax[:, None], ax[None, :])
    with np.errstate(invalid="ignore", divide="ignore"):
        kernel = cutoff * special.j1(cutoff * r) / (2 * np.pi * r)
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / kernel.sum()
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad, pad), (pad, pad)))
    return kernel


def random_bivariate_gaussian(
    kernel_size, sigma_x_range, sigma_y_range=None,
    rotation_range=(-math.pi, math.pi), noise_range=None, isotropic=True,
):
    sigma_x = np.random.uniform(*sigma_x_range)
    if isotropic:
        sigma_y, rotation = sigma_x, 0.0
    else:
        sigma_y = np.random.uniform(*sigma_y_range)
        rotation = np.random.uniform(*rotation_range)
    kernel = bivariate_gaussian(kernel_size, sigma_x, sigma_y, rotation,
                                isotropic=isotropic)
    if noise_range is not None:
        kernel = kernel * np.random.uniform(*noise_range, size=kernel.shape)
    return kernel / kernel.sum()


def random_mixed_kernels(
    kernel_list: Sequence[str],
    kernel_prob: Sequence[float],
    kernel_size: int = 21,
    sigma_x_range=(0.6, 5),
    sigma_y_range=(0.6, 5),
    rotation_range=(-math.pi, math.pi),
    betag_range=(0.5, 8),
    betap_range=(0.5, 8),
    noise_range=None,
) -> np.ndarray:
    """Sample one kernel from the mixed pool (iso/aniso x gaussian/
    generalized/plateau)."""
    kind = random.choices(kernel_list, kernel_prob)[0]
    sx = np.random.uniform(*sigma_x_range)
    sy = np.random.uniform(*sigma_y_range)
    rot = np.random.uniform(*rotation_range)
    bg = np.random.uniform(*betag_range)
    bp = np.random.uniform(*betap_range)
    builders = {
        "iso": lambda: bivariate_gaussian(kernel_size, sx, isotropic=True),
        "aniso": lambda: bivariate_gaussian(kernel_size, sx, sy, rot, isotropic=False),
        "generalized_iso": lambda: bivariate_generalized_gaussian(
            kernel_size, sx, sx, 0, bg, isotropic=True),
        "generalized_aniso": lambda: bivariate_generalized_gaussian(
            kernel_size, sx, sy, rot, bg, isotropic=False),
        "plateau_iso": lambda: bivariate_plateau(kernel_size, sx, sx, 0, bp, isotropic=True),
        "plateau_aniso": lambda: bivariate_plateau(kernel_size, sx, sy, rot, bp, isotropic=False),
    }
    if kind not in builders:
        raise ValueError(f"unknown kernel type {kind}")
    kernel = builders[kind]()
    if noise_range is not None:
        kernel = kernel * np.random.uniform(*noise_range, size=kernel.shape)
        kernel = kernel / kernel.sum()
    return kernel


# ---------------------------------------------------------------------------
# noise / jpeg
# ---------------------------------------------------------------------------


def _quantize(out: np.ndarray, clip: bool, rounds: bool) -> np.ndarray:
    if clip and rounds:
        return np.clip((out * 255.0).round(), 0, 255) / 255.0
    if clip:
        return np.clip(out, 0, 1)
    if rounds:
        return (out * 255.0).round() / 255.0
    return out


def generate_gaussian_noise(img: np.ndarray, sigma: float = 10, gray_noise: bool = False):
    if gray_noise:
        noise = np.random.randn(*img.shape[:2]).astype(np.float32) * sigma / 255.0
        noise = noise[..., None] if img.ndim == 3 else noise
    else:
        noise = np.random.randn(*img.shape).astype(np.float32) * sigma / 255.0
    return noise.astype(np.float32)


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False, gray_noise=False):
    return _quantize(img + generate_gaussian_noise(img, sigma, gray_noise), clip, rounds)


def generate_poisson_noise(img: np.ndarray, scale: float = 1.0, gray_noise: bool = False):
    base = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if gray_noise else img
    vals = 2 ** np.ceil(np.log2(len(np.unique(base))))
    noisy = np.float32(np.random.poisson(base * vals) / float(vals))
    noise = noisy - base
    if gray_noise and img.ndim == 3:
        noise = noise[..., None]
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False, gray_noise=False):
    return _quantize(img + generate_poisson_noise(img, scale, gray_noise), clip, rounds)


def random_add_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0, clip=True, rounds=False):
    sigma = np.random.uniform(*sigma_range)
    gray_noise = np.random.uniform() < gray_prob
    return add_gaussian_noise(img, sigma, clip, rounds, gray_noise)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0, clip=True, rounds=False):
    scale = np.random.uniform(*scale_range)
    gray_noise = np.random.uniform() < gray_prob
    return add_poisson_noise(img, scale, clip, rounds, gray_noise)


def add_jpg_compression(img: np.ndarray, quality: float = 90) -> np.ndarray:
    """JPEG-compress a [0,1] BGR image at the given quality."""
    img = np.clip(img, 0, 1)
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode(".jpg", (img * 255.0).astype(np.uint8), encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.0


def random_add_jpg_compression(img, quality_range: Tuple[float, float] = (90, 100)):
    return add_jpg_compression(img, np.random.uniform(*quality_range))
