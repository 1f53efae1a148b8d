"""Blind-SR degradation zoo: blur kernels, noise, JPEG.

Capability parity with lbasicsr/data/degradations.py (not used by the
shipped SAVSR configs). Pure numpy/cv2, host-side; kernels can be applied
on-device via lax.conv when needed.
"""

from __future__ import annotations

import math
import random
from typing import Sequence, Tuple

import cv2
import numpy as np


def _mesh_grid(kernel_size: int):
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack(
        (xx.reshape(kernel_size * kernel_size, 1), yy.reshape(kernel_size * kernel_size, 1))
    ).reshape(kernel_size, kernel_size, 2)
    return xy, xx, yy


def sigma_matrix2(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    """2x2 covariance matrix from axis sigmas and rotation."""
    d = np.array([[sig_x**2, 0], [0, sig_y**2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """Unnormalized bivariate Gaussian pdf on a kernel grid."""
    inverse_sigma = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum(np.dot(grid, inverse_sigma) * grid, 2))


def bivariate_gaussian(kernel_size, sig_x, sig_y=None, theta=0.0, grid=None, isotropic=True):
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sigma_matrix, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_gaussian(kernel_size, sig_x, sig_y, theta, beta, grid=None, isotropic=True):
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.exp(-0.5 * np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None, isotropic=True):
    if grid is None:
        grid, _, _ = _mesh_grid(kernel_size)
    if isotropic:
        sigma_matrix = np.array([[sig_x**2, 0], [0, sig_x**2]])
    else:
        sigma_matrix = sigma_matrix2(sig_x, sig_y, theta)
    inverse_sigma = np.linalg.inv(sigma_matrix)
    kernel = np.reciprocal(np.power(np.sum(np.dot(grid, inverse_sigma) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def circular_lowpass_kernel(cutoff: float, kernel_size: int, pad_to: int = 0) -> np.ndarray:
    """2-D sinc filter (ringing/overshoot degradation)."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    from scipy import special  # scipy ships with the image

    kernel = np.fromfunction(
        lambda x, y: cutoff
        * special.j1(
            cutoff * np.sqrt((x - (kernel_size - 1) / 2) ** 2 + (y - (kernel_size - 1) / 2) ** 2)
        )
        / (
            2
            * np.pi
            * np.sqrt((x - (kernel_size - 1) / 2) ** 2 + (y - (kernel_size - 1) / 2) ** 2)
        ),
        [kernel_size, kernel_size],
    )
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff**2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        pad_size = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((pad_size, pad_size), (pad_size, pad_size)))
    return kernel


def random_bivariate_gaussian(
    kernel_size, sigma_x_range, sigma_y_range=None, rotation_range=(-math.pi, math.pi),
    noise_range=None, isotropic=True,
):
    sigma_x = np.random.uniform(sigma_x_range[0], sigma_x_range[1])
    if isotropic:
        sigma_y, rotation = sigma_x, 0.0
    else:
        sigma_y = np.random.uniform(sigma_y_range[0], sigma_y_range[1])
        rotation = np.random.uniform(rotation_range[0], rotation_range[1])
    kernel = bivariate_gaussian(kernel_size, sigma_x, sigma_y, rotation, isotropic=isotropic)
    if noise_range is not None:
        noise = np.random.uniform(noise_range[0], noise_range[1], size=kernel.shape)
        kernel = kernel * noise
    return kernel / np.sum(kernel)


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
    kernel_type = random.choices(kernel_list, kernel_prob)[0]
    sx = np.random.uniform(*sigma_x_range)
    sy = np.random.uniform(*sigma_y_range)
    rot = np.random.uniform(*rotation_range)
    bg = np.random.uniform(*betag_range)
    bp = np.random.uniform(*betap_range)
    if kernel_type == "iso":
        kernel = bivariate_gaussian(kernel_size, sx, isotropic=True)
    elif kernel_type == "aniso":
        kernel = bivariate_gaussian(kernel_size, sx, sy, rot, isotropic=False)
    elif kernel_type == "generalized_iso":
        kernel = bivariate_generalized_gaussian(kernel_size, sx, sx, 0, bg, isotropic=True)
    elif kernel_type == "generalized_aniso":
        kernel = bivariate_generalized_gaussian(kernel_size, sx, sy, rot, bg, isotropic=False)
    elif kernel_type == "plateau_iso":
        kernel = bivariate_plateau(kernel_size, sx, sx, 0, bp, isotropic=True)
    elif kernel_type == "plateau_aniso":
        kernel = bivariate_plateau(kernel_size, sx, sy, rot, bp, isotropic=False)
    else:
        raise ValueError(f"unknown kernel type {kernel_type}")
    if noise_range is not None:
        noise = np.random.uniform(noise_range[0], noise_range[1], size=kernel.shape)
        kernel = kernel * noise
        kernel = kernel / np.sum(kernel)
    return kernel


# ---------------------------------------------------------------------------
# noise / jpeg
# ---------------------------------------------------------------------------


def generate_gaussian_noise(img: np.ndarray, sigma: float = 10, gray_noise: bool = False):
    if gray_noise:
        noise = np.random.randn(*img.shape[:2]).astype(np.float32) * sigma / 255.0
        noise = noise[..., None] if img.ndim == 3 else noise
    else:
        noise = np.random.randn(*img.shape).astype(np.float32) * sigma / 255.0
    return noise.astype(np.float32)


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False, gray_noise=False):
    noise = generate_gaussian_noise(img, sigma, gray_noise)
    out = img + noise
    if clip and rounds:
        out = np.clip((out * 255.0).round(), 0, 255) / 255.0
    elif clip:
        out = np.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.0
    return out


def generate_poisson_noise(img: np.ndarray, scale: float = 1.0, gray_noise: bool = False):
    base = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY) if gray_noise else img
    vals = len(np.unique(base))
    vals = 2 ** np.ceil(np.log2(vals))
    out = np.float32(np.random.poisson(base * vals) / float(vals))
    noise = out - base
    if gray_noise and img.ndim == 3:
        noise = noise[..., None]
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False, gray_noise=False):
    noise = generate_poisson_noise(img, scale, gray_noise)
    out = img + noise
    if clip and rounds:
        out = np.clip((out * 255.0).round(), 0, 255) / 255.0
    elif clip:
        out = np.clip(out, 0, 1)
    elif rounds:
        out = (out * 255.0).round() / 255.0
    return out


def random_add_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0, clip=True, rounds=False):
    sigma = np.random.uniform(sigma_range[0], sigma_range[1])
    gray_noise = np.random.uniform() < gray_prob
    return add_gaussian_noise(img, sigma, clip, rounds, gray_noise)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0, clip=True, rounds=False):
    scale = np.random.uniform(scale_range[0], scale_range[1])
    gray_noise = np.random.uniform() < gray_prob
    return add_poisson_noise(img, scale, clip, rounds, gray_noise)


def add_jpg_compression(img: np.ndarray, quality: float = 90) -> np.ndarray:
    """JPEG-compress a [0,1] BGR image at the given quality."""
    img = np.clip(img, 0, 1)
    encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
    _, encimg = cv2.imencode(".jpg", (img * 255.0).astype(np.uint8), encode_param)
    return np.float32(cv2.imdecode(encimg, 1)) / 255.0


def random_add_jpg_compression(img, quality_range: Tuple[float, float] = (90, 100)):
    quality = np.random.uniform(quality_range[0], quality_range[1])
    return add_jpg_compression(img, quality)
