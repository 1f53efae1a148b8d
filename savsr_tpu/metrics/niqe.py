"""NIQE no-reference metric (reference: lbasicsr/metrics/niqe.py).

Implements the NIQE pipeline — MSCN coefficients, (A)GGD feature fits over
96x96 blocks at two scales, Mahalanobis distance to pristine MVG statistics.
The pristine parameters (mu_pris_param, cov_pris_param, gaussian_window) are
a trained asset not shipped in this repo (the reference expects
``niqe_pris_params.npz`` alongside its module, which its repo also does not
contain); pass ``pris_params_path`` or place the file next to this module.
"""

from __future__ import annotations

import math
import os

import cv2
import numpy as np

from ..utils.color_util import bgr2ycbcr
from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image


def estimate_aggd_param(block: np.ndarray):
    """Estimate AGGD (asymmetric generalized Gaussian) parameters."""
    block = block.flatten()
    gam = np.arange(0.2, 10.001, 0.001)
    gam_reciprocal = np.reciprocal(gam)
    r_gam = np.square(_gamma(2 * gam_reciprocal)) / (
        _gamma(gam_reciprocal) * _gamma(3 * gam_reciprocal)
    )

    left_std = np.sqrt(np.mean(block[block < 0] ** 2)) if np.any(block < 0) else 0.0
    right_std = np.sqrt(np.mean(block[block > 0] ** 2)) if np.any(block > 0) else 0.0
    gammahat = left_std / right_std if right_std != 0 else np.inf
    rhat = (np.mean(np.abs(block))) ** 2 / np.mean(block**2)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / ((gammahat**2 + 1) ** 2)
    array_position = np.argmin((r_gam - rhatnorm) ** 2)

    alpha = gam[array_position]
    beta_l = left_std * np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    beta_r = right_std * np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
    return alpha, beta_l, beta_r


def _gamma(x):
    return np.vectorize(math.gamma)(x) if isinstance(x, np.ndarray) else math.gamma(x)


def compute_feature(block: np.ndarray) -> list:
    """18-dim NIQE feature of one MSCN block."""
    feat = []
    alpha, beta_l, beta_r = estimate_aggd_param(block)
    feat.extend([alpha, (beta_l + beta_r) / 2])
    shifts = [[0, 1], [1, 0], [1, 1], [1, -1]]
    for shift in shifts:
        shifted = np.roll(block, shift, axis=(0, 1))
        alpha, beta_l, beta_r = estimate_aggd_param(block * shifted)
        mean = (beta_r - beta_l) * (_gamma(2 / alpha) / _gamma(1 / alpha))
        feat.extend([alpha, mean, beta_l, beta_r])
    return feat


def niqe_core(
    img: np.ndarray,
    mu_pris_param: np.ndarray,
    cov_pris_param: np.ndarray,
    gaussian_window: np.ndarray,
    block_size_h: int = 96,
    block_size_w: int = 96,
) -> float:
    assert img.ndim == 2, "Input image must be a gray/Y image."
    h, w = img.shape
    num_block_h = math.floor(h / block_size_h)
    num_block_w = math.floor(w / block_size_w)
    img = img[0 : num_block_h * block_size_h, 0 : num_block_w * block_size_w]

    distparam = []
    for scale in (1, 2):
        mu = cv2.filter2D(img, -1, gaussian_window, borderType=cv2.BORDER_REPLICATE)
        sigma = np.sqrt(
            np.abs(
                cv2.filter2D(np.square(img), -1, gaussian_window, borderType=cv2.BORDER_REPLICATE)
                - np.square(mu)
            )
        )
        img_normalized = (img - mu) / (sigma + 1)

        feat = []
        for idx_w in range(num_block_w):
            for idx_h in range(num_block_h):
                block = img_normalized[
                    idx_h * block_size_h // scale : (idx_h + 1) * block_size_h // scale,
                    idx_w * block_size_w // scale : (idx_w + 1) * block_size_w // scale,
                ]
                feat.append(compute_feature(block))
        distparam.append(np.array(feat))

        if scale == 1:
            img = cv2.resize(img / 255.0, dsize=None, fx=0.5, fy=0.5, interpolation=cv2.INTER_LINEAR)
            img = img * 255.0

    distparam = np.concatenate(distparam, axis=1)
    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)
    invcov_param = np.linalg.pinv((cov_pris_param + cov_distparam) / 2)
    quality = np.matmul(
        np.matmul((mu_pris_param - mu_distparam), invcov_param),
        np.transpose(mu_pris_param - mu_distparam),
    )
    return float(np.sqrt(quality))


@METRIC_REGISTRY.register()
def calculate_niqe(
    img: np.ndarray,
    crop_border: int,
    input_order: str = "HWC",
    convert_to: str = "y",
    pris_params_path: str | None = None,
    **kwargs,
) -> float:
    """NIQE of a BGR [0,255] image. Requires the pristine-params asset."""
    if pris_params_path is None:
        pris_params_path = os.path.join(os.path.dirname(__file__), "niqe_pris_params.npz")
    if not os.path.isfile(pris_params_path):
        raise FileNotFoundError(
            f"NIQE pristine parameters not found at {pris_params_path}; download "
            "niqe_pris_params.npz (BasicSR release asset) and pass pris_params_path."
        )
    niqe_pris_params = np.load(pris_params_path)
    mu_pris_param = niqe_pris_params["mu_pris_param"]
    cov_pris_param = niqe_pris_params["cov_pris_param"]
    gaussian_window = niqe_pris_params["gaussian_window"]

    img = img.astype(np.float32)
    if input_order != "HW":
        img = reorder_image(img, input_order=input_order)
        if convert_to == "y":
            img = bgr2ycbcr(img / 255.0, y_only=True) * 255.0
        elif convert_to == "gray":
            img = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
        img = np.squeeze(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    img = img.round()
    return niqe_core(img, mu_pris_param, cov_pris_param, gaussian_window)
