"""NIQE no-reference quality metric.

Functional parity with lbasicsr/metrics/niqe.py (itself the BasicSR port of
Mittal et al., "Making a 'Completely Blind' Image Quality Analyzer", 2013),
re-derived from the published algorithm with a block-vectorized layout:

1. MSCN coefficients: local mean/std via a Gaussian window, replicate
   borders, ``(img - mu) / (sigma + 1)``.
2. Per 96x96 block (at scales 1 and 0.5): a GGD fit of the coefficients and
   AGGD fits of the four orientation products -> 18 features per block/scale.
3. Quality = Mahalanobis-style distance between the MVG of the test features
   and the pristine MVG (``niqe_pris_params.npz`` — a trained asset shipped
   by BasicSR releases, not re-derivable here; pass ``pris_params_path``).

Unlike the reference's per-block Python loop, all blocks of a scale are fit
in one vectorized pass: the AGGD shape parameter is solved by nearest-point
lookup of the (monotone) ratio curve r(a) = G(2/a)^2 / (G(1/a) G(3/a)) over
the standard a in [0.2, 10] grid for every block at once.
"""

from __future__ import annotations

import math
import os

import cv2
import numpy as np
from scipy.special import gamma as _Gamma

from ..utils.color_util import bgr2ycbcr
from ..utils.registry import METRIC_REGISTRY
from .metric_util import reorder_image

# the standard NIQE shape-parameter search grid and its ratio curve,
# precomputed once (r is monotone increasing in a on this range)
_ALPHA_GRID = np.arange(0.2, 10.001, 0.001)
_R_CURVE = _Gamma(2.0 / _ALPHA_GRID) ** 2 / (
    _Gamma(1.0 / _ALPHA_GRID) * _Gamma(3.0 / _ALPHA_GRID)
)


def _nearest_alpha(ratio: np.ndarray) -> np.ndarray:
    """For each target ratio, the grid alpha whose r(alpha) is closest.

    Degenerate blocks (one-sided or constant samples) produce a non-finite
    ratio; they resolve to the first grid point, the same fixed point an
    argmin over an all-NaN/inf distance row yields in the classic form."""
    finite = np.isfinite(ratio)
    idx = np.searchsorted(_R_CURVE, np.where(finite, ratio, _R_CURVE[0]))
    idx = np.clip(idx, 1, len(_R_CURVE) - 1)
    pick_lower = np.abs(_R_CURVE[idx - 1] - ratio) <= np.abs(_R_CURVE[idx] - ratio)
    idx = idx - pick_lower.astype(np.int64)
    return _ALPHA_GRID[np.where(finite, idx, 0)]


def fit_aggd(samples: np.ndarray):
    """Vectorized AGGD fit over the last axis.

    samples: [..., N] arrays of MSCN products. Returns (alpha, beta_l,
    beta_r) each shaped [...]. The symmetric-GGD fit is the special case of
    reading only alpha and averaging the betas.
    """
    neg = samples < 0
    pos = samples > 0
    # RMS over each side; an empty side is NaN (the classic formulation's
    # mean-of-empty), which routes the block to the degenerate alpha below
    # and a NaN beta for that side — later pooled out by nanmean/nancov
    n_neg = neg.sum(axis=-1)
    n_pos = pos.sum(axis=-1)
    left_var = np.where(neg, samples, 0.0) ** 2
    right_var = np.where(pos, samples, 0.0) ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_l = np.sqrt(left_var.sum(axis=-1) / np.where(n_neg > 0, n_neg, np.nan))
        sigma_r = np.sqrt(right_var.sum(axis=-1) / np.where(n_pos > 0, n_pos, np.nan))
        skew = np.where(sigma_r != 0, sigma_l / sigma_r, np.inf)
        energy_ratio = np.abs(samples).mean(axis=-1) ** 2 / (samples**2).mean(axis=-1)
        target = (
            energy_ratio * (skew**3 + 1) * (skew + 1) / (skew**2 + 1) ** 2
        )
    alpha = _nearest_alpha(target)
    scale_fix = np.sqrt(_Gamma(1.0 / alpha) / _Gamma(3.0 / alpha))
    return alpha, sigma_l * scale_fix, sigma_r * scale_fix


def _block_features(mscn_blocks: np.ndarray) -> np.ndarray:
    """18 NIQE features per block; mscn_blocks is [n_blocks, bh, bw]."""
    n = mscn_blocks.shape[0]
    flat = mscn_blocks.reshape(n, -1)
    alpha, beta_l, beta_r = fit_aggd(flat)
    cols = [alpha, 0.5 * (beta_l + beta_r)]
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        paired = (mscn_blocks * np.roll(mscn_blocks, (dy, dx), axis=(1, 2))).reshape(n, -1)
        a, bl, br = fit_aggd(paired)
        mean_shift = (br - bl) * (_Gamma(2.0 / a) / _Gamma(1.0 / a))
        cols.extend([a, mean_shift, bl, br])
    return np.stack(cols, axis=1)


def make_gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    """The canonical NIQE 7x7 Gaussian weighting window (sigma 7/6,
    unit-sum) — identical to the one shipped inside the BasicSR
    niqe_pris_params asset; used by scripts/fit_niqe_pris_params.py to make
    NIQE self-sufficient without the official asset."""
    k = cv2.getGaussianKernel(size, sigma)
    w = (k @ k.T).astype(np.float64)
    return w / w.sum()


def _mscn(img: np.ndarray, window: np.ndarray, return_sigma: bool = False):
    mu = cv2.filter2D(img, -1, window, borderType=cv2.BORDER_REPLICATE)
    second = cv2.filter2D(img * img, -1, window, borderType=cv2.BORDER_REPLICATE)
    sigma = np.sqrt(np.abs(second - mu * mu))
    mscn = (img - mu) / (sigma + 1.0)
    return (mscn, sigma) if return_sigma else mscn


def image_multiscale_features(
    img: np.ndarray,
    gaussian_window: np.ndarray,
    block_size_h: int = 96,
    block_size_w: int = 96,
):
    """Per-block 36-dim NIQE features of one gray/Y [0,255] image at scales
    1 and 0.5, plus each block's scale-1 sharpness (mean of the local sigma
    field — the pristine-fit block-selection criterion of the original
    NIQE model-estimation procedure).

    Returns (feats [n_blocks, 36], sharpness [n_blocks]).
    """
    assert img.ndim == 2, "Input image must be a gray/Y image."
    nbh = img.shape[0] // block_size_h
    nbw = img.shape[1] // block_size_w
    img = img[: nbh * block_size_h, : nbw * block_size_w]

    per_scale = []
    sharpness = None
    for level in range(2):
        bh, bw = block_size_h >> level, block_size_w >> level
        mscn, sigma = _mscn(img, gaussian_window, return_sigma=True)
        blocks = (
            mscn[: nbh * bh, : nbw * bw]
            .reshape(nbh, bh, nbw, bw)
            .transpose(2, 0, 1, 3)
            .reshape(nbw * nbh, bh, bw)
        )
        per_scale.append(_block_features(blocks))
        if level == 0:
            sharpness = (
                sigma[: nbh * bh, : nbw * bw]
                .reshape(nbh, bh, nbw, bw)
                .transpose(2, 0, 1, 3)
                .reshape(nbw * nbh, -1)
                .mean(axis=1)
            )
            from ..data.resize import resize_np

            h2, w2 = img.shape[0] // 2, img.shape[1] // 2
            img = resize_np(
                (img / 255.0)[..., None], (h2, w2), mode="matlab", scale=(0.5, 0.5)
            )[..., 0] * 255.0

    return np.concatenate(per_scale, axis=1), sharpness


def fit_pris_params(
    images,
    block_size_h: int = 96,
    block_size_w: int = 96,
    sharpness_threshold: float = 0.75,
):
    """Fit the pristine multivariate Gaussian from a corpus of gray/Y
    [0,255] images (the NIQE model-estimation procedure): per image, keep
    only blocks whose sharpness exceeds ``sharpness_threshold`` x the
    image's max block sharpness, pool the surviving 36-dim features over
    the corpus, and fit (mean, covariance) over NaN-free rows.

    Returns a dict with the exact key layout of the BasicSR
    ``niqe_pris_params.npz`` asset: mu_pris_param [36], cov_pris_param
    [36, 36], gaussian_window [7, 7] — drop-in for ``calculate_niqe``.
    """
    window = make_gaussian_window()
    pooled = []
    for img in images:
        img = np.asarray(img, dtype=np.float32)
        assert img.ndim == 2, "fit_pris_params expects gray/Y images"
        feats, sharp = image_multiscale_features(
            img.round(), window, block_size_h, block_size_w
        )
        if feats.shape[0] == 0:
            continue
        keep = sharp > sharpness_threshold * sharp.max()
        pooled.append(feats[keep])
    if not pooled:
        raise ValueError(
            "no usable blocks: images must be at least "
            f"{block_size_h}x{block_size_w}"
        )
    feats = np.concatenate(pooled, axis=0)
    ok = ~np.isnan(feats).any(axis=1)
    feats = feats[ok]
    if feats.shape[0] < 2:
        raise ValueError("need at least 2 NaN-free pristine blocks to fit a covariance")
    return {
        "mu_pris_param": feats.mean(axis=0),
        "cov_pris_param": np.cov(feats, rowvar=False),
        "gaussian_window": window,
    }


def niqe_core(
    img: np.ndarray,
    mu_pris_param: np.ndarray,
    cov_pris_param: np.ndarray,
    gaussian_window: np.ndarray,
    block_size_h: int = 96,
    block_size_w: int = 96,
) -> float:
    """NIQE distance of one gray/Y image in [0, 255] (float, pre-rounded)."""
    assert img.ndim == 2, "Input image must be a gray/Y image."
    nbh = img.shape[0] // block_size_h
    nbw = img.shape[1] // block_size_w
    img = img[: nbh * block_size_h, : nbw * block_size_w]

    per_scale = []
    for level in range(2):
        bh, bw = block_size_h >> level, block_size_w >> level
        mscn = _mscn(img, gaussian_window)
        # [nbh, bh, nbw, bw] -> [nbw*nbh, bh, bw]; block index order is
        # column-major (w outer) to match the reference feature ordering
        blocks = (
            mscn[: nbh * bh, : nbw * bw]
            .reshape(nbh, bh, nbw, bw)
            .transpose(2, 0, 1, 3)
            .reshape(nbw * nbh, bh, bw)
        )
        per_scale.append(_block_features(blocks))
        if level == 0:
            # MATLAB-convention antialiased bicubic half-scale, as the
            # original NIQE pyramid specifies (reference niqe.py:122)
            from ..data.resize import resize_np

            h2, w2 = img.shape[0] // 2, img.shape[1] // 2
            img = resize_np(
                (img / 255.0)[..., None], (h2, w2), mode="matlab", scale=(0.5, 0.5)
            )[..., 0] * 255.0

    feats = np.concatenate(per_scale, axis=1)  # [n_blocks, 36]
    mu_test = np.nanmean(feats, axis=0)
    cov_test = np.cov(feats[~np.isnan(feats).any(axis=1)], rowvar=False)
    pooled_inv = np.linalg.pinv(0.5 * (cov_pris_param + cov_test))
    d = mu_pris_param - mu_test
    return float(np.sqrt(d @ pooled_inv @ d))


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
    pris = np.load(pris_params_path)

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
    return niqe_core(
        img.round(),
        pris["mu_pris_param"],
        pris["cov_pris_param"],
        pris["gaussian_window"],
    )
