"""PSNR/SSIM parity vs goldens from the reference implementation."""

import os

import numpy as np
import pytest

from savsr_tpu.metrics import calculate_psnr, calculate_ssim
from savsr_tpu.metrics.psnr_ssim import calculate_psnr_jnp, calculate_ssim_jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "metrics.npz")


def _pair():
    rng = np.random.default_rng(7)
    img = (rng.random((96, 128, 3)) * 255).round().astype(np.uint8).astype(np.float64)
    noise = rng.normal(0, 8, img.shape)
    img2 = np.clip(img + noise, 0, 255).round().astype(np.float64)
    return img, img2


def test_psnr_ssim_golden():
    if not os.path.isfile(GOLDEN):
        pytest.skip("goldens not generated")
    data = np.load(GOLDEN)
    img, img2 = data["img"], data["img2"]
    assert abs(calculate_psnr(img, img2, crop_border=0) - data["psnr"]) < 1e-8
    assert abs(calculate_psnr(img, img2, crop_border=0, test_y_channel=True) - data["psnr_y"]) < 1e-6
    assert abs(calculate_ssim(img, img2, crop_border=0) - data["ssim"]) < 1e-7
    assert abs(calculate_ssim(img, img2, crop_border=0, test_y_channel=True) - data["ssim_y"]) < 1e-7
    assert abs(calculate_psnr(img, img2, crop_border=4) - data["psnr_cb4"]) < 1e-8


def test_psnr_identical_is_inf():
    img, _ = _pair()
    assert calculate_psnr(img, img, crop_border=0) == float("inf")


def test_ssim_identical_is_one():
    img, _ = _pair()
    assert abs(calculate_ssim(img, img, crop_border=0) - 1.0) < 1e-9


def test_jnp_variants_close_to_numpy():
    import jax.numpy as jnp

    img, img2 = _pair()
    # numpy canonical path works on BGR uint8-scale; jnp on RGB [0,1]
    a = jnp.asarray(img[None, ..., ::-1] / 255.0, dtype=jnp.float32)
    b = jnp.asarray(img2[None, ..., ::-1] / 255.0, dtype=jnp.float32)
    psnr_dev = float(calculate_psnr_jnp(a, b, test_y_channel=True)[0])
    psnr_host = calculate_psnr(img, img2, crop_border=0, test_y_channel=True)
    assert abs(psnr_dev - psnr_host) < 0.05
    ssim_dev = float(calculate_ssim_jnp(a, b, test_y_channel=True)[0])
    ssim_host = calculate_ssim(img, img2, crop_border=0, test_y_channel=True)
    assert abs(ssim_dev - ssim_host) < 1e-3


def test_count_flops_reports_model_cost():
    """XLA cost analysis of the compiled forward (the fvcore FLOPs-hook
    counterpart, reference savsr_arch.py:748-753): positive, and scales
    ~4x when the input area quadruples."""
    import jax

    from savsr_tpu.archs.savsr_arch import SAVSR
    from savsr_tpu.metrics.runtime import count_flops

    m = SAVSR(num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
              interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1,
              n_resblocks=2)
    p = m.init(jax.random.PRNGKey(0))
    small = count_flops(m, p, scale=(2.0, 2.0), input_shape=(1, 7, 16, 16, 3))
    big = count_flops(m, p, scale=(2.0, 2.0), input_shape=(1, 7, 32, 32, 3))
    assert small["gflops"] > 0
    ratio = big["gflops"] / small["gflops"]
    assert 3.0 < ratio < 5.5, ratio
