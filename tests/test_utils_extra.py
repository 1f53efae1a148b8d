"""Tests for flow IO, image processing, and differentiable JPEG utils."""

import numpy as np
import pytest


def test_flo_roundtrip(tmp_path):
    from savsr_tpu.utils.flow_util import flowread, flowwrite

    rng = np.random.default_rng(0)
    flow = (rng.random((12, 16, 2)).astype(np.float32) - 0.5) * 8
    path = str(tmp_path / "test.flo")
    flowwrite(flow, path)
    back = flowread(path)
    np.testing.assert_allclose(back, flow, rtol=1e-6)


def test_quantize_dequantize_flow():
    from savsr_tpu.utils.flow_util import dequantize_flow, quantize_flow

    rng = np.random.default_rng(1)
    flow = (rng.random((10, 10, 2)).astype(np.float32) - 0.5) * 0.01
    dx, dy = quantize_flow(flow, max_val=0.02, norm=False)
    assert dx.dtype == np.uint8
    back = dequantize_flow(dx, dy, max_val=0.02, denorm=False)
    assert np.abs(back - flow).max() < 0.02 * 2 / 255 + 1e-6


def test_usm_sharp_shapes():
    from savsr_tpu.utils.img_process_util import usm_sharp

    rng = np.random.default_rng(2)
    img = rng.random((32, 40, 3)).astype(np.float32)
    out = usm_sharp(img)
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 1


def test_filter2d_jnp_identity():
    import jax.numpy as jnp

    from savsr_tpu.utils.img_process_util import filter2D_jnp

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((2, 8, 9, 3), dtype=np.float32))
    k = np.zeros((2, 3, 3), np.float32)
    k[:, 1, 1] = 1.0  # identity kernel
    out = filter2D_jnp(img, jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-6)


def test_diffjpeg_quality_ordering():
    import jax
    import jax.numpy as jnp

    from savsr_tpu.utils.diffjpeg import diff_jpeg

    rng = np.random.default_rng(4)
    import cv2

    img = cv2.GaussianBlur((rng.random((32, 32, 3)) * 255).astype(np.uint8), (5, 5), 1)
    img = jnp.asarray(img[None].astype(np.float32) / 255.0)

    out_hi = np.asarray(diff_jpeg(img, quality=95))
    out_lo = np.asarray(diff_jpeg(img, quality=10))
    err_hi = np.abs(out_hi - np.asarray(img)).mean()
    err_lo = np.abs(out_lo - np.asarray(img)).mean()
    assert err_hi < err_lo  # higher quality -> lower reconstruction error
    assert err_hi < 0.05

    # differentiable: grads exist and are finite
    g = jax.grad(lambda x: diff_jpeg(x, quality=50).sum())(img)
    assert np.isfinite(np.asarray(g)).all()


def test_degradation_kernels():
    from savsr_tpu.data.degradations import (
        bivariate_gaussian,
        circular_lowpass_kernel,
        random_mixed_kernels,
    )

    k = bivariate_gaussian(21, 2.0)
    assert k.shape == (21, 21) and abs(k.sum() - 1) < 1e-8
    k2 = random_mixed_kernels(
        ["iso", "aniso", "generalized_iso", "plateau_iso"], [0.25] * 4, 21
    )
    assert k2.shape == (21, 21) and abs(k2.sum() - 1) < 1e-6
    k3 = circular_lowpass_kernel(np.pi / 3, 21)
    assert k3.shape == (21, 21) and abs(k3.sum() - 1) < 1e-6
