"""Unit tests for the generic arch_util building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.archs.arch_util import (
    Ctx,
    InitCtx,
    flow_warp,
    interpolate_bilinear,
    make_coord,
    pixel_shuffle,
    pixel_unshuffle,
    residual_block_no_bn_apply,
    residual_block_no_bn_init,
    resize_flow,
    upsample_pixelshuffle_apply,
    upsample_pixelshuffle_init,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.random((2, 4, 6, 16), dtype=np.float32)
    mine = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    ref = F.pixel_shuffle(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
    assert np.abs(mine - ref.transpose(0, 2, 3, 1)).max() < 1e-6


def test_pixel_unshuffle_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 8, 8, 4), dtype=np.float32))
    y = pixel_unshuffle(x, 2)
    assert y.shape == (1, 4, 4, 16)
    np.testing.assert_allclose(np.asarray(pixel_shuffle(y, 2)), np.asarray(x))


def test_interpolate_bilinear_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.random((1, 12, 15, 3), dtype=np.float32)
    for ac in (False, True):
        mine = np.asarray(
            interpolate_bilinear(jnp.asarray(x), (30, 37), align_corners=ac)
        )
        ref = F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(30, 37),
            mode="bilinear", align_corners=ac,
        ).numpy().transpose(0, 2, 3, 1)
        assert np.abs(mine - ref).max() < 1e-5, ac


def test_flow_warp_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.random((1, 10, 12, 4), dtype=np.float32)
    flow = (rng.random((1, 10, 12, 2), dtype=np.float32) - 0.5) * 3

    mine = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    # torch reference: build the same base grid + flow, grid_sample
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    gy, gx = torch.meshgrid(torch.arange(10), torch.arange(12), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + torch.from_numpy(flow)
    grid[..., 0] = 2.0 * grid[..., 0] / 11 - 1.0
    grid[..., 1] = 2.0 * grid[..., 1] / 9 - 1.0
    ref = F.grid_sample(
        xt, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    ).numpy().transpose(0, 2, 3, 1)
    assert np.abs(mine - ref).max() < 1e-5


def test_resize_flow_scales_magnitudes():
    flow = jnp.ones((1, 8, 8, 2), jnp.float32)
    out = resize_flow(flow, "shape", (16, 24))
    assert out.shape == (1, 16, 24, 2)
    np.testing.assert_allclose(np.asarray(out[..., 0]).mean(), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., 1]).mean(), 2.0, rtol=1e-5)


def test_make_coord():
    c = make_coord((4, 4), flatten=False)
    assert c.shape == (4, 4, 2)
    np.testing.assert_allclose(np.asarray(c[0, 0]), [-0.75, -0.75], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c[-1, -1]), [0.75, 0.75], rtol=1e-6)


def test_residual_block_no_bn_and_upsampler():
    ic = InitCtx(jax.random.PRNGKey(0))
    residual_block_no_bn_init(ic, "rb.", 16)
    upsample_pixelshuffle_init(ic, "up.", 4, 16)
    ctx = Ctx(ic.params)
    x = jnp.ones((1, 6, 6, 16), jnp.float32)
    y = residual_block_no_bn_apply(ctx, "rb.", x)
    assert y.shape == x.shape
    z = upsample_pixelshuffle_apply(ctx, "up.", x, 4)
    assert z.shape == (1, 24, 24, 16)


def test_dynamic_conv2d_runs():
    from savsr_tpu.archs.arch_util import dynamic_conv2d_apply, dynamic_conv2d_init

    ic = InitCtx(jax.random.PRNGKey(1))
    dynamic_conv2d_init(ic, "dc.", 16, 24)
    ctx = Ctx(ic.params)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 9, 16), dtype=np.float32))
    y = dynamic_conv2d_apply(ctx, "dc.", x)
    assert y.shape == (2, 8, 9, 24)
    assert np.isfinite(np.asarray(y)).all()
