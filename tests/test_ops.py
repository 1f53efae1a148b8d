"""Native-op equivalents: deformable conv, fused_act, upfirdn2d, osconv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, dcn must reduce to a standard conv."""
    from jax import lax

    from savsr_tpu.ops.dcn import deform_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 10, 12, 8), dtype=np.float32))
    w = jnp.asarray(rng.random((3, 3, 8, 16), dtype=np.float32))
    b_, h, w_, _ = x.shape
    offset = jnp.zeros((2, 10, 12, 2 * 9 * 2), jnp.float32)  # dg=2
    mask = jnp.ones((2, 10, 12, 2 * 9), jnp.float32)

    y = deform_conv2d(x, offset, w, stride=1, padding=1, mask=mask, deform_groups=2)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4


def test_deform_conv_integer_shift():
    """An integer offset of (0, +1) on every tap equals convolving the
    x-shifted image."""
    from jax import lax

    from savsr_tpu.ops.dcn import deform_conv2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 8, 9, 4), dtype=np.float32))
    w = jnp.asarray(rng.random((3, 3, 4, 6), dtype=np.float32))
    offset = np.zeros((1, 8, 9, 1, 9, 2), np.float32)
    offset[..., 1] = 1.0  # dx = +1
    offset = jnp.asarray(offset.reshape(1, 8, 9, -1))

    y = deform_conv2d(x, offset, w, stride=1, padding=1, deform_groups=1)
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    ref = lax.conv_general_dilated(
        x_shift, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # interior matches exactly; borders differ (zeros vs shifted pad)
    err = np.abs(np.asarray(y) - np.asarray(ref))[:, 1:-1, 1:-2, :]
    assert err.max() < 1e-4


def test_dcnv2pack_runs_and_grads():
    from savsr_tpu.ops.dcn import DCNv2Pack

    pack = DCNv2Pack(8, 8, 3, deform_groups=2)
    params = pack.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 8), dtype=np.float32))

    def loss(params):
        return pack.apply(params, x, x).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    # zero-init offsets -> equals plain conv with the main weight
    from jax import lax

    y = pack.apply(params, x, x)
    ref = (
        lax.conv_general_dilated(
            x, params["weight"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + params["bias"]
        # sigmoid(0) = 0.5 mask
    ) * 0.5 + params["bias"] * 0.5
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4


def test_fused_leaky_relu():
    from savsr_tpu.ops.fused_act import FusedLeakyReLU, fused_leaky_relu

    x = jnp.asarray([[-1.0, 2.0]])
    b = jnp.asarray([0.5, -0.5])
    y = np.asarray(fused_leaky_relu(x, b))
    expected = np.asarray([[-0.5 * 0.2, 1.5]]) * np.sqrt(2.0)
    np.testing.assert_allclose(y, expected, rtol=1e-6)

    mod = FusedLeakyReLU(4)
    p = mod.init()
    out = mod.apply(p, jnp.ones((2, 3, 3, 4)))
    np.testing.assert_allclose(np.asarray(out), np.sqrt(2.0), rtol=1e-6)


def _upfirdn2d_numpy(x, k, up, down, pad):
    """Direct dense reference implementation (zero-stuff, pad, convolve, stride)."""
    b, h, w, c = x.shape
    kh, kw = k.shape
    up_h = np.zeros((b, h * up, w * up, c), x.dtype)
    up_h[:, ::up, ::up, :] = x
    p0, p1 = pad
    padded = np.pad(up_h, ((0, 0), (p0, p1), (p0, p1), (0, 0)))
    kf = k[::-1, ::-1]
    H = padded.shape[1] - kh + 1
    W = padded.shape[2] - kw + 1
    out = np.zeros((b, H, W, c), x.dtype)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[:, i : i + H, j : j + W, :]
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1))])
def test_upfirdn2d_matches_dense_reference(up, down, pad):
    from savsr_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.default_rng(3)
    x = rng.random((2, 6, 7, 3), dtype=np.float32)
    k = rng.random((3, 3)).astype(np.float32)
    y = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    ref = _upfirdn2d_numpy(x, k, up, down, pad)
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() < 1e-5


def test_osconv_patches():
    from savsr_tpu.ops.osconv import extract_patches

    x = jnp.asarray(np.arange(2 * 4 * 5 * 3, dtype=np.float32).reshape(2, 4, 5, 3))
    p = extract_patches(x, (3, 3), stride=1, padding=1)
    assert p.shape == (2, 4, 5, 9, 3)
    # center tap of patch == original pixel
    np.testing.assert_array_equal(np.asarray(p[:, :, :, 4, :]), np.asarray(x))


@pytest.mark.parametrize(
    "impl", ["grouped", "batchgroup", "taps", "kpatch3", "pallas_train"]
)
@pytest.mark.parametrize("stride,padding", [(1, 1), (1, 0), (2, 1)])
def test_osconv_engine_agreement(impl, stride, padding):
    """Every OSConv execution engine computes the same per-sample conv."""
    from savsr_tpu.ops.osconv import osconv_apply

    if impl == "pallas_train" and stride != 1:
        pytest.skip("fused kernel is stride-1 (all SAVSR instances)")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 9, 11, 6), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 5), dtype=np.float32))
    ref = np.asarray(osconv_apply(x, w, stride, padding, impl="einsum"))
    out = np.asarray(osconv_apply(x, w, stride, padding, impl=impl))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
