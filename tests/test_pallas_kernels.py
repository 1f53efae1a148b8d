"""Pallas kernel semantics, validated in TPU-interpret mode on CPU.

Real-hardware validation runs in bench/eval on the TPU chip; these tests
pin the kernel math against the XLA reference formulation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _inputs(B=2, H=20, W=24, CIN=64, COUT=48, K=8, kk=3, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.random((B, H, W, CIN), dtype=np.float32)),
        jnp.asarray(rng.random((K, kk, kk, CIN, COUT), dtype=np.float32) * 0.05),
        jnp.asarray(rng.random((B, CIN), dtype=np.float32)),
        jnp.asarray(rng.random((B, COUT), dtype=np.float32)),
        jnp.asarray(rng.random((B, kk, kk), dtype=np.float32)),
        jnp.asarray(rng.random((B, K), dtype=np.float32)),
    )


def test_osconv_fused_matches_reference():
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused

    args = _inputs()
    with pltpu.force_tpu_interpret_mode():
        y = osconv_fused(*args, 1)
    ref = _reference_math(*args, 1)
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4


def test_osconv_fused_nonsquare_odd_sizes():
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused

    args = _inputs(B=1, H=11, W=17, CIN=16, COUT=16, K=4)
    with pltpu.force_tpu_interpret_mode():
        y = osconv_fused(*args, 1)
    ref = _reference_math(*args, 1)
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4


def test_osconv_fused_gradients():
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused

    x, w, ca, fa, sa, ka = _inputs(B=1, H=8, W=10, CIN=16, COUT=16, K=2)

    def loss_fused(x, w):
        return osconv_fused(x, w, ca, fa, sa, ka, 1).sum()

    def loss_ref(x, w):
        return _reference_math(x, w, ca, fa, sa, ka, 1).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_osconv_agg_train_forward_and_gradients():
    """The trainable fused path (Pallas fwd + Pallas bwd: transpose-conv dx
    through the forward kernel, slab-streaming dagg kernel) must match the
    einsum engine's value and gradients at the per-sample-weight level."""
    from savsr_tpu.ops.osconv import osconv_apply_einsum
    from savsr_tpu.ops.pallas.osconv_kernel import osconv_agg_train

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 13, 10, 48), dtype=np.float32))
    agg = jnp.asarray(rng.random((2, 3, 3, 48, 32), dtype=np.float32) * 0.1)
    cot = jnp.asarray(rng.random((2, 13, 10, 32), dtype=np.float32))

    def loss_fused(x, agg):
        return (osconv_agg_train(x, agg, 1) * cot).sum()

    def loss_ref(x, agg):
        return (osconv_apply_einsum(x, agg, 1, 1) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        y = osconv_agg_train(x, agg, 1)
        l1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, agg)
    ref = osconv_apply_einsum(x, agg, 1, 1)
    l2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, agg)
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4
    assert abs(float(l1) - float(l2)) < 1e-2 * max(1.0, abs(float(l2)))
    for a, b in zip(g1, g2):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4 * scale


def test_osconv_agg_train_padding0_gradients():
    """padding=0 drives the transpose-conv dx at pad'=kh-1 (full correlation)
    through the generalized forward kernel."""
    from savsr_tpu.ops.osconv import osconv_apply_einsum
    from savsr_tpu.ops.pallas.osconv_kernel import osconv_agg_train

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1, 10, 12, 16), dtype=np.float32))
    agg = jnp.asarray(rng.random((1, 3, 3, 16, 8), dtype=np.float32) * 0.1)

    def loss_fused(x, agg):
        return osconv_agg_train(x, agg, 0).sum()

    def loss_ref(x, agg):
        return osconv_apply_einsum(x, agg, 1, 0).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1))(x, agg)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, agg)
    for a, b in zip(g1, g2):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4 * scale


def test_osconv_fused_train_all_gradients():
    """osconv_fused_train: gradients through the attention fold (weight bank
    + all four attentions) and the activations match the reference math."""
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused_train

    args = _inputs(B=1, H=9, W=11, CIN=16, COUT=16, K=2, seed=5)

    def loss_fused(*a):
        return osconv_fused_train(*a, 1).sum()

    def loss_ref(*a):
        return _reference_math(*a, 1).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-4 * scale


# ---------------------------------------------------------------------------
# split-tier PAIR carries (chw_conv in_pair/out_pair/res_pair)
# ---------------------------------------------------------------------------


def _conv3_ref(x_nhwc, w_hwio, bias, lrelu=None, residual=None):
    y = jax.lax.conv_general_dilated(
        x_nhwc, w_hwio, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    if lrelu is not None:
        a, b = lrelu
        y = a * y + b * jnp.abs(y)
    if residual is not None:
        y = y + residual
    return y


@pytest.mark.parametrize("c,pc", [(64, 64), (128, 64), (16, 16)])
def test_conv3x3_chw_pair_carry(c, pc):
    """PAIR-carried 3x3 conv (in_pair + out_pair + res_pair) tracks the f32
    conv to split-tier (~2^-14) grade, far beyond bf16, and the pair layout
    round-trips through the kernel epilogue. Multi-chunk inputs (c > pc)
    chain per-chunk calls through the pre_add epilogue, exactly as the
    engine's _split_chunks does."""
    from savsr_tpu.archs.chw_engine import (
        _pack_split_w3, pair_merge, pair_split)
    from savsr_tpu.ops.pallas.chw_conv import (
        chw_to_nhwc, conv3x3_chw_parts, nhwc_to_chw)

    rng = np.random.default_rng(0)
    h, w = 10, 12
    x = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    wt = jnp.asarray(
        rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)

    xp = pair_split(nhwc_to_chw(x), pc)
    rp = pair_split(nhwc_to_chw(res), pc)
    xs = [xp[:, 2 * pc * j : 2 * pc * (j + 1)] for j in range(c // pc)]
    w3s = [_pack_split_w3(wt[:, :, pc * j : pc * (j + 1), :], 1)
           for j in range(c // pc)]
    with pltpu.force_tpu_interpret_mode():
        yp = conv3x3_chw_parts(
            xs, w3s, bias.reshape(c, 1), jnp.ones((c, 1), jnp.float32),
            rp, h=h, w=w, lrelu=(0.6, 0.4),
            in_pairs=[True] * len(xs), out_pair=True, res_pair=True, pc=pc,
        )
    assert yp.shape[1] == 2 * c and yp.dtype == jnp.bfloat16
    y = np.asarray(chw_to_nhwc(pair_merge(yp, pc), h, w))

    ref = np.asarray(_conv3_ref(x, wt, bias, (0.6, 0.4), res))
    scale_mag = np.abs(ref).max()
    err = np.abs(y - ref).max() / scale_mag
    # bf16 1-pass error for comparison
    yb = np.asarray(_conv3_ref(x.astype(jnp.bfloat16),
                               wt.astype(jnp.bfloat16), bias, (0.6, 0.4),
                               res.astype(jnp.bfloat16)), np.float32)
    err_bf16 = np.abs(yb - ref).max() / scale_mag
    assert err < 3e-4, err
    assert err * 8 < err_bf16, (err, err_bf16)


def test_conv1x1_chw_pair_carry():
    from savsr_tpu.archs.chw_engine import (
        _pack_w1_pair, pair_merge, pair_split)
    from savsr_tpu.ops.pallas.chw_conv import (
        chw_to_nhwc, conv1x1_chw, nhwc_to_chw)

    rng = np.random.default_rng(1)
    h, w, ci, co, pc = 9, 11, 96, 32, 32
    x = jnp.asarray(rng.standard_normal((1, h, w, ci)).astype(np.float32))
    wt = jnp.asarray(
        rng.standard_normal((ci, co)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32) * 0.1)

    xp = pair_split(nhwc_to_chw(x), pc)
    w1 = _pack_w1_pair(wt, pc)
    with pltpu.force_tpu_interpret_mode():
        yp = conv1x1_chw(
            xp, w1, bias.reshape(co, 1), jnp.ones((co, 1), jnp.float32),
            None, None, h=h, w=w, lrelu=None,
            in_pair=True, out_pair=True, pc=pc,
        )
    y = np.asarray(chw_to_nhwc(pair_merge(yp, pc), h, w))
    ref = np.asarray(x @ wt + bias)
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 3e-4, err


def test_pair_split_merge_roundtrip():
    from savsr_tpu.archs.chw_engine import pair_merge, pair_split

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 128, 40)).astype(np.float32))
    y = np.asarray(pair_merge(pair_split(x, 64), 64))
    # hi + bf16(x - hi) reconstructs x to ~2^-16 relative
    assert np.abs(y - np.asarray(x)).max() < 2e-4
