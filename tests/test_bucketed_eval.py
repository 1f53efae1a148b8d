"""Bucketed any-scale eval (archs/bucketed.py): one compiled program must
reproduce the exact per-(shape, scale) forward for every shape/scale inside
the bucket, and must NOT retrace across scales."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.archs.bucketed import (
    make_bucket_operands,
    pad_clip_to_bucket,
    savsr_apply_bucketed,
)
from savsr_tpu.archs.savsr_arch import SAVSR, get_hw

CFG = dict(
    num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
    interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
)

LR_BUCKET = (16, 20)
HR_BUCKET = (56, 72)

CASES = [
    ((12, 16), (2.0, 2.0)),
    ((11, 14), (3.05, 3.05)),   # odd size: exercises the reflect evening
    ((12, 16), (1.5, 3.5)),     # asymmetric
    ((14, 18), (4.0, 4.0)),
]


@pytest.fixture(scope="module")
def setup():
    model = SAVSR(conv_engine="chw", **CFG)
    params = model.init(jax.random.PRNGKey(0))
    fwd_bucketed = jax.jit(
        lambda p, x, ops: savsr_apply_bucketed(p, x, ops, model.cfg)
    )
    return model, params, fwd_bucketed


@pytest.mark.parametrize("hw,scale", CASES)
def test_bucketed_matches_exact(setup, hw, scale):
    model, params, fwd_bucketed = setup
    h0, w0 = hw
    H, W = get_hw(h0, w0, scale)
    rng = np.random.default_rng(hash((h0, w0)) % 2**31)
    x = rng.random((1, 7, h0, w0, 3), np.float32)

    y_exact = np.asarray(
        jax.jit(lambda p, x: model.apply(p, x, scale)[0])(params, jnp.asarray(x))
    )

    ops = make_bucket_operands(h0, w0, scale, LR_BUCKET, HR_BUCKET)
    canvas = jnp.asarray(pad_clip_to_bucket(x, LR_BUCKET))
    y_b = np.asarray(fwd_bucketed(params, canvas, ops))[:, :H, :W]

    assert y_b.shape == y_exact.shape
    # small f32 reduction-order noise is expected: the GAP sums run over
    # the (longer, zero-padded) canvas, shifting the attention inputs by
    # ulps; 5e-5 worst-pixel on O(1) outputs is >80 dB deviation PSNR
    assert np.abs(y_b - y_exact).max() < 5e-5


@pytest.mark.parametrize("hw,scale", [((12, 16), (2.0, 2.0)),
                                      ((11, 14), (3.05, 3.05))])
def test_bucketed_bucket_invariant(setup, hw, scale):
    """The output must not depend on the bucket chosen (a slack-dependent
    GAP/attention normalization bug shows up exactly here): run the same
    clip through the tight bucket and a much roomier one, with amplified
    inputs so the attention paths carry real signal."""
    model, params, fwd_bucketed = setup
    h0, w0 = hw
    H, W = get_hw(h0, w0, scale)
    rng = np.random.default_rng(7)
    # amplitude 4: random-init features are otherwise too small to excite
    # the RCAB / OSConv attention sigmoids
    x = (rng.random((1, 7, h0, w0, 3), np.float32) * 8.0 - 4.0)

    y_exact = np.asarray(
        jax.jit(lambda p, x: model.apply(p, x, scale)[0])(params, jnp.asarray(x))
    )

    big_lr = (LR_BUCKET[0] * 2, LR_BUCKET[1] * 2)       # 4x area slack
    big_hr = (HR_BUCKET[0] * 2, HR_BUCKET[1] * 2)
    outs = []
    for lr_b, hr_b in [(LR_BUCKET, HR_BUCKET), (big_lr, big_hr)]:
        ops = make_bucket_operands(h0, w0, scale, lr_b, hr_b)
        canvas = jnp.asarray(pad_clip_to_bucket(x, lr_b))
        outs.append(np.asarray(fwd_bucketed(params, canvas, ops))[:, :H, :W])

    scale_mag = max(np.abs(y_exact).max(), 1.0)
    for y_b in outs:
        assert np.abs(y_b - y_exact).max() / scale_mag < 5e-5
    assert np.abs(outs[0] - outs[1]).max() / scale_mag < 5e-5


def test_bucketed_single_program(setup):
    """All scales/shapes in the bucket share ONE compiled program."""
    model, params, fwd_bucketed = setup
    before = fwd_bucketed._cache_size()
    for (h0, w0), scale in CASES:
        ops = make_bucket_operands(h0, w0, scale, LR_BUCKET, HR_BUCKET)
        x = np.zeros((1, 7, h0, w0, 3), np.float32)
        fwd_bucketed(params, jnp.asarray(pad_clip_to_bucket(x, LR_BUCKET)), ops)
    assert fwd_bucketed._cache_size() <= max(before, 1)
