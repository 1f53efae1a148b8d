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

pytestmark = pytest.mark.heavy  # bucketed eval-graph compiles: heavy tier

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


def test_plan_buckets_groups_and_fits():
    """plan_buckets must (a) give every item a bucket that dominates its
    requirements, (b) split a bimodal sweep instead of one global bucket,
    and (c) never beat the single-bucket cost by padding."""
    from savsr_tpu.archs.bucketed import (
        _HR_COST,
        _LR_COST,
        bucket_requirements,
        plan_buckets,
    )

    # Vid4-like: near-constant LR shape, HR spans x1.2 to x4; frame counts
    # at real sweep magnitudes (the split must amortize its extra compile)
    small = [(120, 160, (1.2, 1.2), 500), (124, 168, (1.5, 1.5), 500)]
    large = [(120, 160, (4.0, 4.0), 500), (132, 176, (3.5, 4.0), 500)]
    items = small + large
    plan = plan_buckets(items, max_buckets=3, compile_cost=10.0)

    assert len(plan) == len(items)
    for h0, w0, s, _ in items:
        key = (h0, w0, (float(s[0]), float(s[1])))
        (lh, lw), (hh, hw) = plan[key]
        rl_h, rl_w, rh_h, rh_w = bucket_requirements(h0, w0, s)
        assert lh >= rl_h and lw >= rl_w and hh >= rh_h and hw >= rh_w

    buckets = set(plan.values())
    assert len(buckets) >= 2  # x1.2 and x4 must not share an HR canvas

    def runtime(plan):
        tot = 0.0
        for h0, w0, s, n in items:
            (lh, lw), (hh, hw) = plan[(h0, w0, (float(s[0]), float(s[1])))]
            tot += n * (_LR_COST * lh * lw + _HR_COST * hh * hw)
        return tot

    single = plan_buckets(items, max_buckets=1, compile_cost=10.0)
    assert runtime(plan) < runtime(single)


def test_plan_buckets_compile_cost_collapses():
    """A huge per-bucket compile cost must collapse the plan to one bucket."""
    from savsr_tpu.archs.bucketed import plan_buckets

    items = [(64, 64, (1.5, 1.5), 2), (64, 64, (4.0, 4.0), 2)]
    plan = plan_buckets(items, max_buckets=3, compile_cost=1e9)
    assert len(set(plan.values())) == 1


def test_bucketed_single_program(setup):
    """All scales/shapes in the bucket share ONE compiled program."""
    model, params, fwd_bucketed = setup
    before = fwd_bucketed._cache_size()
    for (h0, w0), scale in CASES:
        ops = make_bucket_operands(h0, w0, scale, LR_BUCKET, HR_BUCKET)
        x = np.zeros((1, 7, h0, w0, 3), np.float32)
        fwd_bucketed(params, jnp.asarray(pad_clip_to_bucket(x, LR_BUCKET)), ops)
    assert fwd_bucketed._cache_size() <= max(before, 1)
