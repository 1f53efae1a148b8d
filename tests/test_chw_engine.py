"""Parity of the flat-padded CHW Pallas serving engine (archs/chw_engine.py)
against the XLA NHWC engine and the reference goldens.

Runs in Pallas interpret mode on CPU (the kernels detect the backend); the
full-size on-chip validation is tests/test_arch_parity.py RUN_SLOW + bench.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.archs.arch_util import Ctx
from savsr_tpu.archs.savsr_arch import window_l1_apply
from savsr_tpu.ops.pallas.chw_conv import (
    chw_to_nhwc,
    conv1x1_chw,
    conv3x3_chw,
    nhwc_to_chw,
    pack_w3,
)
from savsr_tpu.utils.convert import convert_state_dict

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _lax_conv(x, w, padding):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_layout_round_trip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 13, 37, 5), dtype=np.float32))
    y = chw_to_nhwc(nhwc_to_chw(x), 13, 37)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


@pytest.mark.parametrize("h,w,cin,cout", [(12, 20, 8, 16), (9, 33, 64, 64)])
def test_conv3x3_chw_matches_xla(h, w, cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin), dtype=np.float32))
    wt = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))
    res = jnp.asarray(rng.standard_normal((2, h, w, cout), dtype=np.float32))

    ref = _lax_conv(x, wt, 1) + bias
    ref = 0.6 * ref + 0.4 * jnp.abs(ref)  # leaky_relu(0.2)
    ref = ref + res

    y = conv3x3_chw(
        nhwc_to_chw(x), pack_w3(wt), bias.reshape(-1, 1),
        jnp.ones((cout, 1), jnp.float32), None, nhwc_to_chw(res),
        h=h, w=w, lrelu=(0.6, 0.4),
    )
    got = chw_to_nhwc(y, h, w)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5


def test_conv3x3_chw_per_sample_weights_and_pre_add():
    rng = np.random.default_rng(2)
    b, h, w, cin, cout = 3, 10, 17, 16, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
    wt = jnp.asarray(0.1 * rng.standard_normal((b, 3, 3, cin, cout), dtype=np.float32))
    pre = jnp.asarray(rng.standard_normal((b, h, w, cout), dtype=np.float32))

    ref = jnp.stack([_lax_conv(x[i : i + 1], wt[i], 1)[0] for i in range(b)])
    ref = ref + pre
    ref = 0.6 * ref + 0.4 * jnp.abs(ref)

    w3 = jnp.stack([pack_w3(wt[i]) for i in range(b)])
    y = conv3x3_chw(
        nhwc_to_chw(x), w3, jnp.zeros((cout, 1), jnp.float32),
        jnp.ones((cout, 1), jnp.float32), nhwc_to_chw(pre), None,
        h=h, w=w, lrelu=(0.6, 0.4),
    )
    got = chw_to_nhwc(y, h, w)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5


def test_conv1x1_chw_matches_xla():
    rng = np.random.default_rng(3)
    b, h, w, cin, cout = 2, 11, 23, 24, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, cin), dtype=np.float32))
    wt = jnp.asarray(0.1 * rng.standard_normal((1, 1, cin, cout), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((cout,), dtype=np.float32))

    ref = _lax_conv(x, wt, 0) + bias
    y = conv1x1_chw(
        nhwc_to_chw(x), wt[0, 0].T, bias.reshape(-1, 1),
        jnp.ones((cout, 1), jnp.float32), None, None, h=h, w=w, lrelu=None,
    )
    got = chw_to_nhwc(y, h, w)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 1e-5


def _load_params(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.isfile(path):
        pytest.skip(f"golden {name} not generated")
    return {k: jnp.asarray(v) for k, v in convert_state_dict(dict(np.load(path))).items()}


def test_window_l1_chw_engine_parity():
    """CHW engine vs XLA engine AND vs the reference torch golden."""
    params = _load_params("w1_state.npz")
    path = os.path.join(GOLDEN_DIR, "module_io.npz")
    if not os.path.isfile(path):
        pytest.skip("module goldens not generated")
    io = np.load(path)
    x = jnp.asarray(io["w1_x"].transpose(0, 1, 3, 4, 2))
    h = jnp.asarray(io["w1_h"].transpose(0, 2, 3, 1))

    @jax.jit
    def fwd_chw(p, x, h):
        with jax.default_matmul_precision("float32"):
            return window_l1_apply(
                Ctx(p, conv_engine="chw"), "", x, h, (1.9, 3.1), num_block=2
            )

    @jax.jit
    def fwd_xla(p, x, h):
        with jax.default_matmul_precision("float32"):
            return window_l1_apply(Ctx(p), "", x, h, (1.9, 3.1), num_block=2)

    y_chw = np.asarray(fwd_chw(params, x, h))
    y_xla = np.asarray(fwd_xla(params, x, h))
    ref = io["w1_y"].transpose(0, 2, 3, 1)
    assert np.abs(y_chw - y_xla).max() < 1e-5
    assert np.abs(y_chw - ref).max() < 2e-5


def test_stau_fused_parity():
    """Fused STAU sampler kernel (hat-matmul bilinear + experts + fusion)
    vs the XLA engine AND the reference torch golden."""
    from savsr_tpu.archs.savsr_arch import stau_apply

    params = _load_params("stau_state.npz")
    path = os.path.join(GOLDEN_DIR, "module_io.npz")
    if not os.path.isfile(path):
        pytest.skip("module goldens not generated")
    io = np.load(path)
    x = jnp.asarray(io["stau_x"].transpose(0, 2, 3, 1))
    st = jnp.asarray(io["stau_st"].transpose(0, 2, 3, 1))

    @jax.jit
    def fwd(p, x, st):
        with jax.default_matmul_precision("float32"):
            return stau_apply(Ctx(p, conv_engine="chw"), "", x, (2.5, 1.7), st, 32)

    @jax.jit
    def fwd_xla(p, x, st):
        with jax.default_matmul_precision("float32"):
            return stau_apply(Ctx(p), "", x, (2.5, 1.7), st, 32)

    y = np.asarray(fwd(params, x, st))
    y_xla = np.asarray(fwd_xla(params, x, st))
    ref = io["stau_y"].transpose(0, 2, 3, 1)
    assert np.abs(y - y_xla).max() < 2e-5
    assert np.abs(y - ref).max() < 1e-4


def test_savsr_small_chw_end_to_end_parity():
    """Full small model on the CHW engine (window_l1/l2 + trunk) vs the
    reference torch golden."""
    import functools

    from savsr_tpu.archs.savsr_arch import SAVSR

    params = _load_params("savsr_small_state.npz")
    path = os.path.join(GOLDEN_DIR, "savsr_small_forward.npz")
    if not os.path.isfile(path):
        pytest.skip("golden not generated")
    io = np.load(path)
    x = jnp.asarray(io["x"].transpose(0, 1, 3, 4, 2))
    model = SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1,
        n_resblocks=2, conv_engine="chw",
    )

    @functools.partial(jax.jit, static_argnames=("scale",))
    def fwd(p, x, scale):
        return model.apply(p, x, scale)[0]

    y = np.asarray(fwd(params, x, (2.0, 2.0)))
    ref = io["y_2.0_2.0"].transpose(0, 2, 3, 1)
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() < 1e-5
