"""Numerical parity of the JAX SAVSR against reference-generated goldens.

Goldens are produced once by tools/gen_goldens.py running the reference
PyTorch model (random weights, fixed seeds); see SURVEY.md §4 for the test
strategy. Layouts: goldens are NCHW (torch), converted to NHWC here.

Set RUN_SLOW=1 to also run the full-size 18.9M-param forward (several
minutes of XLA CPU compile time).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.archs.arch_util import Ctx
from savsr_tpu.archs.savsr_arch import (
    SAVSR,
    osconv_apply_module,
    stau_apply,
    window_l1_apply,
)
from savsr_tpu.utils.convert import convert_state_dict

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load_params(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.isfile(path):
        pytest.skip(f"golden {name} not generated")
    return {k: jnp.asarray(v) for k, v in convert_state_dict(dict(np.load(path))).items()}


def _io():
    path = os.path.join(GOLDEN_DIR, "module_io.npz")
    if not os.path.isfile(path):
        pytest.skip("module goldens not generated")
    return np.load(path)


def nchw_to_nhwc(a):
    return a.transpose(0, 2, 3, 1)


def test_osconv_parity():
    params = _load_params("osconv_state.npz")
    io = _io()
    x = jnp.asarray(nchw_to_nhwc(io["osconv_x"]))

    @jax.jit
    def fwd(p, x):
        with jax.default_matmul_precision("float32"):
            return osconv_apply_module(Ctx(p), "", x, (2.7, 1.3), padding=1)

    y = np.asarray(fwd(params, x))
    assert np.abs(y - nchw_to_nhwc(io["osconv_y"])).max() < 1e-5


def test_osconv_impls_agree():
    params = _load_params("osconv_state.npz")
    io = _io()
    x = jnp.asarray(nchw_to_nhwc(io["osconv_x"]))

    @functools.partial(jax.jit, static_argnames=("impl",))
    def fwd(p, x, impl):
        with jax.default_matmul_precision("float32"):
            return osconv_apply_module(Ctx(p), "", x, (2.7, 1.3), padding=1, impl=impl)

    y1 = np.asarray(fwd(params, x, "einsum"))
    for impl in ("grouped", "batchgroup", "taps", "kpatch3"):
        y2 = np.asarray(fwd(params, x, impl))
        assert np.abs(y1 - y2).max() < 1e-5, impl


def test_stau_parity():
    params = _load_params("stau_state.npz")
    io = _io()
    x = jnp.asarray(nchw_to_nhwc(io["stau_x"]))
    st = jnp.asarray(nchw_to_nhwc(io["stau_st"]))

    @jax.jit
    def fwd(p, x, st):
        with jax.default_matmul_precision("float32"):
            return stau_apply(Ctx(p), "", x, (2.5, 1.7), st, 32)

    y = np.asarray(fwd(params, x, st))
    assert np.abs(y - nchw_to_nhwc(io["stau_y"])).max() < 1e-4


def test_window_l1_parity():
    params = _load_params("w1_state.npz")
    io = _io()
    x = jnp.asarray(io["w1_x"].transpose(0, 1, 3, 4, 2))
    h = jnp.asarray(nchw_to_nhwc(io["w1_h"]))

    @jax.jit
    def fwd(p, x, h):
        with jax.default_matmul_precision("float32"):
            return window_l1_apply(Ctx(p), "", x, h, (1.9, 3.1), num_block=2)

    y = np.asarray(fwd(params, x, h))
    assert np.abs(y - nchw_to_nhwc(io["w1_y"])).max() < 1e-5


SMALL_CFG = dict(
    num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
    interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
)


@pytest.mark.parametrize("scale", [(2.0, 2.0), (1.5, 3.5)])
def test_savsr_small_end_to_end_parity(scale):
    params = _load_params("savsr_small_state.npz")
    path = os.path.join(GOLDEN_DIR, "savsr_small_forward.npz")
    io = np.load(path)
    x = jnp.asarray(io["x"].transpose(0, 1, 3, 4, 2))
    model = SAVSR(**SMALL_CFG)

    @functools.partial(jax.jit, static_argnames=("scale",))
    def fwd(p, x, scale):
        return model.apply(p, x, scale)[0]

    y = np.asarray(fwd(params, x, scale))
    ref = nchw_to_nhwc(io[f"y_{scale[0]}_{scale[1]}"])
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() < 5e-6


@pytest.mark.parametrize("conv_engine", ["xla", "chw"])
def test_savsr_stau_statics_exact(conv_engine):
    """Eval with precomputed frame-invariant STAU coordinate-head statics
    (SAVSR.stau_statics) must equal the inline head EXACTLY — same ops,
    same dtype, just hoisted out of the per-frame path."""
    params = _load_params("savsr_small_state.npz")
    io = np.load(os.path.join(GOLDEN_DIR, "savsr_small_forward.npz"))
    x = jnp.asarray(io["x"].transpose(0, 1, 3, 4, 2))
    scale = (2.0, 2.0)
    model = SAVSR(**SMALL_CFG, conv_engine=conv_engine)

    statics = jax.jit(
        model.stau_statics, static_argnames=("lq_hw", "scale", "dtype")
    )(params, lq_hw=(x.shape[2], x.shape[3]), scale=scale, dtype=x.dtype)
    base_keys = {"offset", "st_offset", "routing"}
    assert set(statics) == (
        base_keys | ({"pix", "j0", "g0"} if conv_engine == "chw" else set())
    )

    @functools.partial(jax.jit, static_argnames=("scale", "use"))
    def fwd(p, x, scale, st, use):
        return model.apply(p, x, scale,
                           stau_statics=st if use else None)[0]

    y_inline = np.asarray(fwd(params, x, scale, statics, False))
    y_statics = np.asarray(fwd(params, x, scale, statics, True))
    assert np.array_equal(y_inline, y_statics)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="slow: full-size model")
@pytest.mark.parametrize("scale", [(2.0, 2.0), (4.0, 4.0), (1.5, 3.5), (3.05, 3.05)])
def test_savsr_full_parity(scale):
    params = _load_params("savsr_state_dict.npz")
    io = np.load(os.path.join(GOLDEN_DIR, "savsr_forward.npz"))
    x = jnp.asarray(io["x"].transpose(0, 1, 3, 4, 2))
    model = SAVSR()

    @functools.partial(jax.jit, static_argnames=("scale",))
    def fwd(p, x, scale):
        return model.apply(p, x, scale)[0]

    y = np.asarray(fwd(params, x, scale))
    ref = nchw_to_nhwc(io[f"y_{scale[0]}_{scale[1]}"])
    assert y.shape == ref.shape
    assert np.abs(y - ref).max() < 5e-6


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="slow: full-size model")
@pytest.mark.parametrize("key,scale", [
    ("y", (4.0, 4.0)),
    ("y_1.5_3.5", (1.5, 3.5)),
    ("y_3.05_3.05", (3.05, 3.05)),
])
def test_savsr_full_parity_realsize(key, scale):
    """Full-size model at a realistic eval size (45x80 input). On the real
    TPU chip these measured 147.7 / 121.0 / 125.5 dB deviation PSNR vs the
    torch reference — far beyond the 0.05 dB gate."""
    params = _load_params("savsr_state_dict.npz")
    path = os.path.join(GOLDEN_DIR, "savsr_realsize_forward.npz")
    if not os.path.isfile(path):
        pytest.skip("realsize golden not generated")
    g = np.load(path)
    if key not in g.files:
        pytest.skip(f"{key} golden not generated")
    x = jnp.asarray(g["x"].transpose(0, 1, 3, 4, 2))
    ref = nchw_to_nhwc(g[key]).astype(np.float64)
    model = SAVSR()
    y = np.asarray(
        jax.jit(lambda p, x: model.apply(p, x, scale)[0])(params, x)
    ).astype(np.float64)
    mse = ((y - ref) ** 2).mean()
    deviation_psnr = 10 * np.log10(1.0 / mse)
    assert deviation_psnr > 100, deviation_psnr  # ~1e-5 worst-case pixel error


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="slow: full-size model")
@pytest.mark.parametrize("key,scale", [
    ("y", (4.0, 4.0)),
    ("y_1.5_3.5", (1.5, 3.5)),
])
def test_savsr_full_parity_realsize_chw_engine(key, scale):
    """Full-size model on the CHW Pallas serving engine, f32, vs the torch
    reference golden (the bf16 serving config's engine-vs-engine deviation
    is measured separately in PERF.md: 62.4 dB)."""
    params = _load_params("savsr_state_dict.npz")
    path = os.path.join(GOLDEN_DIR, "savsr_realsize_forward.npz")
    if not os.path.isfile(path):
        pytest.skip("realsize golden not generated")
    g = np.load(path)
    if key not in g.files:
        pytest.skip(f"{key} golden not generated")
    x = jnp.asarray(g["x"].transpose(0, 1, 3, 4, 2))
    ref = nchw_to_nhwc(g[key]).astype(np.float64)
    model = SAVSR(conv_engine="chw")
    y = np.asarray(
        jax.jit(lambda p, x: model.apply(p, x, scale)[0])(params, x)
    ).astype(np.float64)
    mse = ((y - ref) ** 2).mean()
    deviation_psnr = 10 * np.log10(1.0 / mse)
    assert deviation_psnr > 100, deviation_psnr


def test_savsr_init_matches_golden_structure():
    """A freshly initialized param dict has exactly the reference's keys and
    shapes (checkpoint-format parity)."""
    golden = convert_state_dict(
        dict(np.load(os.path.join(GOLDEN_DIR, "savsr_small_state.npz")))
    )
    model = SAVSR(**SMALL_CFG)
    params = model.init(jax.random.PRNGKey(0))
    assert set(params.keys()) == set(golden.keys())
    for k in golden:
        assert tuple(params[k].shape) == tuple(golden[k].shape), k


@pytest.mark.parametrize("scale", [(2.0, 2.0), (1.5, 3.5)])
def test_train_vs_eval_engines_equivalent(scale):
    """The eval-gated engines (split-Cin OSConv parts, block-gather STAU
    sampling) must produce the train-path outputs exactly (savsr_arch.py
    engine gates); pins engine gating so a future gate can't silently fork
    semantics. BN mode is held fixed (eval) — only the engines differ."""
    params = _load_params("savsr_small_state.npz")
    path = os.path.join(GOLDEN_DIR, "savsr_small_forward.npz")
    io = np.load(path)
    x = jnp.asarray(io["x"].transpose(0, 1, 3, 4, 2))
    m_eval = SAVSR(**SMALL_CFG, engines="eval")
    m_train = SAVSR(**SMALL_CFG, engines="train")

    @functools.partial(jax.jit, static_argnames=("mdl", "scale"))
    def fwd(mdl, p, x, scale):
        return mdl.apply(p, x, scale)[0]

    y_eval = np.asarray(fwd(m_eval, params, x, scale))
    y_train = np.asarray(fwd(m_train, params, x, scale))
    assert np.abs(y_eval - y_train).max() < 1e-5
