"""CI pin for the bf16 SERVING configuration (VERDICT r2 #4).

bench.py serves with bf16 params/activations on the CHW Pallas engine
(fused STAU/STA/tail kernels). The on-chip measurement puts that output at
~58 dB PSNR vs the f32 reference forward (PERF.md); nothing else in CI
would catch a bf16 regression in the fused kernels (e.g. a coordinate
computed in bf16, an f32 accumulation dropped). This test runs the EXACT
serving configuration through the small-model golden weights and pins a
PSNR floor vs the f32/XLA forward — on CPU the kernels run in interpret
mode with the same dtypes, so dtype-handling regressions still fail here;
the real-kernel on-chip check runs under RUN_SLOW.
"""


import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CFG = dict(
    num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
    interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
)

SCALES = [(4.0, 4.0), (1.5, 3.5)]


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


@pytest.fixture(scope="module")
def state():
    path = os.path.join(GOLDEN_DIR, "savsr_small_state.npz")
    if not os.path.isfile(path):
        pytest.skip("savsr_small_state.npz golden not generated")
    from savsr_tpu.utils.convert import convert_state_dict

    return convert_state_dict(dict(np.load(path)))


@pytest.mark.parametrize("scale", SCALES)
def test_bf16_chw_serving_psnr_floor(state, scale):
    from savsr_tpu.archs.savsr_arch import SAVSR

    # structured input (sinusoids + noise): random-init-scale features are
    # too small to excite attention paths; golden weights + structure do
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:24, 0:28]
    base = (0.5 + 0.35 * np.sin(yy / 4.0)[..., None] * np.cos(xx / 5.0)[..., None]
            + 0.15 * rng.random((24, 28, 3)))
    x = np.stack([np.roll(base, i, axis=1) for i in range(7)])[None]
    x = np.clip(x, 0.0, 1.0).astype(np.float32)

    # f32 reference forward (the quality-eval configuration)
    ref_model = SAVSR(conv_engine="xla", matmul_precision="float32", **CFG)
    y_ref = np.asarray(ref_model.apply(state, jnp.asarray(x), scale)[0],
                       dtype=np.float32)

    # the bench serving configuration: bf16 params + input, CHW engine,
    # default matmul precision (bench.py main())
    serve_model = SAVSR(conv_engine="chw", matmul_precision="default", **CFG)
    bf16_params = {
        k: v.astype(jnp.bfloat16) if np.asarray(v).dtype == np.float32 else jnp.asarray(v)
        for k, v in state.items()
    }
    y_bf16 = np.asarray(
        serve_model.apply(bf16_params, jnp.asarray(x, jnp.bfloat16), scale)[0]
    ).astype(np.float32)

    assert y_bf16.shape == y_ref.shape
    psnr = _psnr(y_bf16, y_ref)
    # full-model on-chip bf16 measures ~58 dB vs f32 (PERF.md); 45 dB gives
    # slack for interpret-mode/f32-hardware differences while still failing
    # loudly on any dropped f32 accumulation or bf16-quantized coordinate
    assert psnr >= 45.0, f"bf16 serving deviates {psnr:.1f} dB at {scale}"
