"""Split-precision CHW convs (SAVSRConfig.conv_precision="split").

f32 carries with each conv contracted as stacked bf16 hi/lo halves
([Xhi; Xlo; Xhi] x [Whi, Whi, Wlo]) — three MXU passes approximating the
f32 matmul to ~2^-16 relative (vs bf16's ~2^-8), see chw_engine._split_x.
Pinned here on the virtual-CPU interpret path: the decomposition error is
fully exercised (operands really round to bf16); only the MXU pass count
is hardware-specific.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.archs.savsr_arch import SAVSR

# three full (tiny) serving-graph compiles in interpret mode: heavy tier
pytestmark = pytest.mark.heavy


def _outputs(conv_precision, dtype, x, scale):
    model = SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1,
        n_resblocks=2, center_frame_idx=None, conv_engine="chw",
        matmul_precision="float32", conv_precision=conv_precision,
    )
    params = model.init(jax.random.PRNGKey(0))
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, params
        )
    out, _ = jax.jit(
        lambda p, x: model.apply(p, x, scale, train=False)
    )(params, x.astype(dtype))
    return np.asarray(out, np.float32)


@pytest.mark.parametrize("scale", [(2.0, 2.0), (1.5, 3.5)])
def test_split_tier_tracks_f32_far_beyond_bf16(scale):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 7, 12, 14, 3), dtype=np.float32))

    ref = _outputs("native", jnp.float32, x, scale)   # strict f32
    split = _outputs("split", jnp.float32, x, scale)  # bf16x3 convs
    bf16 = _outputs("native", jnp.bfloat16, x, scale)

    err_split = float(np.abs(split - ref).max())
    err_bf16 = float(np.abs(bf16 - ref).max())
    # split must approximate strict f32 to ~2^-16-grade error...
    assert err_split < 2e-3, err_split
    # ...and be far closer than the pure-bf16 tier (>= ~30x here)
    assert err_split * 30 < err_bf16, (err_split, err_bf16)


def test_split_is_noop_in_training():
    """conv_precision=split must not alter the training path (the flag is
    eval-only; training uses the XLA engines)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 7, 12, 12, 3), dtype=np.float32))

    def train_out(conv_precision):
        model = SAVSR(
            num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
            interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1,
            n_resblocks=2, center_frame_idx=None,
            conv_precision=conv_precision,
        )
        params = model.init(jax.random.PRNGKey(0))
        out, _ = model.apply(params, x, (2.0, 2.0), train=True)
        return np.asarray(out, np.float32)

    np.testing.assert_array_equal(train_out("split"), train_out("native"))
