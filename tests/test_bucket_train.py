"""Bucketed multi-scale TRAINING (train: bucket_train: true).

The shipped recipe draws a per-batch scale from a 60-entry pool
(reference lbasicsr/data/vimeo90k_dataset.py + asvsr_model set_scale);
with a static-scale jitted step that is 60 compiled programs. Bucketing
the HR side (the LQ crop is fixed) collapses them to the few distinct
rounded canvases. These tests pin that the bucketed step computes the
SAME training math as the exact per-scale step:

  - forward parity: the canvas crop equals the exact train-mode forward,
  - loss/gradient parity: masked+renormalized loss == exact loss, and the
    parameter gradients agree,
  - trajectory parity: N optimizer steps track the exact model,
  - program sharing: two scales in one canvas add ONE jit cache entry.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # training-graph compiles: heavy tier

TINY_NET = dict(
    type="SAVSR", num_in_ch=3, num_feat=16, num_frame=7, slid_win=3,
    fusion_win=5, interval=0, w1_num_block=2, w2_num_block=1,
    n_resgroups=1, n_resblocks=2, center_frame_idx=None,
)


def _train_opt(tmp_path, bucket, scale=(2.0, 2.0), accum=1):
    return {
        "name": f"bucket_train{bucket}",
        "model_type": "ASVSRModel",
        "num_gpu": 1,
        "is_train": True,
        "dist": False,
        "rank": 0,
        "world_size": 1,
        "manual_seed": 0,
        "network_g": dict(TINY_NET),
        "path": {
            "pretrain_network_g": None,
            "strict_load_g": True,
            "log": str(tmp_path),
        },
        "datasets": {},
        "scale": scale,
        "train": {
            "ema_decay": 0.999,
            "bf16": False,
            "accum_steps": accum,
            "bucket_train": bucket,
            "bucket_mult": 32,
            "optim_g": {"type": "Adam", "lr": 2e-4, "weight_decay": 0,
                        "betas": [0.9, 0.999]},
            "scheduler": {"type": "CosineAnnealingRestartLR",
                          "periods": [10], "restart_weights": [1],
                          "eta_min": 1e-7},
            "total_iter": 10,
            "warmup_iter": -1,
            "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
    }


def _batches(n, scale, h0=12, w0=12, seed=0):
    from savsr_tpu.archs.savsr_arch import get_hw

    H, W = get_hw(h0, w0, scale)
    rng = np.random.default_rng(seed)
    return [
        {"lq": rng.random((2, 7, h0, w0, 3), dtype=np.float32),
         "gt": rng.random((2, H, W, 3), dtype=np.float32),
         "scale": scale}
        for _ in range(n)
    ]


def _run(tmp_path, bucket, scales, accum=1):
    from savsr_tpu.models import build_model

    model = build_model(_train_opt(tmp_path, bucket, accum=accum))
    losses = []
    i = 0
    for scale in scales:
        for data in _batches(2, scale, seed=hash(scale) % 2**31):
            i += 1
            model.update_learning_rate(i)
            model.feed_data(data)
            model.optimize_parameters(i)
            losses.append(float(model.log_dict["l_total"]))
    return model, losses


def test_bucket_forward_and_grads_match_exact():
    """Train-mode forward on the bucket canvas == the exact forward on the
    true region; masked loss value and parameter grads agree."""
    import jax
    import jax.numpy as jnp

    from savsr_tpu.archs.bucketed import (
        make_train_bucket_operands, train_bucket_dims)
    from savsr_tpu.archs.savsr_arch import SAVSR, get_hw

    net = SAVSR(**{k: v for k, v in TINY_NET.items() if k != "type"})
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    h0 = w0 = 12
    scale = (1.7, 2.3)
    H, W = get_hw(h0, w0, scale)
    lq = jnp.asarray(rng.random((2, 7, h0, w0, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((2, H, W, 3), dtype=np.float32))

    dims = train_bucket_dims(h0, w0, scale, mult=32)
    ops = make_train_bucket_operands(h0, w0, scale, dims)
    gt_b = jnp.pad(gt, ((0, 0), (0, dims[0] - H), (0, dims[1] - W), (0, 0)))

    out_exact, _ = net.apply(params, lq, scale, train=True)
    out_bucket, _ = net.apply(params, lq, (1.0, 1.0), train=True, bucket=ops)
    assert out_bucket.shape[1:3] == dims
    np.testing.assert_allclose(
        np.asarray(out_bucket[:, :H, :W]), np.asarray(out_exact),
        rtol=0, atol=2e-5,
    )

    def loss_exact(p):
        out, _ = net.apply(p, lq, scale, train=True)
        return jnp.sqrt((out - gt) ** 2 + 1e-12).mean()

    def loss_bucket(p):
        out, _ = net.apply(p, lq, (1.0, 1.0), train=True, bucket=ops)
        m = ops["mask_hr"]
        return (jnp.sqrt((out - gt_b) ** 2 + 1e-12) * m).mean() * ops["loss_scale"]

    le, ge = jax.value_and_grad(loss_exact, allow_int=True)(params)
    lb, gb = jax.value_and_grad(loss_bucket, allow_int=True)(params)
    np.testing.assert_allclose(float(lb), float(le), rtol=1e-5)
    for k in ge:
        if ge[k].dtype != jnp.float32:
            continue
        scale_ref = max(1e-8, float(jnp.abs(ge[k]).max()))
        np.testing.assert_allclose(
            np.asarray(gb[k]), np.asarray(ge[k]),
            rtol=0, atol=5e-4 * scale_ref, err_msg=k,
        )


def test_bucket_step_trajectory_matches_exact(tmp_path):
    """N production optimizer steps (Adam + EMA + BN stats) through the
    bucketed step track the exact static-scale step."""
    scales = [(2.0, 2.0), (1.5, 2.5)]
    m_exact, l_exact = _run(tmp_path / "e", False, scales)
    m_bucket, l_bucket = _run(tmp_path / "b", True, scales)
    np.testing.assert_allclose(l_bucket, l_exact, rtol=5e-4)
    # early Adam steps amplify f32 reduction-order noise (update ~ g/sqrt(v)
    # with v ~ 0), so per-param tolerance is a few ulps of the 2e-4 lr scale
    for k, v in m_exact.params.items():
        np.testing.assert_allclose(
            np.asarray(m_bucket.params[k]), np.asarray(v),
            rtol=0, atol=5e-5, err_msg=k,
        )


def test_bucket_shares_one_program_across_scales(tmp_path):
    """Two scales whose HR sizes round to the same canvas share ONE
    compiled training program (the whole point of bucket_train)."""
    from savsr_tpu.models import build_model
    from savsr_tpu.models.sr_model import SRModel

    model = build_model(_train_opt(tmp_path, True))
    # mult=32, h0=12: x2.0 -> 24 and x2.1 -> 25 both round to a 32-canvas
    before = SRModel._train_step._cache_size()
    i = 0
    for scale in [(2.0, 2.0), (2.1, 2.1)]:
        for data in _batches(1, scale):
            i += 1
            model.update_learning_rate(i)
            model.feed_data(data)
            model.optimize_parameters(i)
    assert SRModel._train_step._cache_size() == before + 1
    # and a scale needing a bigger canvas compiles a second program
    for data in _batches(1, (3.5, 3.5)):
        i += 1
        model.update_learning_rate(i)
        model.feed_data(data)
        model.optimize_parameters(i)
    assert SRModel._train_step._cache_size() == before + 2


def test_bucket_train_with_accum(tmp_path):
    """bucket_ops thread through the grad-accumulation micro-step scan."""
    scales = [(2.0, 2.0)]
    _, l_exact = _run(tmp_path / "e", False, scales, accum=2)
    _, l_bucket = _run(tmp_path / "b", True, scales, accum=2)
    np.testing.assert_allclose(l_bucket, l_exact, rtol=5e-4)
