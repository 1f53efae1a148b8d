"""Gradient-accumulation train step (train: accum_steps: N).

The micro-batched step must match the full-batch step's math. With
BatchNorm in the net (OSAdapt mask, ScaleAttention) the per-micro-batch
batch statistics generally differ from the full-batch ones (standard
grad-accum semantics), so exact equality is pinned on a duplicated-halves
batch — samples [x0, x1, x0, x1] — where each micro-batch's batch stats
coincide with the full batch's and the two paths must agree to float
reassociation noise.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # training-graph compiles (5 jitted train steps): heavy tier

TINY_NET = dict(
    type="SAVSR", num_in_ch=3, num_feat=16, num_frame=7, slid_win=3,
    fusion_win=5, interval=0, w1_num_block=2, w2_num_block=1,
    n_resgroups=1, n_resblocks=2, center_frame_idx=None,
)


def _train_opt(tmp_path, accum, accum_impl="scan"):
    return {
        "name": f"accum{accum}",
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
        "scale": (2.0, 2.0),
        "train": {
            "ema_decay": 0.999,
            "bf16": False,
            "accum_steps": accum,
            "accum_impl": accum_impl,
            # SGD, not Adam: Adam's step-1 update is ~sign(g), which
            # amplifies reassociation noise in near-zero grads into
            # O(lr) param deltas; SGD keeps the comparison a direct
            # test of the gradient-mean math
            "optim_g": {"type": "SGD", "lr": 1e-2, "weight_decay": 0,
                        "momentum": 0},
            "scheduler": {"type": "CosineAnnealingRestartLR",
                          "periods": [10], "restart_weights": [1],
                          "eta_min": 1e-7},
            "total_iter": 10,
            "warmup_iter": -1,
            "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
    }


def _batch(duplicated_halves):
    rng = np.random.default_rng(0)
    half = rng.random((2, 7, 12, 12, 3), dtype=np.float32)
    gt_half = rng.random((2, 24, 24, 3), dtype=np.float32)
    if duplicated_halves:
        lq = np.concatenate([half, half])
        gt = np.concatenate([gt_half, gt_half])
    else:
        lq = np.concatenate([half, rng.random((2, 7, 12, 12, 3), dtype=np.float32)])
        gt = np.concatenate([gt_half, rng.random((2, 24, 24, 3), dtype=np.float32)])
    return {"lq": lq, "gt": gt, "scale": (2.0, 2.0)}


def _one_step(tmp_path, accum, batch, accum_impl="scan"):
    from savsr_tpu.models import build_model

    model = build_model(_train_opt(tmp_path, accum, accum_impl))
    model.feed_data(batch)
    model.optimize_parameters(1)
    return model


def test_accum_matches_full_batch_on_duplicated_halves(tmp_path):
    batch = _batch(duplicated_halves=True)
    m1 = _one_step(tmp_path, 1, batch)
    m2 = _one_step(tmp_path, 2, batch)

    assert abs(m1.log_dict["l_pix"] - m2.log_dict["l_pix"]) < 1e-6

    from savsr_tpu.models.base_model import split_params

    t1, s1 = split_params(m1.params)
    t2, s2 = split_params(m2.params)
    assert set(t1) == set(t2)
    worst_key, worst = None, 0.0
    for k in t1:
        a, b = np.asarray(t1[k]), np.asarray(t2[k])
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
        if err > worst:
            worst_key, worst = k, err
    assert worst < 1e-4, (worst_key, worst)

    # running stats chain per micro-forward: each BN site advances its
    # counter accum times as often (consecutive-forward semantics; some
    # sites run several times per forward, e.g. the per-window OSAdapt mask)
    nbt_keys = [k for k in s1 if k.endswith("num_batches_tracked")]
    assert nbt_keys
    for k in nbt_keys:
        assert int(np.asarray(s2[k])) == 2 * int(np.asarray(s1[k])), k


def test_accum_unroll_matches_scan(tmp_path):
    """accum_impl: unroll (optimization_barrier-chained micro-steps) is the
    same sequential sum as the lax.scan form — parameters after one step
    must agree to reassociation noise on a general (non-duplicated) batch."""
    batch = _batch(duplicated_halves=False)
    m_scan = _one_step(tmp_path, 2, batch, accum_impl="scan")
    m_unroll = _one_step(tmp_path, 2, batch, accum_impl="unroll")
    assert abs(m_scan.log_dict["l_pix"] - m_unroll.log_dict["l_pix"]) < 1e-6

    from savsr_tpu.models.base_model import split_params

    t1, _ = split_params(m_scan.params)
    t2, _ = split_params(m_unroll.params)
    assert set(t1) == set(t2)
    for k in t1:
        a, b = np.asarray(t1[k]), np.asarray(t2[k])
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-8) < 1e-4, k


def test_accum_general_batch_close(tmp_path):
    """Distinct micro-batches: BN batch stats differ per micro-batch, so
    the two paths are only approximately equal — but must stay close and
    finite (grad-accum gives a usable training step, not garbage)."""
    batch = _batch(duplicated_halves=False)
    m1 = _one_step(tmp_path, 1, batch)
    m2 = _one_step(tmp_path, 2, batch)
    assert np.isfinite(m2.log_dict["l_pix"])
    assert abs(m1.log_dict["l_pix"] - m2.log_dict["l_pix"]) < 0.05


def test_log_dict_is_lazy(tmp_path):
    """optimize_parameters must not synchronize on the loss: the device
    round trip happens only when log_dict is read (message logger at
    print_freq), letting steps pipeline back-to-back."""
    batch = _batch(duplicated_halves=True)
    model = _one_step(tmp_path, 1, batch)
    # _one_step returned without anything reading log_dict: still deferred
    assert model._log_cache is None
    assert model._losses_dev is not None
    vals = model.log_dict
    assert np.isfinite(vals["l_pix"]) and isinstance(vals["l_pix"], float)
    assert model._log_cache is vals  # materialized exactly once
