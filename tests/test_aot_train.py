"""Training-step AOT persistence (train: aot_cache: true).

The pure-XLA training step participates in JAX's persistent compile cache,
but through the TPU relay even a cache HIT costs minutes for the big
training program — utils/aot.py pickles the compiled PJRT executable
instead (loads in seconds). These tests pin that the AOT-routed step is
the SAME program as the jit path (identical losses/params over multiple
steps, donation intact) and that a fresh process-equivalent (new model
instance) loads the persisted executable.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # training-graph compiles: heavy tier

TINY_NET = dict(
    type="SAVSR", num_in_ch=3, num_feat=16, num_frame=7, slid_win=3,
    fusion_win=5, interval=0, w1_num_block=2, w2_num_block=1,
    n_resgroups=1, n_resblocks=2, center_frame_idx=None,
)


def _train_opt(tmp_path, aot):
    return {
        "name": f"aot_train{aot}",
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
            "accum_steps": 2,  # exercise the scan accum path under AOT
            "aot_cache": aot,
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


def _batches(n):
    rng = np.random.default_rng(0)
    return [
        {"lq": rng.random((2, 7, 12, 12, 3), dtype=np.float32),
         "gt": rng.random((2, 24, 24, 3), dtype=np.float32),
         "scale": (2.0, 2.0)}
        for _ in range(n)
    ]


def _run_steps(tmp_path, aot, batches):
    from savsr_tpu.models import build_model

    model = build_model(_train_opt(tmp_path, aot))
    losses = []
    for i, data in enumerate(batches, 1):
        model.update_learning_rate(i)
        model.feed_data(data)
        model.optimize_parameters(i)
        losses.append(float(model.log_dict["l_total"]))
    return model, losses


def test_train_aot_matches_jit(tmp_path, monkeypatch):
    monkeypatch.setenv("SAVSR_AOT_DIR", str(tmp_path / "aot"))
    batches = _batches(3)

    m_jit, losses_jit = _run_steps(tmp_path, False, batches)
    m_aot, losses_aot = _run_steps(tmp_path, True, batches)

    # same lowering -> same executable -> identical trajectories
    np.testing.assert_allclose(losses_aot, losses_jit, rtol=0, atol=0)
    for k in m_jit.params:
        np.testing.assert_allclose(
            np.asarray(m_aot.params[k]), np.asarray(m_jit.params[k]),
            rtol=0, atol=0, err_msg=k)
    for k in m_jit.params_ema:
        np.testing.assert_allclose(
            np.asarray(m_aot.params_ema[k]), np.asarray(m_jit.params_ema[k]),
            rtol=0, atol=0, err_msg=k)

    # exactly one persisted training executable
    entries = list((tmp_path / "aot").glob("train_step_*.jaxexe"))
    assert len(entries) == 1, entries

    # a fresh model instance (fresh-process equivalent) loads the persisted
    # executable and continues identically
    m_aot2, losses_aot2 = _run_steps(tmp_path, True, batches)
    np.testing.assert_allclose(losses_aot2, losses_jit, rtol=0, atol=0)
    entries2 = list((tmp_path / "aot").glob("train_step_*.jaxexe"))
    assert len(entries2) == 1, entries2  # reloaded, not recompiled
