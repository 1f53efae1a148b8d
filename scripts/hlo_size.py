"""Training-step HLO size probe: train_loop unroll vs scan.

Lowers the production train step (ASVSRModel._train_step via
optimize_parameters' jit wrapper) at the shipped recipe shapes and reports
the StableHLO module size — the proxy for the remote-compiler cold-compile
wall (PERF.md: ~30-45 min for the unrolled no-remat step). Runs on CPU
(tracing only, no compile) unless SAVSR_HS_COMPILE=1.

Usage: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/hlo_size.py
Knobs: SAVSR_TB_* as in train_bench.py (BATCH/SIZE/REMAT/ACCUM/OSCONV/WIDTH).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np


def build(train_loop: str):
    from savsr_tpu.models import build_model

    batch = int(os.environ.get("SAVSR_TB_BATCH", 16))
    size = int(os.environ.get("SAVSR_TB_SIZE", 60))
    s = float(os.environ.get("SAVSR_TB_SCALE", 2))
    remat = os.environ.get("SAVSR_TB_REMAT", "none")
    accum = int(os.environ.get("SAVSR_TB_ACCUM", 2))
    width = int(os.environ.get("SAVSR_TB_WIDTH", 64))
    scale = (s, s)
    net = dict(
        type="SAVSR", num_in_ch=3, num_feat=width, num_frame=7, slid_win=3,
        fusion_win=5, interval=0, w1_num_block=4, w2_num_block=2,
        n_resgroups=4, n_resblocks=8,
        osconv_impl=os.environ.get("SAVSR_TB_OSCONV", "taps"),
        remat_train=remat in ("full", "dots"),
        remat_stau=remat == "stau",
        remat_policy=remat if remat in ("full", "dots") else "full",
        train_loop=train_loop,
    )
    opt = {
        "name": "hlo_size", "model_type": "ASVSRModel", "num_gpu": 1,
        "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "manual_seed": 0, "scale": scale, "network_g": net,
        "path": {"pretrain_network_g": None, "strict_load_g": True},
        "train": {
            "ema_decay": 0.999, "bf16": True, "accum_steps": accum,
            "optim_g": {"type": "Adam", "lr": 2e-4, "weight_decay": 0,
                        "betas": [0.9, 0.999]},
            "scheduler": {"type": "CosineAnnealingRestartLR",
                          "periods": [300000], "restart_weights": [1],
                          "eta_min": 1e-7},
            "total_iter": 1200000, "warmup_iter": -1,
            "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                          "reduction": "mean"},
        },
        "datasets": {},
    }
    model = build_model(opt)
    rng = np.random.default_rng(0)
    H, W = round(size * scale[0]), round(size * scale[1])
    data = {
        "lq": rng.random((batch, 7, size, size, 3), dtype=np.float32),
        "gt": rng.random((batch, H, W, 3), dtype=np.float32),
        "scale": scale,
    }
    return model, data, scale


def main():
    import jax

    from savsr_tpu.models.base_model import split_params

    for loop in ("unroll", "scan"):
        model, data, scale = build(loop)
        model.feed_data(data)
        trainable, stats = split_params(model.params)
        ema = model.params_ema if model.ema_decay > 0 else None
        t0 = time.perf_counter()
        lowered = type(model)._train_step.lower(
            model, trainable, stats, ema, model.opt_state,
            model.lq, model.gt, np.float32(2e-4), tuple(scale), None,
        )
        trace_s = time.perf_counter() - t0
        text = lowered.as_text()
        lines = text.count("\n")
        print(f"{loop}: {lines} stablehlo lines, {len(text) / 1e6:.1f} MB "
              f"(trace {trace_s:.1f}s)")
        if os.environ.get("SAVSR_HS_COMPILE") == "1":
            t0 = time.perf_counter()
            lowered.compile()
            print(f"  compile: {time.perf_counter() - t0:.1f}s "
                  f"on {jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
