"""On-chip training-step throughput bench (samples/s/chip).

Drives the production ASVSRModel path at the shipped recipe shapes
(B=16, 60x60 LQ, x2; train_SAVSR_Vimeo90K_asBI.yml:119-141) on synthetic
batches, timing steady-state optimize_parameters calls. Every timed call
fetches the loss scalar (the axon relay elides unconsumed dispatches).

Knobs (env):
  SAVSR_TB_BATCH=16  SAVSR_TB_SIZE=60  SAVSR_TB_STEPS=8  SAVSR_TB_SCALE=2
  SAVSR_TB_BF16=1    SAVSR_TB_REMAT=full|dots|none|stau  SAVSR_TB_WIDTH=64
  SAVSR_TB_AOT=1 (train: aot_cache — persisted training executable)
  SAVSR_TB_BUCKET=1  SAVSR_TB_BUCKET_MULT=64 (train: bucket_train — one
                     program per rounded HR canvas; step overhead = the
                     canvas slack's HR-side compute)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np


def main():
    batch = int(os.environ.get("SAVSR_TB_BATCH", 16))
    size = int(os.environ.get("SAVSR_TB_SIZE", 60))
    steps = int(os.environ.get("SAVSR_TB_STEPS", 8))
    s = float(os.environ.get("SAVSR_TB_SCALE", 2))
    bf16 = os.environ.get("SAVSR_TB_BF16", "1") == "1"
    remat = os.environ.get("SAVSR_TB_REMAT", "full")
    accum = int(os.environ.get("SAVSR_TB_ACCUM", 1))
    accum_impl = os.environ.get("SAVSR_TB_ACCUM_IMPL", "scan")
    width = int(os.environ.get("SAVSR_TB_WIDTH", 64))
    scale = (s, s)

    from savsr_tpu.models import build_model

    net = dict(
        type="SAVSR", num_in_ch=3, num_feat=width, num_frame=7, slid_win=3,
        fusion_win=5, interval=0, w1_num_block=4, w2_num_block=2,
        n_resgroups=4, n_resblocks=8,
        osconv_impl=os.environ.get("SAVSR_TB_OSCONV", "einsum"),
        # "stau" = selective remat: no-remat everywhere except the STAU
        # upsampler segment (the measured HBM hotspot of the no-remat step)
        remat_train=remat in ("full", "dots"),
        remat_stau=remat == "stau",
        remat_policy=remat if remat in ("full", "dots") else "full",
        train_loop=os.environ.get("SAVSR_TB_LOOP", "unroll"),
    )
    opt = {
        "name": "train_bench", "model_type": "ASVSRModel", "num_gpu": 1,
        "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "manual_seed": 0, "scale": scale, "network_g": net,
        "path": {"pretrain_network_g": None, "strict_load_g": True},
        "train": {
            "ema_decay": 0.999, "bf16": bf16, "accum_steps": accum,
            "accum_impl": accum_impl,
            "aot_cache": os.environ.get("SAVSR_TB_AOT", "0") == "1",
            "bucket_train": os.environ.get("SAVSR_TB_BUCKET", "0") == "1",
            "bucket_mult": int(os.environ.get("SAVSR_TB_BUCKET_MULT", 64)),
            "optim_g": {"type": "Adam", "lr": 2e-4, "weight_decay": 0,
                        "betas": [0.9, 0.999]},
            "scheduler": {"type": "CosineAnnealingRestartLR",
                          "periods": [300000] * 4,
                          "restart_weights": [1, 1, 1, 1], "eta_min": 1e-7},
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

    model.update_learning_rate(1)
    model.feed_data(data)
    t0 = time.perf_counter()
    model.optimize_parameters(1)  # log_dict fetch inside forces execution
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={model.log_dict['l_total']:.5f}")

    profile_dir = os.environ.get("SAVSR_TB_PROFILE")
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            for i in (2, 3):
                model.update_learning_rate(i)
                model.optimize_parameters(i)
        print(f"trace written to {profile_dir}")

    times = []
    for i in range(4, steps + 4):
        model.update_learning_rate(i)
        t0 = time.perf_counter()
        model.optimize_parameters(i)
        _ = model.log_dict["l_total"]  # force per-step sync for this probe
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    print(f"B={batch} {size}x{size} x{s} bf16={bf16} remat={remat} accum={accum} "
          f"width={width}: best {best * 1e3:.1f} ms/step "
          f"median {med * 1e3:.1f} ms -> {batch / best:.1f} samples/s/chip "
          f"(per-step synced)")

    # pipelined rate — the production path: log_dict is lazy, so steps
    # between print_freq reads dispatch back-to-back with no host sync
    k = max(steps, 8)
    _ = model.log_dict["l_total"]  # drain the queue
    t0 = time.perf_counter()
    for i in range(k):
        model.update_learning_rate(100 + i)
        model.optimize_parameters(100 + i)
    _ = model.log_dict["l_total"]  # one sync for the whole block
    per = (time.perf_counter() - t0) / k
    print(f"pipelined ({k} steps, one sync): {per * 1e3:.1f} ms/step "
          f"-> {batch / per:.1f} samples/s/chip")


if __name__ == "__main__":
    main()
