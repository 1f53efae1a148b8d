"""Runtime benchmark harness (reference: lbasicsr/metrics/runtime.py).

Times a jitted VSR forward with host-side wall clock around
``block_until_ready`` (the TPU analogue of CUDA-event timing): configurable
warmup + timed reps, reports ms/window and output frames/sec.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import get_root_logger


def vsr_runtime_test(
    model,
    params,
    scale: Tuple[float, float] = (4.0, 4.0),
    input_shape: Tuple[int, ...] = (1, 7, 180, 320, 3),
    warmup: int = 100,
    reps: int = 300,
    dtype=jnp.float32,
) -> dict:
    """Benchmark ``model.apply`` (SAVSR-style (params, x, scale) signature)."""
    logger = get_root_logger()
    x = jnp.asarray(
        np.random.default_rng(0).random(input_shape, dtype=np.float32), dtype=dtype
    )

    @jax.jit
    def fwd(params, x):
        out, _ = model.apply(params, x, scale, train=False)
        return out

    t0 = time.perf_counter()
    fwd(params, x).block_until_ready()
    compile_s = time.perf_counter() - t0
    logger.info(f"runtime_test: compile {compile_s:.1f}s")

    for _ in range(warmup):
        fwd(params, x).block_until_ready()

    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fwd(params, x)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    ms_per_window = elapsed / reps * 1000.0
    result = {
        "compile_s": compile_s,
        "ms_per_window": ms_per_window,
        "output_frames_per_sec": 1000.0 / ms_per_window,
        "input_shape": input_shape,
        "scale": scale,
    }
    logger.info(f"runtime_test: {ms_per_window:.2f} ms/window "
                f"({result['output_frames_per_sec']:.2f} out-frames/s)")
    return result


def count_flops(
    model,
    params,
    scale: Tuple[float, float] = (4.0, 4.0),
    input_shape: Tuple[int, ...] = (1, 7, 180, 320, 3),
    dtype=jnp.float32,
) -> dict:
    """Analytic FLOPs/bytes of the compiled forward via XLA cost analysis —
    the counterpart of the reference's fvcore FLOPs hook
    (lbasicsr/archs/savsr_arch.py:748-753, which switches get_HW to the
    int path so fvcore can trace). Here the forward is already
    shape-static, so the compiled executable reports the model cost
    directly."""
    x = jax.ShapeDtypeStruct(input_shape, dtype)

    def fwd(params, x):
        out, _ = model.apply(params, x, scale, train=False)
        return out

    compiled = jax.jit(fwd).lower(params, x).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per device kind
        costs = costs[0]
    return {
        "gflops": float(costs.get("flops", 0.0)) / 1e9,
        "hbm_gbytes": float(costs.get("bytes accessed", 0.0)) / 1e9,
        "input_shape": input_shape,
        "scale": scale,
    }


def measure_training_throughput(
    batch: int = 16,
    size: int = 60,
    scale: Tuple[float, float] = (2.0, 2.0),
    steps: int = 6,
    net_overrides: dict | None = None,
    train_overrides: dict | None = None,
) -> dict:
    """Production training-step throughput (samples/s/chip) at the shipped
    recipe configuration (train_SAVSR_Vimeo90K_asBI.yml: taps engine,
    no-remat, bf16, accum=2), driven through ASVSRModel.feed_data ->
    optimize_parameters exactly as savsr_tpu.train runs it. Reports both
    the per-step-synced rate and the pipelined steady state (lazy log_dict:
    one sync per block). Used by bench.py's perf matrix and
    scripts/train_bench.py."""
    from ..models import build_model

    net = dict(
        type="SAVSR", num_in_ch=3, num_feat=64, num_frame=7, slid_win=3,
        fusion_win=5, interval=0, w1_num_block=4, w2_num_block=2,
        n_resgroups=4, n_resblocks=8, osconv_impl="taps",
        remat_train=False,
    )
    net.update(net_overrides or {})
    train = {
        "ema_decay": 0.999, "bf16": True, "accum_steps": 2,
        "aot_cache": True,  # persisted training executable (utils/aot.py)
        "optim_g": {"type": "Adam", "lr": 2e-4, "weight_decay": 0,
                    "betas": [0.9, 0.999]},
        "scheduler": {"type": "CosineAnnealingRestartLR",
                      "periods": [300000] * 4,
                      "restart_weights": [1, 1, 1, 1], "eta_min": 1e-7},
        "total_iter": 1200000, "warmup_iter": -1,
        "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                      "reduction": "mean"},
    }
    train.update(train_overrides or {})
    opt = {
        "name": "train_bench", "model_type": "ASVSRModel", "num_gpu": 1,
        "is_train": True, "dist": False, "rank": 0, "world_size": 1,
        "manual_seed": 0, "scale": scale, "network_g": net,
        "path": {"pretrain_network_g": None, "strict_load_g": True},
        "train": train, "datasets": {},
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
    model.optimize_parameters(1)
    loss0 = model.log_dict["l_total"]
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(2, steps + 2):
        model.update_learning_rate(i)
        t0 = time.perf_counter()
        model.optimize_parameters(i)
        _ = model.log_dict["l_total"]
        times.append(time.perf_counter() - t0)
    synced = batch / min(times)

    _ = model.log_dict["l_total"]
    k = max(steps, 8)
    t0 = time.perf_counter()
    for i in range(k):
        model.update_learning_rate(100 + i)
        model.optimize_parameters(100 + i)
    _ = model.log_dict["l_total"]
    pipelined = batch / ((time.perf_counter() - t0) / k)
    return {
        "compile_s": round(compile_s, 1),
        "first_loss": round(float(loss0), 5),
        "synced_samples_per_s": round(synced, 2),
        "pipelined_samples_per_s": round(pipelined, 2),
        "batch": batch, "size": size, "scale": scale,
    }


def profile_trace(fn: Callable, trace_dir: str, *args) -> None:
    """Capture a jax.profiler trace of one call (TensorBoard-viewable) —
    the observability analogue of the reference's fvcore/timer hooks."""
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
        )
