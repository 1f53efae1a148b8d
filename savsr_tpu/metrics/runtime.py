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


def profile_trace(fn: Callable, trace_dir: str, *args) -> None:
    """Capture a jax.profiler trace of one call (TensorBoard-viewable) —
    the observability analogue of the reference's fvcore/timer hooks."""
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
        )
