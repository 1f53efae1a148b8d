"""Throughput benchmark: SAVSR x4 output frames/sec on one chip.

Protocol mirrors the reference runtime harness
(lbasicsr/metrics/runtime.py:10-67): warmup, timed reps, per-window latency
on a (1, 7, 3, 180, 320) input at x4 (720p output). The reference repo
publishes no latency numbers (BASELINE.md), so ``vs_baseline`` is reported
against the driver's north-star target of 3x an estimated A100
frames/sec for this workload (see A100_FPS_ESTIMATE below).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Estimated reference throughput on A100 for (1,7,3,180,320) -> x4 720p:
# dynamic-conv VSR models of SAVSR's size run ~300-500 ms/window in the
# reference torch implementation; we take 2.5 windows(=frames)/sec as the
# A100 anchor. The north-star target is 3x that per chip.
A100_FPS_ESTIMATE = 2.5
TARGET_FPS = 3.0 * A100_FPS_ESTIMATE

H, W = 180, 320
SCALE = (4.0, 4.0)
WARMUP = int(os.environ.get("SAVSR_BENCH_WARMUP", 5))
REPS = int(os.environ.get("SAVSR_BENCH_REPS", 30))


def main():
    from savsr_tpu.archs.savsr_arch import SAVSR

    precision = os.environ.get("SAVSR_BENCH_PRECISION", "float32")
    impl = os.environ.get("SAVSR_BENCH_OSCONV", "einsum")
    model = SAVSR(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4, n_resblocks=8,
        osconv_impl=impl, matmul_precision=precision,
    )
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, params
        )

    x = jnp.asarray(
        np.random.default_rng(0).random((1, 7, H, W, 3), dtype=np.float32), dtype=dtype
    )

    @jax.jit
    def fwd(params, x):
        sr, _ = model.apply(params, x, SCALE, train=False)
        return sr

    out = fwd(params, x)
    out.block_until_ready()

    for _ in range(WARMUP):
        fwd(params, x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fwd(params, x)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    # one 7-frame window produces one output frame (windowed eval protocol)
    fps = REPS / elapsed
    result = {
        "metric": "savsr_x4_720p_output_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
