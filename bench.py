"""Throughput benchmark: SAVSR x4 output frames/sec on one chip.

Protocol (mirrors the intent of the reference harness,
lbasicsr/metrics/runtime.py:10-67, adapted to this environment):
(1,7,3,180,320) window -> x4 720p output frame, bf16 serving config
(flat-padded CHW Pallas conv engine for the alignment chain + trunk,
default MXU precision).

Two measurement details matter on this axon-tunneled chip:
  - the relay elides unconsumed async dispatches, so every timed call
    must consume its result (we reduce to a scalar and fetch it);
  - each dispatch pays a ~20ms relay round trip, so sustained throughput
    is measured serving-style: a lax.scan over N windows inside ONE
    compiled program (one dispatch for N windows).

Quality note: bf16 end-to-end deviates from the f32 reference output at
~57dB PSNR (measured on golden weights) — negligible against Vid4-class
signal PSNRs; quality evaluation (savsr_tpu.test) defaults to f32.

The reference publishes no latency numbers (BASELINE.md); ``vs_baseline``
is reported against the driver's north-star of 3x an estimated A100
reference throughput for this workload (A100_FPS_ESTIMATE below).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

# persistent compile cache: the serving program is already compiled into
# the repo-local cache by earlier runs; without this the driver's bench
# invocation pays the full remote cold compile (~10+ min through the relay)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

# Estimated reference (torch, fp32) throughput on A100 for
# (1,7,3,180,320) -> x4 720p. The reference publishes no latency numbers
# (BASELINE.md); the anchor below is derived as follows and is the bench's
# single largest uncertainty:
#   - measured algorithmic cost of one window (XLA cost_analysis on the
#     compiled forward): 0.75 TFLOP, 49.5 GB accessed at f32.
#   - an fp32 A100 (19.5 TF/s dense peak / ~156 TF/s TF32) running the
#     reference's torch graph — groups=B dynamic convs, per-pixel unfold
#     sta_conv, grid_sample gathers, dozens of separate kernel launches
#     per window — historically sustains low-single-digit percent of TF32
#     peak on this op mix; HBM (~2 TB/s) bounds it at >=25 ms/window even
#     at perfect bandwidth (49.5 GB).
#   - 2.5 fps (400 ms/window) corresponds to ~1.2% TF32 util or ~6x the
#     bandwidth bound — mid-range for unfused per-pixel-dynamic VSR
#     models. The plausible A100 range is ~1-8 fps; at its optimistic
#     edge (8 fps) the 3x-A100 target becomes 24 fps, so vs_baseline
#     below should be read with that error bar.
A100_FPS_ESTIMATE = 2.5
TARGET_FPS = 3.0 * A100_FPS_ESTIMATE

H, W = 180, 320
SCALE = (4.0, 4.0)
N_WINDOWS = int(os.environ.get("SAVSR_BENCH_WINDOWS", 8))
TRIALS = int(os.environ.get("SAVSR_BENCH_TRIALS", 3))


def main():
    from savsr_tpu.archs.savsr_arch import SAVSR

    precision = os.environ.get("SAVSR_BENCH_PRECISION", "default")
    impl = os.environ.get("SAVSR_BENCH_OSCONV", "grouped")
    conv_engine = os.environ.get("SAVSR_BENCH_CONV", "chw")
    use_bf16 = os.environ.get("SAVSR_BENCH_DTYPE", "bf16") == "bf16"
    model = SAVSR(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4, n_resblocks=8,
        osconv_impl=impl, matmul_precision=precision, conv_engine=conv_engine,
    )
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    if use_bf16:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, params
        )

    rng = np.random.default_rng(0)

    # frame-invariant STAU coordinate-head outputs, computed ONCE per
    # (shape, scale) — the serving pipeline's per-frame path must not pay
    # for content-independent work (savsr_arch._stau_head)
    statics = jax.jit(
        model.stau_statics, static_argnames=("lq_hw", "scale", "dtype")
    )(params, lq_hw=(H, W), scale=SCALE, dtype=dtype)

    @jax.jit
    def fwd_many(params, statics, windows):
        def body(acc, x):
            sr, _ = model.apply(params, x, SCALE, train=False,
                                stau_statics=statics)
            return acc + sr.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), windows)
        return acc

    def make(i):
        return jnp.asarray(
            rng.random((N_WINDOWS, 1, 7, H, W, 3), dtype=np.float32) + 0.001 * i,
            dtype=dtype,
        )

    float(fwd_many(params, statics, make(0)))  # compile + warm

    times = []
    for i in range(1, TRIALS + 1):
        windows = make(i)
        # force the host->device upload to finish before timing (the relay
        # defers transfers; a dependent scalar fetch flushes them)
        float(windows.astype(jnp.float32).mean())
        t0 = time.perf_counter()
        float(fwd_many(params, statics, windows))  # scalar fetch forces execution
        times.append(time.perf_counter() - t0)

    fps = N_WINDOWS / min(times)
    result = {
        "metric": "savsr_x4_720p_output_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
