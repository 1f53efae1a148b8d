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
import sys
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


def measure_serving(model, params, dtype, scale, tag):
    """Sustained serving fps at one scale, through the AOT-persisted
    executable (utils/aot.py): Mosaic custom-call programs skip JAX's
    persistent compile cache, so the compiled program itself is pickled to
    .savsr_aot/ — a fresh process loads it in seconds instead of paying
    the ~9.5-min remote serving compile."""
    from savsr_tpu.utils.aot import compile_cached

    rng = np.random.default_rng(0)

    # frame-invariant STAU coordinate-head outputs, computed ONCE per
    # (shape, scale) — the serving pipeline's per-frame path must not pay
    # for content-independent work (savsr_arch._stau_head)
    statics = jax.jit(
        model.stau_statics, static_argnames=("lq_hw", "scale", "dtype")
    )(params, lq_hw=(H, W), scale=scale, dtype=dtype)

    def fwd_many(params, statics, windows):
        def body(acc, x):
            sr, _ = model.apply(params, x, scale, train=False,
                                stau_statics=statics)
            return acc + sr.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), windows)
        return acc

    def make(i):
        return jnp.asarray(
            rng.random((N_WINDOWS, 1, 7, H, W, 3), dtype=np.float32) + 0.001 * i,
            dtype=dtype,
        )

    w0 = make(0)
    t_start = time.perf_counter()
    fwd_compiled, aot_info = compile_cached(fwd_many, (params, statics, w0), tag=tag)
    print(f"[{tag}] serving executable: {aot_info}", file=sys.stderr)
    float(fwd_compiled(params, statics, w0))  # warm (first dispatch)
    first_result_s = time.perf_counter() - t_start
    print(f"[{tag}] start->first-result: {first_result_s:.1f} s "
          f"({aot_info['source']})", file=sys.stderr)

    times = []
    for i in range(1, TRIALS + 1):
        windows = make(i)
        # force the host->device upload to finish before timing (the relay
        # defers transfers; a dependent scalar fetch flushes them)
        float(windows.astype(jnp.float32).mean())
        t0 = time.perf_counter()
        float(fwd_compiled(params, statics, windows))  # scalar fetch forces exec
        times.append(time.perf_counter() - t0)

    fps = N_WINDOWS / min(times)
    return fps, {"aot_source": aot_info["source"],
                 "first_result_s": round(first_result_s, 1)}


CLI_FRAMES = int(os.environ.get("SAVSR_BENCH_CLI_FRAMES", 64))


def measure_cli_fps(params):
    """End-to-end `python -m savsr_tpu.inference` wall fps at x4 720p:
    synthetic 64-frame 180x320 clip -> PNGs on disk, including frame
    read, device loop, uint8 fetch, and threaded PNG encode/write."""
    import re
    import shutil
    import subprocess
    import tempfile

    import cv2

    repo = os.path.dirname(os.path.abspath(__file__))
    root = tempfile.mkdtemp(prefix="savsr_cli_bench_")
    try:
        clip = os.path.join(root, "clip")
        os.makedirs(clip)
        rng = np.random.default_rng(7)
        base = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        for i in range(CLI_FRAMES):
            # cheap content variation; PNG encode cost stays realistic
            frame = np.roll(base, i * 3, axis=1)
            cv2.imwrite(os.path.join(clip, f"{i:08d}.png"), frame)
        wpath = os.path.join(root, "w.npz")
        # preserve dtypes (BN step counters are int); float params are
        # stored f32 (the CLI re-casts to the tier's dtype on load)
        np.savez(wpath, **{
            k: (np.asarray(v, dtype=np.float32)
                if v.dtype == jnp.bfloat16 else np.asarray(v))
            for k, v in params.items()})

        def run(ext):
            t0 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, "-m", "savsr_tpu.inference", "-i", clip,
                 "-o", os.path.join(root, f"out_{ext}"), "-s", "4",
                 "-w", wpath, "--tier", "bf16", "--ext", ext],
                cwd=repo, capture_output=True, text=True, timeout=1800)
            wall = time.perf_counter() - t0
            if proc.returncode != 0:
                raise RuntimeError(f"inference CLI failed: {proc.stderr[-800:]}")
            text = proc.stderr + proc.stdout
            m = re.search(r"done: (\d+) frames in ([\d.]+) s \(([\d.]+) fps",
                          text)
            if not m or int(m.group(1)) != CLI_FRAMES:
                raise RuntimeError(f"could not parse CLI fps: {proc.stderr[-400:]}")
            loop = re.search(r"frames in [\d.]+ s \(([\d.]+) fps excl\. startup",
                             text)
            return (float(m.group(3)),
                    float(loop.group(1)) if loop else None, round(wall, 1))

        # bmp first (warms the AOT entry if cold; bmp encode is ~5 ms/frame
        # so IO never gates the device loop even on a 1-core host), then
        # png (the user default; encode is ~70 ms/720p-frame per core)
        fps_bmp, loop_bmp, _ = run("bmp")
        fps_png, loop_png, wall_png = run("png")
        return {"cli_fps_x4_720p_incl_io": fps_png,
                "cli_fps_x4_720p_excl_startup": loop_png,
                "cli_fps_x4_720p_bmp": fps_bmp,
                "cli_fps_x4_720p_bmp_excl_startup": loop_bmp,
                "cli_frames": CLI_FRAMES,
                "cli_process_wall_s": wall_png}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    from savsr_tpu.archs.savsr_arch import SAVSR

    precision = os.environ.get("SAVSR_BENCH_PRECISION", "default")
    impl = os.environ.get("SAVSR_BENCH_OSCONV", "grouped")
    conv_engine = os.environ.get("SAVSR_BENCH_CONV", "chw")
    conv_precision = os.environ.get("SAVSR_BENCH_CONV_PRECISION", "native")
    use_bf16 = os.environ.get("SAVSR_BENCH_DTYPE", "bf16") == "bf16"
    model = SAVSR(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4, n_resblocks=8,
        osconv_impl=impl, matmul_precision=precision, conv_engine=conv_engine,
        conv_precision=conv_precision,
    )
    params = model.init(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    if use_bf16:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, params
        )

    t_bench = time.perf_counter()
    fps, head_info = measure_serving(
        model, params, dtype, SCALE, tag=f"bench_{conv_engine}_{impl}_x4"
    )
    result = {
        "metric": "savsr_x4_720p_output_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }

    # ---- hardware-grounded absolutes: achieved TF/s and %-of-peak (MFU),
    # independent of the A100 estimate above. FLOPs come from XLA cost
    # analysis of the XLA-engine forward at the bench shape (the CHW
    # program hides its math inside Mosaic custom calls, which cost
    # analysis cannot count); the XLA program hits the persistent compile
    # cache after the first run.
    try:
        from savsr_tpu.metrics.runtime import count_flops

        flops_info = count_flops(
            SAVSR(num_in_ch=3, num_feat=64, num_frame=7, slid_win=3,
                  fusion_win=5, interval=0, w1_num_block=4, w2_num_block=2,
                  n_resgroups=4, n_resblocks=8),
            jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32)
                if v.dtype == jnp.bfloat16 else v, params),
            scale=SCALE, input_shape=(1, 7, H, W, 3),
        )
        window_tflop = flops_info["gflops"] / 1e3
        tflops_eff = window_tflop * fps
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", dev.platform)
        # bf16 MXU peak per chip; cost analysis counts MACs as 2 FLOPs
        peak = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
                "TPU v5p": 459.0, "TPU v6 lite": 918.0,
                "TPU v6e": 918.0}.get(kind)
        hw = {
            "window_tflop": round(window_tflop, 4),
            "serving_tflops_effective": round(tflops_eff, 2),
            "device_kind": kind,
        }
        if peak:
            hw["peak_bf16_tflops"] = peak
            hw["mfu_pct"] = round(100.0 * tflops_eff / peak, 2)
        print(f"hw grounding: {hw}", file=sys.stderr)
    except Exception as e:
        hw = {}
        print(f"flops grounding failed: {e}", file=sys.stderr)

    # ---- perf matrix: serving at asymmetric/fractional scales + the
    # production training rate, so round-over-round regressions outside the
    # headline metric are machine-diffable. Soft time budget: if the AOT /
    # compile caches are cold, later entries are skipped rather than
    # risking the driver's bench window (they repopulate on the next run).
    budget_s = float(os.environ.get("SAVSR_BENCH_BUDGET_S", 2400))
    extra = {"serving_first_result_s": head_info["first_result_s"],
             "serving_aot_source": head_info["aot_source"], **hw}
    if os.environ.get("SAVSR_BENCH_MATRIX", "1") == "1":
        for sc in [(1.5, 3.5), (3.05, 3.05)]:
            if time.perf_counter() - t_bench > budget_s:
                print(f"skipping scale {sc}: over budget", file=sys.stderr)
                continue
            try:
                f, _ = measure_serving(
                    model, params, dtype, sc,
                    tag=f"bench_{conv_engine}_{impl}_x{sc[0]}_{sc[1]}",
                )
                extra[f"serving_fps_x{sc[0]}x{sc[1]}"] = round(f, 3)
            except Exception as e:
                print(f"scale {sc} failed: {e}", file=sys.stderr)
        # split-precision quality tier (f32-grade output from bf16 3-pass
        # convs with pair carries) at the headline scale — the middle CLI
        # tier's rate is part of the serving contract
        if (conv_precision == "native"
                and time.perf_counter() - t_bench < budget_s):
            try:
                model_split = SAVSR(
                    num_in_ch=3, num_feat=64, num_frame=7, slid_win=3,
                    fusion_win=5, interval=0, w1_num_block=4, w2_num_block=2,
                    n_resgroups=4, n_resblocks=8, osconv_impl=impl,
                    matmul_precision="float32", conv_engine=conv_engine,
                    conv_precision="split",
                )
                params_f32 = jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.float32)
                    if v.dtype == jnp.bfloat16 else v, params)
                # same tag as the headline entry on purpose: the AOT key is
                # content-addressed, and the split program was first cached
                # by a SAVSR_BENCH_CONV_PRECISION=split run under this tag
                f, _ = measure_serving(
                    model_split, params_f32, jnp.float32, SCALE,
                    tag=f"bench_{conv_engine}_{impl}_x4",
                )
                extra["serving_fps_split_tier_x4"] = round(f, 3)
            except Exception as e:
                print(f"split tier failed: {e}", file=sys.stderr)
        # end-to-end inference CLI fps (incl. disk IO + PNG encode): the
        # user-facing surface must deliver the bench's device rate, not
        # just the scan-of-N protocol (VERDICT r4 weak #2). Uses the same
        # clip shape / --windows as the CLI default so the AOT entry
        # cached by a prior run (or this one) is hit.
        if time.perf_counter() - t_bench < budget_s:
            try:
                cli = measure_cli_fps(params)
                extra.update(cli)
                print(f"inference CLI: {cli}", file=sys.stderr)
            except Exception as e:
                print(f"cli measure failed: {e}", file=sys.stderr)
        if time.perf_counter() - t_bench < budget_s:
            try:
                from savsr_tpu.metrics.runtime import measure_training_throughput

                tr = measure_training_throughput()
                extra["train_samples_per_s_pipelined"] = tr["pipelined_samples_per_s"]
                extra["train_samples_per_s_synced"] = tr["synced_samples_per_s"]
                print(f"training: {tr}", file=sys.stderr)
            except Exception as e:
                print(f"training measure failed: {e}", file=sys.stderr)
    # measured-this-round numbers too heavy to re-run inside the bench
    # window (e.g. the multi-scale recipe's 300-iter on-chip segment,
    # scripts/multiscale_bench.py) ride in from a committed snapshot,
    # clearly labeled with their provenance (PERF.md holds the protocol).
    snap_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "PERF_SNAPSHOT.json")
    if os.path.isfile(snap_path):
        try:
            with open(snap_path) as f:
                snap = json.load(f)
            extra.update({k: v for k, v in snap.items()
                          if k not in extra})
        except Exception as e:
            print(f"snapshot read failed: {e}", file=sys.stderr)
    result["extra"] = extra
    print(json.dumps(result))


if __name__ == "__main__":
    main()
