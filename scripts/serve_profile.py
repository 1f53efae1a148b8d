"""Capture a jax.profiler trace of the serving forward (bench protocol).

Writes a trace under SAVSR_PROF_DIR (default /tmp/serve_trace) for one
scan-of-N windows dispatch; summarize with
tools/trace_summary.py (op-level self-times from the .xplane.pb).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 180, 320
SCALE = (4.0, 4.0)
N = int(os.environ.get("SAVSR_BENCH_WINDOWS", 8))


def main():
    from savsr_tpu.archs.savsr_arch import SAVSR

    # SAVSR_PROF_TIER: bf16 (default) | split | fast | strict — mirrors the
    # inference CLI tiers so any serving configuration can be traced
    tier = os.environ.get("SAVSR_PROF_TIER", "bf16")
    model = SAVSR(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4,
        n_resblocks=8, conv_engine="chw",
        matmul_precision=("float32" if tier in ("strict", "split")
                          else "default"),
        conv_precision="split" if tier == "split" else "native",
    )
    dtype = jnp.bfloat16 if tier == "bf16" else jnp.float32
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda v: v.astype(dtype) if v.dtype == jnp.float32 else v, params
    )
    rng = np.random.default_rng(0)
    windows = jnp.asarray(
        rng.random((N, 1, 7, H, W, 3), dtype=np.float32), dtype
    )
    # frame-invariant STAU coordinate-head outputs, hoisted like bench.py
    # (SAVSR_PROF_STATICS=0 restores the inline head for comparison traces)
    statics = None
    if os.environ.get("SAVSR_PROF_STATICS", "1") == "1":
        statics = jax.jit(
            model.stau_statics, static_argnames=("lq_hw", "scale", "dtype")
        )(params, lq_hw=(H, W), scale=SCALE, dtype=dtype)

    @jax.jit
    def fwd_many(params, windows):
        def body(acc, x):
            out, _ = model.apply(params, x, SCALE, train=False,
                                 stau_statics=statics)
            return acc + out.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), windows)
        return acc

    float(fwd_many(params, windows))  # compile + warm
    t0 = time.perf_counter()
    float(fwd_many(params, windows))
    print(f"warm: {(time.perf_counter() - t0) / N * 1e3:.2f} ms/window")

    trace_dir = os.environ.get("SAVSR_PROF_DIR", "/tmp/serve_trace")
    with jax.profiler.trace(trace_dir):
        float(fwd_many(params, windows))
    print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
