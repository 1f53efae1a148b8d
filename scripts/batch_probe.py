"""Batched-serving probe: output fps/chip for window batch B in {1, 2, 4}.

Per-frame serving runs B=1; offline upscaling (the throughput use case)
can batch independent 7-frame windows per dispatch, amortizing the XLA
glue (layout transposes, window stacking) and filling more MXU rows per
kernel call. This probe measures whether that actually pays on chip —
the scan-of-N one-dispatch protocol of bench.py at each B.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/batch_probe.py
Env: SAVSR_BP_BATCHES="1,2,4"  SAVSR_BP_N=8  SAVSR_BP_TRIALS=3
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


def main():
    from savsr_tpu.archs.savsr_arch import SAVSR
    from savsr_tpu.utils.aot import compile_cached

    batches = [int(b) for b in os.environ.get("SAVSR_BP_BATCHES", "1,2,4").split(",")]
    n = int(os.environ.get("SAVSR_BP_N", 8))
    trials = int(os.environ.get("SAVSR_BP_TRIALS", 3))

    model = SAVSR(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4,
        n_resblocks=8, matmul_precision="default", conv_engine="chw",
    )
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, params
    )
    statics = jax.jit(
        model.stau_statics, static_argnames=("lq_hw", "scale", "dtype")
    )(params, lq_hw=(H, W), scale=SCALE, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    for b in batches:
        def fwd_many(params, statics, windows):
            def body(acc, x):
                sr, _ = model.apply(params, x, SCALE, train=False,
                                    stau_statics=statics)
                return acc + sr.astype(jnp.float32).mean(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), windows)
            return acc

        def make(i):
            return jnp.asarray(
                rng.random((n, b, 7, H, W, 3), dtype=np.float32) + 1e-3 * i,
                jnp.bfloat16,
            )

        w0 = make(0)
        try:
            fwd_c, info = compile_cached(fwd_many, (params, statics, w0),
                                         tag=f"bp_b{b}")
            print(f"B={b}: executable {info['source']}", flush=True)
            float(fwd_c(params, statics, w0))
            times = []
            for i in range(1, trials + 1):
                windows = make(i)
                float(windows.astype(jnp.float32).mean())  # flush upload
                t0 = time.perf_counter()
                float(fwd_c(params, statics, windows))
                times.append(time.perf_counter() - t0)
            fps = n * b / min(times)
            print(f"B={b}: {fps:.2f} output frames/s/chip "
                  f"({min(times) / (n * b) * 1e3:.1f} ms/frame)", flush=True)
        except Exception as e:
            print(f"B={b}: FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
