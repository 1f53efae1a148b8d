"""On-chip micro-bench of OSConv execution engines at TRAINING shapes.

The per-sample dynamic conv (per-sample kernels from the attention fold)
is ~36% of the training step in the device trace; this probe times each
formulation's forward and forward+backward at the shipped recipe shape
(B=8 micro-batch, 60x60, Cin=192 -> Cout=64) inside a scan-of-N so the
~25 ms relay dispatch amortizes.

Usage: python scripts/osconv_probe.py [impls...]
Env: SAVSR_OP_B=8 SAVSR_OP_HW=60 SAVSR_OP_CIN=192 SAVSR_OP_COUT=64
     SAVSR_OP_N=32 (scan length)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from savsr_tpu.ops.osconv import osconv_apply


def main():
    B = int(os.environ.get("SAVSR_OP_B", 8))
    HW = int(os.environ.get("SAVSR_OP_HW", 60))
    CIN = int(os.environ.get("SAVSR_OP_CIN", 192))
    COUT = int(os.environ.get("SAVSR_OP_COUT", 64))
    N = int(os.environ.get("SAVSR_OP_N", 32))
    dtype = jnp.bfloat16

    impls = _sys.argv[1:] or ["einsum", "grouped", "batchgroup", "taps", "kpatch3"]

    rng = np.random.default_rng(0)
    # fresh operands per scan iteration — a loop-invariant body gets hoisted
    # by XLA's LICM and the scan times pure dispatch
    xs = jnp.asarray(rng.random((N, B, HW, HW, CIN), dtype=np.float32), dtype)
    ws = jnp.asarray(
        rng.random((N, B, 3, 3, CIN, COUT), dtype=np.float32) * 0.05, dtype
    )

    flop = B * HW * HW * 9 * CIN * COUT * 2

    for impl in impls:
        def one(x, w):
            return osconv_apply(x, w, stride=1, padding=1, impl=impl)

        @jax.jit
        def fwd_many(xs, ws):
            def body(acc, xw):
                x, w = xw
                y = one(x, w)
                return acc + y.astype(jnp.float32).mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (xs, ws))
            return acc

        @jax.jit
        def fb_many(xs, ws):
            def loss(x, w):
                return one(x, w).astype(jnp.float32).mean()

            def body(acc, xw):
                x, w = xw
                l, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
                acc = acc + l + gx.astype(jnp.float32).mean()
                acc = acc + gw.astype(jnp.float32).mean()
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (xs, ws))
            return acc

        try:
            float(fwd_many(xs, ws))
            t0 = time.perf_counter()
            float(fwd_many(xs, ws))
            fwd_us = (time.perf_counter() - t0) / N * 1e6
            float(fb_many(xs, ws))
            t0 = time.perf_counter()
            float(fb_many(xs, ws))
            fb_us = (time.perf_counter() - t0) / N * 1e6
            print(
                f"{impl:>11}: fwd {fwd_us:8.1f} us ({flop / fwd_us / 1e6:6.1f} TF/s)"
                f"   fwd+bwd {fb_us:8.1f} us ({3 * flop / fb_us / 1e6:6.1f} TF/s)"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{impl:>11}: FAILED {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
