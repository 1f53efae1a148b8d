"""Isolate the fused STAU kernel's bottleneck on chip (720p x4 shapes).

Times stau_upsample_fused standalone (slope method, scan-of-N inside one
program) under the kernel's timing-probe env gates:

  full     — the real kernel
  nohat    — SAVSR_STAU_NOHAT=1: skip the per-row hat-matrix VPU build
  taps1    — SAVSR_STAU_TAPS=1: one tap-dot instead of 3 (isolates the
             sampling-matmul count; full - taps1 ~= 2 tap-dots per sample)
  noexpert — SAVSR_STAU_NOEXPERT=1: skip expert mixing + fusion conv

All probe variants compute wrong math; only the timing is meaningful.
jax.clear_caches() runs between variants (the gates are read at trace
time).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


H_LR, W_LR = 180, 320
SH = SW = 4.0
C = 64
BAND = 8


def build_operands():
    from savsr_tpu.ops.pallas.chw_conv import _round_up
    from savsr_tpu.ops.pallas.stau_kernel import GROUP as G, TAPS

    h, w = H_LR, W_LR
    H, W = int(h * SH), int(w * SW)
    wl = _round_up(w, 128)
    wp = _round_up(W, 128)
    rng = np.random.default_rng(0)

    x_rows = jnp.asarray(rng.standard_normal((1, h, C, wl)), jnp.bfloat16)
    st_rows = jnp.asarray(rng.standard_normal((1, h, C, wl)), jnp.bfloat16)

    # align_corners-style coordinates + small learned-offset jitter
    cols = np.arange(W)
    gx = (cols + 0.5) / SW - 0.5 + 0.1 * rng.standard_normal((H, W))
    rows_ = np.arange(H)
    gy = ((rows_ + 0.5) / SH - 0.5)[:, None] + 0.1 * rng.standard_normal((H, W))
    gx = np.clip(gx, 0, w - 1)
    gy = np.clip(gy, 0, h - 1)
    rt = np.abs(rng.standard_normal((H, 4, W))).astype(np.float32)
    rt /= rt.sum(axis=1, keepdims=True)

    planes = np.stack([gy, gx, gy, gx], axis=1)  # [H, 4, W]
    pix = np.concatenate([planes, rt], axis=1)
    HG = _round_up(H, G)
    pix = np.pad(pix, ((0, HG - H), (0, 0), (0, wp - W)))
    pix = pix.reshape(HG // G, G, 8, wp).astype(np.float32)

    m = np.floor(gy.min(axis=1)).astype(np.int32)
    j0c = np.clip(m, 0, h - TAPS)
    j0 = np.stack([j0c, j0c, np.full_like(j0c, 2), np.full_like(j0c, 2)], 1)
    j0 = np.pad(j0, ((0, HG - H), (0, 0)), mode="edge")
    RG = min(h, BAND + G)
    g0 = np.clip(j0.reshape(HG // G, G, 4)[:, :, :2].min(axis=1), 0, h - RG)
    g0r = np.repeat(g0, G, axis=0)
    j0[:, :2] = np.clip(j0[:, :2], g0r, g0r + (RG - TAPS))

    wc = jnp.asarray(0.05 * rng.standard_normal((4 * (C // 8), C)), jnp.bfloat16)
    we = jnp.asarray(0.05 * rng.standard_normal((C, 4 * (C // 8))), jnp.bfloat16)
    wfus = jnp.asarray(0.05 * rng.standard_normal((C, 2 * C)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((C, 1)), jnp.float32)
    return (x_rows, st_rows, jnp.asarray(pix), jnp.asarray(j0),
            jnp.asarray(g0), wc, we, wfus, bias)


def timed(f, *args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def run(ops, n):
    from savsr_tpu.ops.pallas.stau_kernel import stau_upsample_fused

    x_rows, st_rows, pix, j0, g0, wc, we, wfus, bias = ops

    def make_many(reps):
        @jax.jit
        def many(x_rows, st_rows):
            def body(c, _):
                xr, sr = c
                out = stau_upsample_fused(
                    xr, sr, pix, j0, g0, wc, we, wfus, bias,
                    R=BAND, h=H_LR, w=W_LR, W_hr=int(W_LR * SW),
                )
                # feed the output back into the carry — without this data
                # dependency XLA hoists the loop-invariant kernel out of
                # the scan and the slope measures nothing
                xr = xr + out[:, : xr.shape[1], :, : xr.shape[3]] * jnp.bfloat16(1e-30)
                return (xr, sr), out.astype(jnp.float32).mean()
            (_, _), o = jax.lax.scan(body, (x_rows, st_rows), None, length=reps)
            return o.sum()
        return many

    m1, m2 = make_many(n), make_many(2 * n)
    float(m1(x_rows, st_rows)); float(m2(x_rows, st_rows))
    t1 = min(timed(m1, x_rows, st_rows) for _ in range(3))
    t2 = min(timed(m2, x_rows, st_rows) for _ in range(3))
    return (t2 - t1) / n * 1e3  # ms per call


VAR_ENVS = {
    "full": {},
    "nohat": {"SAVSR_STAU_NOHAT": "1"},
    "taps1": {"SAVSR_STAU_TAPS": "1"},
    "noexpert": {"SAVSR_STAU_NOEXPERT": "1"},
}


def main():
    import sys

    variants = sys.argv[1:] or list(VAR_ENVS)
    reps = int(os.environ.get("REPS", 40))
    rounds = int(os.environ.get("ROUNDS", 2))
    ops = build_operands()
    best = {v: float("inf") for v in variants}
    for r in range(rounds):
        for v in variants:
            for k in ("SAVSR_STAU_NOHAT", "SAVSR_STAU_TAPS", "SAVSR_STAU_NOEXPERT"):
                os.environ.pop(k, None)
            os.environ.update(VAR_ENVS[v])
            jax.clear_caches()
            t = run(ops, reps)
            best[v] = min(best[v], t)
            print(f"  round {r}: {v:9s} {t:7.2f} ms/call", flush=True)
    for v in variants:
        print(f"{v:9s} {best[v]:7.2f} ms/call (min of {rounds})")


if __name__ == "__main__":
    main()
