"""Fused STAU upsampler: both grid-samples + expert mixing + fusion conv.

Reference semantics: lbasicsr/archs/savsr_arch.py:262-376 — grid_sample
(zeros padding, align_corners=True) of the trunk feature with predicted
offsets, per-pixel expert compress/expand mixing, a second grid_sample of
the sta-filtered feature with st offsets, and a 1x1 fusion conv over the
concat. On TPU the per-pixel 2x2xC gathers are latency-bound (~11.5 ms
each at 720p, PERF.md); this kernel reformulates bilinear sampling as
MXU matmuls against "hat" interpolation matrices built on the VPU:

    out[c, p] = sum_j wy_j[p] * (X[j] @ hatx)[c, p]
    hatx[cl, p] = relu(1 - |gx[p] - cl|) * (cl < w)
    wy_j[p]    = relu(1 - |gy[p] - j|)

which is EXACTLY bilinear interpolation with zeros padding: out-of-image
rows/columns simply drop out of the sums. The y-sum runs over a band of
R LR rows whose start j0 is computed per HR row OUTSIDE the kernel —
possible because the STAU offsets depend only on the static coordinate
embedding, never on the video content — and shipped in via scalar
prefetch. Band rows whose y-weights are identically zero skip their
matmul (trained offsets are subpixel, so ~2 of R fire per row).

Grid: (B, H/G) — a GROUP of G HR rows per step. Consecutive HR rows'
LR bands overlap almost entirely (the band start advances by 1/sh < 1
row per HR row), so each step DMAs ONE union band of RG = R + G rows per
feature tensor instead of per-row bands — at G=8/x4 that's ~6x less HBM
traffic and 8x fewer DMA issues than the row-pair version this replaces
(measured 14.3 ms of the 50 ms window as pairs; overheads, not FLOPs,
dominated). Each row's in-band offset is its j0 minus the group start.
The expert mixing (reference builds per-pixel [C/8,C] matrices;
savsr_arch.py:353-359) and the 1x1 fusion conv run once per group at
G-row width on VMEM-resident data. Layouts: LR features arrive row-major
[B, h, C, Wl]; the output leaves as [B, H, Cout, Wp] (both lane-padded),
converted by thin XLA transposes at the boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 8  # HR rows per grid step; callers pad H to a multiple
TAPS = 3   # static band rows per sample (bilinear y-span, see _body)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _body(j0_ref, g0_ref, pix_ref, x_ref, st_ref, wc_ref, we_ref, wfus_ref,
          bias_ref, o_ref, xband, sband, hatx, group, sem, *, R, RG, G, h, w,
          wl, wp, c, n_exp):
    b = pl.program_id(0)
    g = pl.program_id(1)  # group of G HR rows [g*G, (g+1)*G)
    ng = pl.num_programs(1)
    dt = o_ref.dtype

    def band_dma(slot, step, src_ref, dst, col):
        g0 = g0_ref[step, col]
        return pltpu.make_async_copy(
            src_ref.at[b, pl.ds(g0, RG)], dst.at[slot], sem.at[slot, col]
        )

    def start_group(slot, step):
        band_dma(slot, step, x_ref, xband, 0).start()
        band_dma(slot, step, st_ref, sband, 1).start()

    # union bands double-buffered across grid steps
    @pl.when(g == 0)
    def _warm():
        start_group(0, 0)

    @pl.when(g + 1 < ng)
    def _prefetch():
        start_group((g + 1) % 2, g + 1)

    slot = g % 2
    band_dma(slot, g, x_ref, xband, 0).wait()
    band_dma(slot, g, st_ref, sband, 1).wait()

    cl = jax.lax.broadcasted_iota(jnp.int32, (wl, wp), 0).astype(jnp.float32)
    col_ok = cl < float(w)

    import os as _os

    # timing probes (scripts/stau_probe.py) — wrong math, never set in
    # production; read at trace time, so probes jax.clear_caches() between
    _nohat = _os.environ.get("SAVSR_STAU_NOHAT") == "1"
    _taps_env = int(_os.environ.get("SAVSR_STAU_TAPS", "0"))
    _noexpert = _os.environ.get("SAVSR_STAU_NOEXPERT") == "1"

    def sample(band, rr, gy_plane, gx_plane, j_col, g0):
        gx = pix_ref[0, rr, gx_plane, :][None, :]  # [1, wp]
        gy = pix_ref[0, rr, gy_plane, :][None, :]
        if not _nohat:
            hatx[...] = jnp.where(
                col_ok, jnp.maximum(1.0 - jnp.abs(gx - cl), 0.0), 0.0
            )
        hx = hatx[...].astype(dt)
        row = g * G + rr
        j0 = j0_ref[row, j_col]
        off = j0 - g0  # in-band start (>= 0 by the group-min construction)
        # STATIC 3-tap unroll over the band rows that can carry weight:
        # one HR row's bilinear y-span is [floor(min gy), floor(max gy)+1],
        # <= 3 rows whenever the offset spread within a row is < ~2 LR px
        # (the same magnitude assumption the per-row band R makes; rows
        # outside the span contribute wy = 0 exactly). This replaces a
        # data-dependent fori (scalar while loop) whose per-iteration
        # control overhead dominated the sampler (measured: disabling the
        # hat build moved the 14.3 ms STAU stage by only ~1 ms).
        acc = jnp.zeros((c, wp), jnp.float32)
        for j in range(min(_taps_env or 3, R)):
            wy = jnp.maximum(1.0 - jnp.abs(gy - (j0 + j).astype(jnp.float32)), 0.0)
            m = jax.lax.dot_general(
                band[slot, off + j], hx,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + wy * m
        return acc

    # all G rows' samples land in the group scratch; the expert/fusion
    # matmuls then run over row PAIRS (2*wp-wide values — the full G-wide
    # f32 intermediates would hold ~15 MB live and spill VMEM)
    g0x = g0_ref[g, 0]
    g0s = g0_ref[g, 1]
    for rr in range(G):
        group[0, :, pl.ds(rr * wp, wp)] = sample(xband, rr, 0, 1, 0, g0x).astype(dt)
        group[1, :, pl.ds(rr * wp, wp)] = sample(sband, rr, 2, 3, 1, g0s).astype(dt)

    ce = c // 8
    for half in range(G // 2):
        fea0 = group[0, :, pl.ds(half * 2 * wp, 2 * wp)]  # [C, 2wp] dt
        sta = group[1, :, pl.ds(half * 2 * wp, 2 * wp)]
        if _noexpert:  # timing probe: skip experts + fusion
            for d in range(2):
                o_ref[0, 2 * half + d] = fea0[:, d * wp : (d + 1) * wp]
            continue

        # expert mixing: zc_n = wc_n @ fea0; fc = sum_n r_n * zc_n;
        # fea = sum_n r_n*(we_n @ fc) + fea0  (reference savsr_arch.py:353-359)
        zc = jax.lax.dot_general(
            wc_ref[:], fea0, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_exp*ce, 2wp]
        rts = [
            jnp.concatenate(
                [pix_ref[0, 2 * half + d, 4 + n, :][None, :] for d in range(2)],
                axis=1,
            )
            for n in range(n_exp)
        ]
        fc = sum(rts[n] * zc[n * ce : (n + 1) * ce] for n in range(n_exp))
        stack = jnp.concatenate([(rts[n] * fc) for n in range(n_exp)], axis=0)
        ze = jax.lax.dot_general(
            we_ref[:], stack.astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, 2wp]
        fea = ze + fea0.astype(jnp.float32)

        # fusion 1x1 over concat([sta_up, fea]) (order per reference :375)
        cat = jnp.concatenate([sta, fea.astype(dt)], axis=0)
        out = jax.lax.dot_general(
            wfus_ref[:], cat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[:].astype(jnp.float32)
        for d in range(2):
            o_ref[0, 2 * half + d] = out[:, d * wp : (d + 1) * wp].astype(dt)


@functools.partial(
    jax.jit, static_argnames=("R", "h", "w", "W_hr")
)
def stau_upsample_fused(x_rows, st_rows, pix, j0, g0, wc, we, wfus, bias, *,
                        R, h, w, W_hr):
    """x_rows/st_rows: [B, h, C, Wl] row-major LR features; pix:
    [H/G, G, 8, Wp] f32 planes (gy_f, gx_f, gy_s, gx_s, r_0..r_3); j0:
    [H, 4] int32 (band starts clipped to [0, h-R], then per-sample in-band
    row counts <= R); g0: [H/G, 2] int32 group union-band starts (min of
    the group's j0 per feature, clipped to [0, h-RG]); wc: [n*C/8, C]; we:
    [C, n*C/8]; wfus: [Cout, 2C]; bias: [Cout, 1].
    Returns [B, H, Cout, Wp]."""
    bsz, h_in, c, wl = x_rows.shape
    assert h_in == h
    ngroups, G, _, wp = pix.shape
    assert G == GROUP
    H = ngroups * G
    cout = wfus.shape[0]
    n_exp = wc.shape[0] // (c // 8)
    RG = min(h, R + G)

    kernel = functools.partial(
        _body, R=R, RG=RG, G=G, h=h, w=w, wl=wl, wp=wp, c=c, n_exp=n_exp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, ngroups),
        in_specs=[
            pl.BlockSpec((1, G, 8, wp), lambda b, g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, cout, wp), lambda b, g, *_: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, RG, c, wl), x_rows.dtype),
            pltpu.VMEM((2, RG, c, wl), x_rows.dtype),
            pltpu.VMEM((wl, wp), jnp.float32),
            pltpu.VMEM((2, c, G * wp), x_rows.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, H, cout, wp), x_rows.dtype),
        grid_spec=grid_spec,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
            if jnp.dtype(x_rows.dtype).itemsize > 2 else pltpu.CompilerParams()
        ),
        interpret=_interpret(),
    )(j0, g0, pix, x_rows, st_rows, wc, we, wfus, bias)
