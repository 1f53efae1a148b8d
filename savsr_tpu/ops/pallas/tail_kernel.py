"""Fused tail: 3x3 conv (C -> 3) + bilinear center-frame skip at HR.

Reference semantics: lbasicsr/archs/savsr_arch.py:739-741 — the STAU
output goes through ``conv_tail`` and the bilinearly-upsampled center
frame is added. At 720p these XLA ops cost ~4.8 ms, dominated by layout
(cout=3 convs and odd-shaped resize einsums). This kernel consumes the
fused sampler's row layout directly:

  per HR row r:
    conv: out[co, p] = sum_{dy,dx} Wt[dy*3+dx][co, :] @ sr[r+dy-1, :, p+dx-1]
    skip: up = wy0*xc[j0] + wy1*xc[j0+1]  (the <=2 nonzeros of the
          bilinear row matrix), then @ hatc [wl, Wp] on the MXU
          (the bilinear column matrix)

Row indices/weights for the skip are static per (h, H) and ship via
scalar prefetch; all boundary handling is pre-padded XLA-side (sr rows
get a zero row and a zero lane of margin; the center frame's channels are
padded to a full sublane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _body(rowinfo_ref, wy_ref, sr_ref, xc_ref, wt_ref, bias_ref, hatc_ref,
          o_ref, srband, xcrows, sem, *, c, cpad, wp, wp2, wl, nrows):
    b = pl.program_id(0)
    r = pl.program_id(1)
    nh = pl.num_programs(1)
    dt = o_ref.dtype

    def dma_sr(slot, row):
        return pltpu.make_async_copy(
            sr_ref.at[b, pl.ds(row, 3)], srband.at[slot], sem.at[slot, 0]
        )

    def dma_xc(slot, row):
        j0 = rowinfo_ref[row]
        return pltpu.make_async_copy(
            xc_ref.at[b, pl.ds(j0, 2)], xcrows.at[slot], sem.at[slot, 1]
        )

    @pl.when(r == 0)
    def _warm():
        dma_sr(0, 0).start()
        dma_xc(0, 0).start()

    @pl.when(r + 1 < nh)
    def _prefetch():
        dma_sr((r + 1) % 2, r + 1).start()
        dma_xc((r + 1) % 2, r + 1).start()

    slot = r % 2
    dma_sr(slot, r).wait()
    dma_xc(slot, r).wait()

    acc = jnp.zeros((cpad, wp), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc += jax.lax.dot_general(
                wt_ref[dy * 3 + dx], srband[slot, dy, :, pl.ds(dx, wp)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += bias_ref[:].astype(jnp.float32)

    wy0 = wy_ref[r]  # scalar-prefetched f32 per-row weight
    up_lr = (wy0 * xcrows[slot, 0].astype(jnp.float32)
             + (1.0 - wy0) * xcrows[slot, 1].astype(jnp.float32))
    up = jax.lax.dot_general(
        up_lr.astype(dt), hatc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [cpad, wp]
    o_ref[0, 0] = (acc + up).astype(dt)


@functools.partial(jax.jit, static_argnames=())
def tail_fused(sr_rows_pad, xc_rows, j0, wy, wt, bias, hatc):
    """sr_rows_pad: [B, H+2, C, Wp+128] sampler output rows, one zero row
    above/below and data lanes at [1, W+1); xc_rows: [B, h, Cp, Wl] center
    frame rows (channels zero-padded to a sublane); j0: [H] int32 skip row
    starts (clipped to h-2); wy: [H] f32 (weight of row j0);
    wt: [9, Cp, C] tap-major tail conv weight; bias: [Cp, 1];
    hatc: [Wl, Wp] bilinear column matrix. Returns [B, H, Cp, Wp]."""
    bsz, hpad, c, wp2 = sr_rows_pad.shape
    H = hpad - 2
    wp = wp2 - 128
    _, h_lr, cpad, wl = xc_rows.shape

    kernel = functools.partial(
        _body, c=c, cpad=cpad, wp=wp, wp2=wp2, wl=wl, nrows=H
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cpad, wp), lambda b, r, *_: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, c, wp2), sr_rows_pad.dtype),
            pltpu.VMEM((2, 2, cpad, wl), xc_rows.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, H, cpad, wp), sr_rows_pad.dtype),
        grid_spec=grid_spec,
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
            if jnp.dtype(sr_rows_pad.dtype).itemsize > 2
            else pltpu.CompilerParams()
        ),
        interpret=_interpret(),
    )(j0, wy, sr_rows_pad, xc_rows, wt, bias, hatc)
