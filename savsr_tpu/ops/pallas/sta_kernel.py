"""Fused STA filtering: kernel_conv (1x1) + LeakyReLU + 25-tap sta_conv.

Reference semantics: lbasicsr/archs/savsr_arch.py:297-313 — per-pixel
5x5 spatio-temporal kernels are predicted from the alignment feature by a
1x1 conv (C -> 25C), LeakyReLU(0.1), then each pixel of the trunk feature
is filtered by its own 25-tap kernel over a replicate-padded neighborhood.

One kernel does all three stages on VMEM-resident rows:
  1. per LR row: K[25C, W] = lrelu(Wk @ st_row + bias)  (MXU)
  2. out_row[c, p] = sum_t K[tC+c, p] * x_pad[row+dy, c, p+dx]  (VPU fmas)
The 25C-channel kernel tensor (24x the feature size; 184 MB at 720p bf16)
never touches HBM. Output leaves in the fused sampler's row-major
[B, rows, C, Wl] layout, so the STAU stage chains with zero relayouts.

Inputs are prepared XLA-side: ``x_pad`` is replicate-padded by 2 rows/cols
(matching the reference's edge padding at the TRUE image border — under
bucketed eval the caller pre-fills the canvas slack with edge replicas),
``st`` is the plain feature in row layout. A column-validity mask operand
zeroes lanes beyond the true width so the downstream zero-padding sampler
sees exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _body(st_ref, x_ref, wk_ref, bias_ref, mcol_ref, o_ref, xband, sem,
          *, th, c, wl, wl2, ksize, nrows):
    b = pl.program_id(0)
    s = pl.program_id(1)
    ns = pl.num_programs(1)
    dt = o_ref.dtype
    pad = (ksize - 1) // 2
    band = th + 2 * pad

    def band_dma(slot, step):
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(step * th, band)], xband.at[slot], sem.at[slot]
        )

    @pl.when(s == 0)
    def _warm():
        band_dma(0, 0).start()

    @pl.when(s + 1 < ns)
    def _prefetch():
        band_dma((s + 1) % 2, s + 1).start()

    slot = s % 2
    band_dma(slot, s).wait()

    mcol = mcol_ref[:]  # [1, wl] f32
    for i in range(th):
        krow = jax.lax.dot_general(
            wk_ref[:], st_ref[0, i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[:].astype(jnp.float32)
        # LeakyReLU(0.1) in abs form
        krow = (0.55 * krow + 0.45 * jnp.abs(krow)).astype(dt)
        acc = jnp.zeros((c, wl), jnp.float32)
        for t in range(ksize * ksize):
            dy, dx = t // ksize, t % ksize
            tap = xband[slot, i + dy, :, pl.ds(dx, wl)]
            acc += krow[t * c : (t + 1) * c, :] * tap
        o_ref[0, i] = (acc * mcol).astype(dt)


@functools.partial(jax.jit, static_argnames=("ksize",))
def sta_conv_fused(st_rows, x_pad_rows, wk, bias, mask_cols, *, ksize=5):
    """st_rows: [B, hp, C, Wl] row-layout alignment feature (hp a multiple
    of 8); x_pad_rows: [B, hp + ksize-1, C, Wl2] replicate-padded trunk
    feature (Wl2 = Wl + 128, data at lanes [0, w+ksize-1)); wk:
    [25C, C] t-major-reordered kernel_conv weight; bias: [25C, 1];
    mask_cols: [1, Wl] f32 validity of output lanes.
    Returns [B, hp, C, Wl]."""
    bsz, hp, c, wl = st_rows.shape
    wl2 = x_pad_rows.shape[3]
    th = 8
    assert hp % th == 0 and x_pad_rows.shape[1] == hp + ksize - 1

    kernel = functools.partial(
        _body, th=th, c=c, wl=wl, wl2=wl2, ksize=ksize, nrows=hp
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, hp, c, wl), st_rows.dtype),
        grid=(bsz, hp // th),
        in_specs=[
            pl.BlockSpec((1, th, c, wl), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, c, wl), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + ksize - 1, c, wl2), st_rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
            if jnp.dtype(st_rows.dtype).itemsize > 2 else pltpu.CompilerParams()
        ),
        interpret=_interpret(),
    )(st_rows, x_pad_rows, wk, bias, mask_cols)
