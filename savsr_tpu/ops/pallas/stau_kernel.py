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

The expert mixing (reference builds per-pixel [C/8,C] matrices;
savsr_arch.py:353-359) and the 1x1 fusion conv are small per-row matmuls
on data already resident in VMEM, so they ride along for free.

Grid: (B, H) — one HR output row per step. LR bands are manually
double-buffered across grid steps (persistent scratch; next row's DMA is
issued before this row's compute). Layouts: LR features arrive row-major
[B, h, C, Wl]; the output leaves as [B, H, Cout, Wp] (both lane-padded),
converted by thin XLA transposes at the boundary.
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


def _body(j0_ref, pix_ref, x_ref, st_ref, wc_ref, we_ref, wfus_ref, bias_ref,
          o_ref, xband, sband, hatx, pair, sem, *, R, h, w, wl, wp, c, n_exp):
    b = pl.program_id(0)
    r = pl.program_id(1)  # PAIR of HR rows (2r, 2r+1)
    nh = pl.num_programs(1)
    dt = o_ref.dtype

    def band_dma(slot, step, rr, src_ref, dst, j_col):
        j0 = j0_ref[2 * step + rr, j_col]
        return pltpu.make_async_copy(
            src_ref.at[b, pl.ds(j0, R)], dst.at[slot, rr], sem.at[slot, rr, j_col]
        )

    def start_pair(slot, step):
        for rr in range(2):
            band_dma(slot, step, rr, x_ref, xband, 0).start()
            band_dma(slot, step, rr, st_ref, sband, 1).start()

    # persistent double buffer across grid steps: warm up on the first
    # pair, then issue pair r+1's band DMAs before computing pair r
    @pl.when(r == 0)
    def _warm():
        start_pair(0, 0)

    @pl.when(r + 1 < nh)
    def _prefetch():
        start_pair((r + 1) % 2, r + 1)

    slot = r % 2
    for rr in range(2):
        band_dma(slot, r, rr, x_ref, xband, 0).wait()
        band_dma(slot, r, rr, st_ref, sband, 1).wait()

    cl = jax.lax.broadcasted_iota(jnp.int32, (wl, wp), 0).astype(jnp.float32)
    col_ok = cl < float(w)

    def sample(dst_slot_band, rr, gy_plane, gx_plane, j_col):
        gx = pix_ref[0, rr, gx_plane, :][None, :]  # [1, wp]
        gy = pix_ref[0, rr, gy_plane, :][None, :]
        hatx[...] = jnp.where(
            col_ok, jnp.maximum(1.0 - jnp.abs(gx - cl), 0.0), 0.0
        )
        hx = hatx[...].astype(dt)
        j0 = j0_ref[2 * r + rr, j_col]
        # dynamic trip count: the number of band rows whose y-weights can
        # be nonzero (typically 2-3 of R; precomputed per HR row). A
        # data-dependent fori bound lowers to a scalar while loop, so the
        # unused rows' matmuls genuinely never execute (a lax.cond here
        # became a select that ran both sides).
        jc = j0_ref[2 * r + rr, 2 + j_col]
        acc = jnp.zeros((c, wp), jnp.float32)

        def one(j, acc):
            wy = jnp.maximum(1.0 - jnp.abs(gy - (j0 + j).astype(jnp.float32)), 0.0)
            m = jax.lax.dot_general(
                dst_slot_band[slot, rr, j], hx,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + wy * m

        return jax.lax.fori_loop(0, jc, one, acc)

    # both rows' samples concatenated on lanes: the expert/fusion matmuls
    # below then run once per pair at 2x width
    for rr in range(2):
        pair[0, :, pl.ds(rr * wp, wp)] = sample(xband, rr, 0, 1, 0).astype(dt)
        pair[1, :, pl.ds(rr * wp, wp)] = sample(sband, rr, 2, 3, 1).astype(dt)
    fea0 = pair[0]  # [C, 2wp] dt
    sta = pair[1]

    # expert mixing: zc_n = wc_n @ fea0; fc = sum_n r_n * zc_n;
    # fea = sum_n r_n * (we_n @ fc) + fea0   (reference savsr_arch.py:353-359)
    ce = c // 8
    zc = jax.lax.dot_general(
        wc_ref[:], fea0, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n_exp*ce, 2wp]
    rts = [
        jnp.concatenate(
            [pix_ref[0, 0, 4 + n, :][None, :], pix_ref[0, 1, 4 + n, :][None, :]],
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
    for rr in range(2):
        o_ref[0, rr] = out[:, rr * wp : (rr + 1) * wp].astype(dt)


@functools.partial(
    jax.jit, static_argnames=("R", "h", "w", "W_hr")
)
def stau_upsample_fused(x_rows, st_rows, pix, j0, wc, we, wfus, bias, *,
                        R, h, w, W_hr):
    """x_rows/st_rows: [B, h, C, Wl] row-major LR features; pix:
    [H, 8, Wp] f32 planes (gy_f, gx_f, gy_s, gx_s, r_0..r_3); j0: [H, 4]
    int32 (band starts clipped to [0, h-R], then per-sample in-band row
    counts <= R); wc: [n*C/8, C]; we:
    [C, n*C/8]; wfus: [Cout, 2C]; bias: [Cout, 1].
    Returns [B, H, Cout, Wp]."""
    bsz, h_in, c, wl = x_rows.shape
    assert h_in == h
    H2, _, _, wp = pix.shape  # pix: [H/2, 2, 8, Wp] row pairs
    H = 2 * H2
    cout = wfus.shape[0]
    n_exp = wc.shape[0] // (c // 8)

    kernel = functools.partial(
        _body, R=R, h=h, w=w, wl=wl, wp=wp, c=c, n_exp=n_exp
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, H // 2),
        in_specs=[
            pl.BlockSpec((1, 2, 8, wp), lambda b, r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, cout, wp), lambda b, r, *_: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, R, c, wl), x_rows.dtype),
            pltpu.VMEM((2, 2, R, c, wl), x_rows.dtype),
            pltpu.VMEM((wl, wp), jnp.float32),
            pltpu.VMEM((2, c, 2 * wp), x_rows.dtype),
            pltpu.SemaphoreType.DMA((2, 2, 2)),
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
    )(j0, pix, x_rows, st_rows, wc, we, wfus, bias)
