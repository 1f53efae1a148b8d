"""Fused CHW 3x3/1x1 convolutions — the alignment-chain hot path.

Why CHW (vs the model's NHWC): at SAVSR's alignment shapes (B=1, 64
channels, 180x320 LQ), an NHWC conv is a [HW, 9*Cin] x [9*Cin, 64] matmul
whose N=64 output lanes fill half the MXU columns; XLA measured ~18% of
bf16 peak on the chain (PERF.md). In CHW the conv becomes
Y[co, n] = sum_k W[co, k] X[k, n] with N = spatial (hundreds of full
128-lane chunks), M = Cout and K = 3*Cin per dy-shift — 1.5 to 4.5 systolic
chunks. Reference chain semantics: lbasicsr/archs/savsr_arch.py:399-464.

Layout convention ("flat-padded CHW"): every tensor is [B, C, S] where the
image lives row-major at width w+2 (one zero pad column each side), with
h+2 padded rows, and one slab of guard zeros at each end:

    S = (ns + 2) * th * (w + 2),  ns = ceil((h + 2) / th)

Valid pixel (r, c) sits at flat G + (r+1)*(w+2) + (c+1), G = th*(w+2).
In this convention a (dy, dx) conv tap is a PURE FLAT OFFSET of
(dy-1)*(w+2) + (dx-1): no in-kernel reshapes or relayouts, ever. The
kernel's epilogue re-zeros the pad ring via a precomputed mask so outputs
stay in-convention and chain directly into the next conv.

Per row-slab (grid B x (ns+2)):
  1. DMA the input window [Cin, (th+2)*(w+2)+2] HBM->VMEM.
  2. Build the dx-im2col [3*Cin, (th+2)*(w+2)] with three lane-shifted
     copies (dx = 0, 1, 2) — 3x data, not 9x.
  3. For dy in 0..2: accumulate W_dy [Cout, 3Cin] @ imcol[:, dy*(w+2):...]
     in f32 (the dy shift is a flat slice offset).
  4. Epilogue (all fused): +bias, +pre_add (Cin-split partial sums),
     *out_scale (OSConv fa), LeakyReLU (abs form), *pad-mask, +residual.

Eval-path engine (B small); training keeps the XLA NHWC forms whose
backwards XLA schedules well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def layout_params(h: int, w: int):
    # row width padded to full 128-lane chunks: Mosaic block shapes need a
    # 128-divisible trailing dim, and every dx/dy tap stays a flat offset
    wp = _round_up(w + 2, 128)
    # slab height: 8 rows. Measured alternatives: th=12 (fewer, wider
    # slabs; needs a 24MB VMEM cap at Cin=192) benches 18.9 vs 19.2 fps —
    # the smaller slabs pipeline better.
    th = 8
    ns = -(-(h + 2) // th)
    block = th * wp
    s_total = (ns + 2) * block
    guard = block
    return th, ns, wp, block, s_total, guard


# ---------------------------------------------------------------------------
# layout converters (XLA side)
# ---------------------------------------------------------------------------


def nhwc_to_chw(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> flat-padded [B, C, S]."""
    b, h, w, c = x.shape
    th, ns, wp, block, s_total, guard = layout_params(h, w)
    y = jnp.transpose(x, (0, 3, 1, 2))
    y = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, wp - w - 1)))
    y = y.reshape(b, c, (h + 2) * wp)
    tail = s_total - guard - (h + 2) * wp
    return jnp.pad(y, ((0, 0), (0, 0), (guard, tail)))


def chw_to_nhwc(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """flat-padded [B, C, S] -> [B, H, W, C]."""
    b, c, _ = x.shape
    th, ns, wp, block, s_total, guard = layout_params(h, w)
    y = x[:, :, guard : guard + (h + 2) * wp].reshape(b, c, h + 2, wp)
    y = y[:, :, 1 : h + 1, 1 : w + 1]
    return jnp.transpose(y, (0, 2, 3, 1))


@functools.lru_cache(maxsize=64)
def _pad_mask(h: int, w: int) -> np.ndarray:
    """[1, S] f32: 1 on valid pixels, 0 on the pad ring / guards."""
    th, ns, wp, block, s_total, guard = layout_params(h, w)
    m = np.zeros((h + 2, wp), np.float32)
    m[1 : h + 1, 1 : w + 1] = 1.0
    full = np.zeros((s_total,), np.float32)
    full[guard : guard + (h + 2) * wp] = m.reshape(-1)
    return full[None]


def pack_w3(w_hwio) -> jnp.ndarray:
    """[3, 3, Cin, Cout] (HWIO) -> [3*Cout, Kp] dy-major (rows dy*Cout+co),
    K = dx*Cin + ci, zero-padded to Kp = roundup(3*Cin, 128) (the MXU pads
    partial 128-chunks anyway, so the zero columns are free). The dy-major
    row stacking lets the kernel fuse the dy0/dy1 matmuls into one full
    128-row MXU tile (Cout=64 alone idles half the array)."""
    kh, kw, ci, co = w_hwio.shape
    assert kh == 3 and kw == 3
    w = jnp.transpose(w_hwio, (0, 3, 1, 2)).reshape(3 * co, 3 * ci)
    kp = _round_up(3 * ci, 128)
    return jnp.pad(w, ((0, 0), (0, kp - 3 * ci)))



def _compiler_params(dtype, out_dtype=None, pair_epilogue=False):
    """Raise the scoped-VMEM cap only for f32 (the wide eval convs need
    ~21MB; v5e physically grants far more — probed to 100MB). bf16 keeps
    the 16MB default: raising it measurably changes Mosaic's buffer
    scheduling and costs ~1.5 fps on the serving path. The split tier
    (bf16 slabs, f32 out/pre/res blocks) needs a modest bump — its widest
    call (Cout=128 with pre+residual) measures 17.3M scoped; the pair-carry
    variant only when it also carries a f32 pre / pair residual block."""
    if jnp.dtype(dtype).itemsize > 2:
        return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
    if out_dtype is not None and jnp.dtype(out_dtype).itemsize > 2:
        return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
    if pair_epilogue:
        return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)
    return pltpu.CompilerParams()

# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _vec_col(ref, bi, n):
    """Select this sample's [Cout, 1] column from a whole [N, Cout, 1] VMEM
    ref. N==1 -> shared; otherwise an unrolled value select (a ref-slice
    .at[i] would need a 128-aligned lane slice, which lane dim 1 can't give)."""
    v = ref[:]
    col = v[0]
    for j in range(1, n):
        col = jnp.where(bi == j, v[j], col)
    return col


def _pair_out(y, o_ref, pc):
    """Split a f32 [Cout, block] result into bf16 hi/lo PAIR channels,
    interleaved in ``pc``-wide chunks: out rows [2pc*j : 2pc*j+pc] = hi of
    y's chunk j, [2pc*j+pc : 2pc*(j+1)] = lo. The next conv's im2col
    consumes this carry directly (in_pair) — no XLA-side decompose pass."""
    cout = y.shape[0]
    for j in range(cout // pc):
        yj = y[j * pc : (j + 1) * pc]
        hi = yj.astype(jnp.bfloat16)
        lo = (yj - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        o_ref[pl.ds(2 * pc * j, pc), :] = hi
        o_ref[pl.ds(2 * pc * j + pc, pc), :] = lo


def _pair_res(res_ref, cout, pc):
    """Reconstruct a f32 [Cout, block] residual from PAIR-carried bf16
    channels (hi + lo per ``pc``-chunk)."""
    rv = res_ref[:].astype(jnp.float32)
    chunks = [
        rv[2 * pc * j : 2 * pc * j + pc] + rv[2 * pc * j + pc : 2 * pc * (j + 1)]
        for j in range(cout // pc)
    ]
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)


def _body3(x_ref, w_ref, bias_ref, scale_ref, pre_ref, res_ref, mask_ref,
           o_ref, imcol, xslab, sem, *, cin, cout, th, wp, ns, lrelu,
           use_pre, use_res, kpad, nb_bias, nb_scale,
           in_pair=False, out_pair=False, res_pair=False, pc=64):
    bi = pl.program_id(0)
    s = pl.program_id(1)
    block = th * wp
    el2 = (th + 2) * wp  # imcol columns
    # pair input: x carries 2*cin bf16 rows [hi; lo]; the im2col below
    # rebuilds the [Xhi, Xlo, Xhi] x [Whi, Whi, Wlo] 3-pass layout in VMEM
    # (duplicating hi), so HBM ships 2C instead of 3C channels and the
    # XLA-side decompose/concat pass disappears entirely
    cin_rows = 2 * cin if in_pair else cin
    ck = 3 * cin if in_pair else cin  # per-dx im2col block

    def slab_dma(slot, step):
        # HBM DMA slices must be 128-lane aligned: take a full extra 128
        # margin before the (wp-aligned) slab start; the dx shifts then read
        # at lane offset 127+dx from VMEM (cheap rotation)
        start = block + ((step - 1) * th - 1) * wp - 128
        return pltpu.make_async_copy(
            x_ref.at[bi, :, pl.ds(start, el2 + 256)], xslab.at[slot], sem.at[slot]
        )

    # input slabs double-buffered across grid steps: the guard step s=0
    # warms slot 1 for s=1; each compute step prefetches s+1 before waiting
    @pl.when((s == 0) & (ns >= 1))
    def _warm():
        slab_dma(1, 1).start()

    @pl.when((s >= 1) & (s < ns))
    def _prefetch():
        slab_dma((s + 1) % 2, s + 1).start()

    @pl.when((s >= 1) & (s <= ns))
    def _compute():
        slot = s % 2
        slab_dma(slot, s).wait()
        if in_pair:
            for dx in range(3):
                # [hi, lo] contiguous, then the duplicated hi block
                imcol[pl.ds(dx * ck, 2 * cin), :] = xslab[
                    slot, pl.ds(0, 2 * cin), pl.ds(127 + dx, el2)
                ]
                imcol[pl.ds(dx * ck + 2 * cin, cin), :] = xslab[
                    slot, pl.ds(0, cin), pl.ds(127 + dx, el2)
                ]
        else:
            for dx in range(3):
                imcol[pl.ds(dx * cin, cin), :] = xslab[slot, :, pl.ds(127 + dx, el2)]

        # One matmul per dy, contracting the LOGICAL K = 3*Cin — NOT the
        # 128-padded kpad the operands carry. Measured (scripts/conv_probe.py
        # k192): 48.1 vs 53.1 us/conv at Cin=64 — the MXU streams 1.5
        # K-chunks for K=192 instead of 2 full passes for an explicit 256,
        # and the kpad zero-fill step disappears. (Other measured dead ends,
        # for the record: stacking dy0+dy1 weights into a [2*Cout, K]
        # full-128-row tile — accumulator slices/adds cost more than the
        # tile packing saves; a static-double-buffer "pingpong" that
        # interleaves the next slab's im2col build with this step's dots —
        # 65 vs 53 us, Mosaic does not overlap the VPU copies with the MXU
        # stream and the extra buffer hurts.)
        kdot = 3 * ck
        # bf16 operands pin contract precision to DEFAULT: the split tier
        # runs the model under default_matmul_precision('float32') (for the
        # XLA-side head/samplers), whose fp32 contract tag Mosaic rejects
        # on bf16 kernel operands (same fix as the pallas_train engine).
        # f32 operands keep the ambient precision — the fast-parity tier
        # (f32 carries, default precision -> 1-pass bf16 multiplies) and
        # the strict tier (float32 -> multi-pass) both ride it.
        prec = (None if jnp.dtype(imcol.dtype).itemsize > 2
                else jax.lax.Precision.DEFAULT)
        a = jax.lax.dot_general(
            w_ref[pl.ds(0, cout), pl.ds(0, kdot)],
            imcol[pl.ds(0, kdot), pl.ds(0, block)],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        for dy in (1, 2):
            a += jax.lax.dot_general(
                w_ref[pl.ds(dy * cout, cout), pl.ds(0, kdot)],
                imcol[pl.ds(0, kdot), pl.ds(dy * wp, block)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
        y = a + _vec_col(bias_ref, bi, nb_bias).astype(jnp.float32)
        if use_pre:
            y = y + pre_ref[:].astype(jnp.float32)
        y = y * _vec_col(scale_ref, bi, nb_scale).astype(jnp.float32)
        if lrelu is not None:
            la, lb = lrelu
            y = la * y + lb * jnp.abs(y)
        y = y * mask_ref[:]
        if use_res:
            if res_pair:
                y = y + _pair_res(res_ref, cout, pc)
            else:
                y = y + res_ref[:].astype(jnp.float32)
        if out_pair:
            _pair_out(y, o_ref, pc)
        else:
            o_ref[:] = y.astype(o_ref.dtype)

    @pl.when((s < 1) | (s > ns))
    def _guard():
        o_ref[:] = jnp.zeros_like(o_ref)


def _body1(x_ref, w_ref, bias_ref, scale_ref, pre_ref, res_ref, mask_ref,
           o_ref, *, cout, lrelu, use_pre, use_res, nw, nb_bias, nb_scale,
           in_pair=False, out_pair=False, res_pair=False, pc=64):
    bi = pl.program_id(0)
    # whole-ref load + value select: a ref slice .at[i] would need the
    # lane dim (Cin) 128-aligned, which 64-channel convs can't give
    wv = w_ref[:]
    w = wv[0]
    for j in range(1, nw):
        w = jnp.where(bi == j, wv[j], w)
    prec = (None if jnp.dtype(w.dtype).itemsize > 2
            else jax.lax.Precision.DEFAULT)
    dn = (((1,), (0,)), ((), ()))
    if in_pair:
        # pair-carried x ([hi; lo] per pc-chunk) with w packed per chunk as
        # [Whi, Whi, Wlo] (pack_w1_pair): two dots per chunk — no hi-dup copy
        xv = x_ref[0]
        nchunk = xv.shape[0] // (2 * pc)
        y = None
        for j in range(nchunk):
            a = jax.lax.dot_general(
                w[:, 3 * pc * j : 3 * pc * j + 2 * pc],
                xv[2 * pc * j : 2 * pc * (j + 1)],
                dimension_numbers=dn, preferred_element_type=jnp.float32,
                precision=prec,
            )
            a += jax.lax.dot_general(
                w[:, 3 * pc * j + 2 * pc : 3 * pc * (j + 1)],
                xv[2 * pc * j : 2 * pc * j + pc],
                dimension_numbers=dn, preferred_element_type=jnp.float32,
                precision=prec,
            )
            y = a if y is None else y + a
    else:
        y = jax.lax.dot_general(
            w, x_ref[0],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            # dtype-pinned contract precision (see _body3): Mosaic rejects
            # the split tier's ambient fp32 tag on bf16 operands
            precision=prec,
        )
    y = y + _vec_col(bias_ref, bi, nb_bias).astype(jnp.float32)
    if use_pre:
        y = y + pre_ref[:].astype(jnp.float32)
    y = y * _vec_col(scale_ref, bi, nb_scale).astype(jnp.float32)
    if lrelu is not None:
        la, lb = lrelu
        y = la * y + lb * jnp.abs(y)
    y = y * mask_ref[:]
    if use_res:
        if res_pair:
            y = y + _pair_res(res_ref, cout, pc)
        else:
            y = y + res_ref[:].astype(jnp.float32)
    if out_pair:
        _pair_out(y, o_ref, pc)
    else:
        o_ref[:] = y.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def _vec3(v, b, cout):
    """Normalize a [Cout, 1] (shared) / [B, Cout, 1] (per-sample) bias or
    scale operand to 3-D. It ships whole to VMEM and the kernel indexes the
    leading dim with ``bi % shape[0]`` — a blocked spec would need a
    128-aligned lane slice, which a [*, Cout, 1] operand cannot give."""
    if v.ndim == 2:
        v = v[None]
    assert v.shape[0] in (1, b) and v.shape[1] == cout, (v.shape, b, cout)
    return v


def _opt_spec(x, cout, block, cblock: int = 0):
    """Optional [B, n*Cout, S] operand: ``cblock`` picks the Cout-sized
    channel block (static) — lets callers feed one wide conv's output into
    several narrow convs' pre_add with no slicing copies."""
    if x is None:
        return (
            jnp.zeros((1, 1, 1), jnp.bfloat16),
            pl.BlockSpec((1, 1, 1), lambda bi, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            False,
        )
    return (
        x,
        pl.BlockSpec((1, cout, block), lambda bi, s: (bi, cblock, s),
                     memory_space=pltpu.VMEM),
        True,
    )


@functools.partial(jax.jit, static_argnames=("h", "w", "lrelu", "pre_block",
                                             "out_dtype", "in_pair",
                                             "out_pair", "res_pair", "pc"))
def conv3x3_chw(x, w3, bias, out_scale, pre_add, residual, *, h, w,
                lrelu=None, mask=None, pre_block=0, out_dtype=None,
                in_pair=False, out_pair=False, res_pair=False, pc=64):
    """Flat-padded CHW 3x3 conv with fused epilogue.

    x: [B, Cin, S]; w3: [B, 3, Cout, 3Cin] (per-sample; broadcast for
    static weights); bias/out_scale: [Cout, 1] f32; pre_add/residual:
    [B, Cout, S] or None; lrelu: (a, b) abs-form coefficients or None.
    Epilogue order: +bias, +pre_add, *out_scale, lrelu, *mask, +residual.
    ``mask`` [1, S] f32 overrides the (h, w)-derived pad mask — the
    bucketed any-scale eval marks the TRUE valid region of a larger
    static canvas (archs/bucketed.py).

    Split-precision PAIR carries (chw_engine, conv_precision="split"):
    ``in_pair``   — x is bf16 [B, 2*Cin, S] hi/lo pair channels; the kernel
                    builds the [Xhi, Xlo, Xhi] 3-pass im2col in VMEM (w3
                    must be packed from the [Whi, Whi, Wlo] split weight).
    ``out_pair``  — emit bf16 [B, 2*Cout, S] pair channels (``pc``-chunk
                    interleaved) instead of casting the f32 accumulator.
    ``res_pair``  — residual is pair-carried; reconstructed in-kernel.
    """
    b, cin, s_total = x.shape
    if in_pair:
        assert cin % 2 == 0
        cin = cin // 2
        # one pair chunk per kernel call: multi-chunk pair tensors are
        # sliced by the engine (chw_engine._split_chunks) into chained
        # calls — the interleaved [hi,lo]*n layout is NOT a single
        # [hi_cin; lo_cin] block
        assert cin == pc, (cin, pc)
    th, ns, wp, block, s_expect, guard = layout_params(h, w)
    assert s_total == s_expect, (s_total, s_expect)
    if w3.ndim == 2:  # static [3*Cout, Kp] weight shared across the batch
        w3 = w3[None]
    ck = 3 * cin if in_pair else cin
    assert w3.shape[2] == _round_up(3 * ck, 128), "use pack_w3"
    assert w3.shape[0] in (1, b)
    wmap = (lambda bi, s: (0, 0, 0)) if w3.shape[0] == 1 else (
        lambda bi, s: (bi, 0, 0))
    cout = w3.shape[1] // 3
    if out_pair or res_pair:
        assert cout % pc == 0, (cout, pc)

    # bias / out_scale: [Cout, 1] shared or [B, Cout, 1] per-sample (the
    # paired f2p/p2f alignment chains carry per-chain biases)
    bias = _vec3(bias, b, cout)
    out_scale = _vec3(out_scale, b, cout)
    nb_bias, nb_scale = bias.shape[0], out_scale.shape[0]

    pre, pre_spec, use_pre = _opt_spec(pre_add, cout, block, pre_block)
    res, res_spec, use_res = _opt_spec(residual, 2 * cout if res_pair else cout,
                                       block)
    if mask is None:
        mask = jnp.asarray(_pad_mask(h, w))

    kpad = w3.shape[2]
    kernel = functools.partial(
        _body3, cin=cin, cout=cout, th=th, wp=wp, ns=ns, lrelu=lrelu,
        use_pre=use_pre, use_res=use_res, kpad=kpad,
        nb_bias=nb_bias, nb_scale=nb_scale,
        in_pair=in_pair, out_pair=out_pair, res_pair=res_pair, pc=pc,
    )

    def wrapped(x_ref, w_ref, bias_ref, scale_ref, pre_ref, res_ref,
                mask_ref, o_ref, imcol, xslab, sem):
        kernel(x_ref, w_ref.at[0], bias_ref, scale_ref,
               pre_ref.at[0], res_ref.at[0], mask_ref, o_ref.at[0],
               imcol, xslab, sem)

    cout_rows = 2 * cout if out_pair else cout
    out = pl.pallas_call(
        wrapped,
        out_shape=jax.ShapeDtypeStruct(
            (b, cout_rows, s_total),
            jnp.bfloat16 if out_pair else (out_dtype or x.dtype)),
        grid=(b, ns + 2),
        in_specs=[
            # pin to HBM: Mosaic promotes small inputs to VMEM under ANY and
            # then cannot slice sub-sublane channel counts (e.g. the 6-ch
            # conv_sup input); the kernel's manual DMA needs an HBM source
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 3 * cout, w3.shape[2]), wmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias whole [Nb,Cout,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale whole
            pre_spec,
            res_spec,
            pl.BlockSpec((1, block), lambda bi, s: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout_rows, block), lambda bi, s: (bi, 0, s),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3 * ck, (th + 2) * wp), x.dtype),
            pltpu.VMEM((2, 2 * cin if in_pair else cin,
                        (th + 2) * wp + 256), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(x.dtype, out_dtype, use_pre or use_res
                                         if (in_pair or out_pair) else False),
        interpret=_interpret(),
    )(x, w3, bias, out_scale, pre, res, mask)
    return out


def conv3x3_chw_parts(parts, w3_parts, bias, out_scale, residual, *, h, w,
                      lrelu=None, pre_add=None, mask=None, out_dtype=None,
                      in_pairs=None, out_pair=False, res_pair=False, pc=64):
    """conv3x3(concat(parts, C)) as a chain of Cin-split kernel calls linked
    through the fused ``pre_add`` epilogue term.

    Needed for wide inputs: at 720p the im2col slab for Cin=320 (window_l2's
    5-frame OSConv/merge, reference savsr_arch.py:478-501) busts the 16MB
    VMEM budget; each chunk here keeps its own slab small. Epilogue
    (bias/scale/lrelu/residual) applies once, on the last call.

    ``in_pairs`` flags each part as a bf16 pair-carried chunk (split tier);
    intermediate partial sums stay exact f32 regardless — only the LAST
    call splits the result into pair channels when ``out_pair``.
    """
    n = len(parts)
    cout = bias.shape[0]
    zeros = jnp.zeros((cout, 1), jnp.float32)
    ones = jnp.ones((cout, 1), jnp.float32)
    if in_pairs is None:
        in_pairs = [False] * n
    y = pre_add
    for i, (p, w3) in enumerate(zip(parts, w3_parts)):
        last = i == n - 1
        y = conv3x3_chw(
            p, w3,
            bias if last else zeros,
            out_scale if last else ones,
            y, residual if last else None,
            h=h, w=w, lrelu=lrelu if last else None, mask=mask,
            out_dtype=jnp.float32 if (out_pair and not last) else out_dtype,
            in_pair=in_pairs[i], out_pair=out_pair and last,
            res_pair=res_pair and last, pc=pc,
        )
    return y


@functools.partial(jax.jit, static_argnames=("h", "w", "lrelu", "out_dtype",
                                             "in_pair", "out_pair",
                                             "res_pair", "pc"))
def conv1x1_chw(x, w1, bias, out_scale, pre_add, residual, *, h, w,
                lrelu=None, mask=None, out_dtype=None,
                in_pair=False, out_pair=False, res_pair=False, pc=64):
    """Flat-padded CHW 1x1 conv (pure channel matmul) with fused epilogue.

    w1: [Cout, Cin] (static) or [B, Cout, Cin] (per-sample — the paired
    f2p/p2f chains). Other args as conv3x3_chw; pair flags as conv3x3_chw
    (``in_pair`` wants w1 packed by pack_w1_pair: [Cout, 3*Cin_logical]).
    """
    b, cin, s_total = x.shape
    th, ns, wp, block, s_expect, guard = layout_params(h, w)
    assert s_total == s_expect
    if w1.ndim == 2:
        w1 = w1[None]
    assert w1.shape[0] in (1, b)
    cout = w1.shape[1]
    nw = w1.shape[0]
    if in_pair:
        assert cin % (2 * pc) == 0 and w1.shape[2] == 3 * (cin // 2), (
            w1.shape, cin, pc)
    if out_pair or res_pair:
        assert cout % pc == 0, (cout, pc)

    bias = _vec3(bias, b, cout)
    out_scale = _vec3(out_scale, b, cout)
    nb_bias, nb_scale = bias.shape[0], out_scale.shape[0]
    pre, pre_spec, use_pre = _opt_spec(pre_add, cout, block)
    res, res_spec, use_res = _opt_spec(residual, 2 * cout if res_pair else cout,
                                       block)
    if mask is None:
        mask = jnp.asarray(_pad_mask(h, w))

    kernel = functools.partial(
        _body1, cout=cout, lrelu=lrelu, use_pre=use_pre, use_res=use_res,
        nw=nw, nb_bias=nb_bias, nb_scale=nb_scale,
        in_pair=in_pair, out_pair=out_pair, res_pair=res_pair, pc=pc,
    )

    def wrapped(x_ref, w_ref, bias_ref, scale_ref, pre_ref, res_ref,
                mask_ref, o_ref):
        kernel(x_ref, w_ref, bias_ref, scale_ref,
               pre_ref.at[0], res_ref.at[0], mask_ref, o_ref.at[0])

    cout_rows = 2 * cout if out_pair else cout
    out = pl.pallas_call(
        wrapped,
        out_shape=jax.ShapeDtypeStruct(
            (b, cout_rows, s_total),
            jnp.bfloat16 if out_pair else (out_dtype or x.dtype)),
        grid=(b, ns + 2),
        in_specs=[
            pl.BlockSpec((1, cin, block), lambda bi, s: (bi, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 whole [Nw,Cout,Cin]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale whole
            pre_spec,
            res_spec,
            pl.BlockSpec((1, block), lambda bi, s: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout_rows, block), lambda bi, s: (bi, 0, s),
                               memory_space=pltpu.VMEM),
        compiler_params=_compiler_params(x.dtype, out_dtype, use_pre or use_res
                                         if (in_pair or out_pair) else False),
        interpret=_interpret(),
    )(x, w1, bias, out_scale, pre, res, mask)
    return out
