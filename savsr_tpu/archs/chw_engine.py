"""CHW serving engine for the alignment chain (eval-only).

Runs WindowUnit_l1 (reference lbasicsr/archs/savsr_arch.py:418-464) entirely
in the flat-padded CHW layout of ``ops/pallas/chw_conv`` — every 3x3/1x1
conv is a Pallas kernel whose bias/LeakyReLU/residual epilogue is fused, and
the OSConv2d attentions (ca/fa/sa/ka) are folded into the per-sample
aggregated weight before it ships to the MXU, so activations go straight
through ``y = W'x`` with no input pre-scaling pass.

Layout boundaries: NHWC -> CHW at window entry (3 small frame tensors +
h_past), CHW -> NHWC at the merge output. All intermediate features stay
flat-padded CHW; channel concats are contiguous axis-1 block copies (the
NHWC last-axis concats they replace were a measured 23.7 ms/forward copy
hotspot, PERF.md).

Engine gating: ``SAVSRConfig.conv_engine = "chw"`` and eval mode only — the
Pallas kernels have no custom_vjp (training keeps the XLA NHWC forms whose
backwards XLA schedules well). Numerics match the XLA engine to f32
round-off; the serving path runs bf16 (full-size f32 blows the 16MB VMEM
budget at 720p for the 192-input-channel convs).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..ops.pallas.chw_conv import (
    _round_up,
    chw_to_nhwc,
    conv1x1_chw,
    conv3x3_chw,
    conv3x3_chw_parts,
    nhwc_to_chw,
    pack_w3,
)

# leaky_relu(0.2) in the kernels' abs form a*x + b*|x|
LRELU = (0.6, 0.4)

# widest Cin a single kernel call may take: the 720p im2col slab for
# Cin=320 exceeds the 16MB VMEM budget; wider convs chain Cin-chunks
# through the pre_add epilogue (conv3x3_chw_parts). f32 slabs are twice
# the size, so the f32 (quality-eval) path chunks at 128.
def _max_cin(dtype) -> int:
    return 192 if jnp.dtype(dtype).itemsize <= 2 else 128


# ---------------------------------------------------------------------------
# split-precision convs (Ctx.split_conv / SAVSRConfig.conv_precision="split")
#
# Each conv contracts bf16 hi/lo halves: with x = hi + lo (hi = bf16(x),
# lo = bf16(x - hi)) and likewise for W,
#   W @ x  ~=  Whi@Xhi + Whi@Xlo + Wlo@Xhi        (the lo*lo term is
# ~2^-16 relative and is dropped — the classic 3-pass bf16 f32-emulation).
# Stacking channels as X' = [Xhi; Xlo; Xhi] and W' = [Whi, Whi, Wlo] turns
# the three passes into ONE bf16 contraction over 3*Cin channels (each
# 64-channel chunk becomes exactly the measured-optimal 192-channel bf16
# slab), with the kernels' f32 accumulate as the carry precision.
#
# PAIR CARRIES: features travel between convs as bf16 [B, 2C, S] hi/lo
# pairs (``pc``-chunk interleaved, see _pc) — the kernel epilogue splits
# its f32 result once (_pair_out) and the next conv's im2col duplicates
# the hi block in VMEM (in_pair), so the XLA-side decompose/concat pass
# that the first-generation split tier paid per conv (~25 ms/720p window)
# disappears, and conv HBM traffic drops from 3C to 2C bf16 channels.
# f32 inputs (the 3/6-channel window entries) still pre-split in XLA via
# _split_x. Non-conv consumers (RCAB attention, OSAdapt mask head, the
# STAU boundary) reconstruct hi + lo in f32 — pair_merge.
# Accuracy: ~2^-16 relative per conv vs bf16's ~2^-8 and f32's ~2^-24 —
# measured full-model deviation in tests/PERF.md.
# ---------------------------------------------------------------------------

_SPLIT_CIN = 64  # pre-split chunk width: 3*64 = 192-channel bf16 slabs


def _is_split(ctx, x) -> bool:
    return getattr(ctx, "split_conv", False)


def _is_pair(ctx, x) -> bool:
    """Pair-carried feature: split tier + bf16 (f32 tensors are raw
    window entries / masks that pre-split in XLA instead)."""
    return getattr(ctx, "split_conv", False) and x.dtype == jnp.bfloat16


def model_pc(num_feat: int) -> int:
    """The model-wide pair-chunk width (Ctx.pair_pc): pair channels
    interleave hi/lo in chunks of this width. It must be ONE constant for
    the whole model so channel CONCATS of pair tensors stay pair tensors
    with the same layout — every feature width here is a multiple of
    num_feat, so min(64, num_feat) always divides every tensor."""
    if num_feat % 64 == 0:
        return 64
    assert num_feat <= 64, (
        f"pair layout needs num_feat % 64 == 0 or num_feat <= 64, got {num_feat}")
    return num_feat


def pair_split(x: jnp.ndarray, pc: int) -> jnp.ndarray:
    """f32 [B, C, S] -> bf16 [B, 2C, S] pair channels ([hi; lo] per
    pc-chunk). XLA-side — used at elementwise re-split sites only; conv
    outputs split in-kernel (_pair_out)."""
    b, c, s = x.shape
    n = c // pc
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y = jnp.concatenate(
        [hi.reshape(b, n, 1, pc, s), lo.reshape(b, n, 1, pc, s)], axis=2
    )
    return y.reshape(b, 2 * c, s)


def pair_merge(xp: jnp.ndarray, pc: int) -> jnp.ndarray:
    """bf16 [B, 2C, S] pair channels -> f32 [B, C, S] (hi + lo)."""
    b, c2, s = xp.shape
    c = c2 // 2
    v = xp.reshape(b, c // pc, 2, pc, s).astype(jnp.float32)
    return (v[:, :, 0] + v[:, :, 1]).reshape(b, c, s)


def _pair_sum_s(xp: jnp.ndarray, pc: int) -> jnp.ndarray:
    """Spatial sum of a pair tensor -> f32 [B, C] (hi-sum + lo-sum) —
    equals the sum of the f32 values the convs see."""
    b, c2, _ = xp.shape
    c = c2 // 2
    s = xp.sum(axis=2, dtype=jnp.float32)  # [B, 2C]
    v = s.reshape(b, c // pc, 2, pc)
    return (v[:, :, 0] + v[:, :, 1]).reshape(b, c)


def _split_x(x: jnp.ndarray) -> jnp.ndarray:
    """f32 [B, C, S] -> bf16 [B, 3C, S] stacked [hi, lo, hi] (XLA pre-split
    for raw f32 entries; pair carries skip this — the kernel does it)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo, hi], axis=1)


def _split_w(w: jnp.ndarray) -> jnp.ndarray:
    """f32 [..., Ci, Co] -> f32 [..., 3Ci, Co] stacked [Whi, Whi, Wlo];
    values are bf16-representable so the pack-time bf16 cast is exact."""
    hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    lo = w - hi
    return jnp.concatenate([hi, hi, lo], axis=-2)


def _pack_split_w3(wt_c: jnp.ndarray, b: int) -> jnp.ndarray:
    """Split-stack + pack one 3x3 weight chunk (static [3,3,ci,co] or
    per-sample [B,3,3,ci,co]) for the bf16 3-pass contraction."""
    wt_c = _split_w(wt_c)
    if wt_c.ndim == 5:
        return _per_batch(pack_w3_batched(wt_c), b).astype(jnp.bfloat16)
    return pack_w3(wt_c).astype(jnp.bfloat16)


def _split_chunks(ctx, wt: jnp.ndarray, parts: List[jnp.ndarray], b: int):
    """(weight over concat(parts), parts) -> per-chunk kernel operands
    (xs, w3s, in_pairs). Pair-carried parts slice into contiguous
    [2*pc]-row chunks consumed in-kernel (in_pair); raw f32 parts
    pre-split in XLA (_split_x). Weight chunks pack [Whi, Whi, Wlo]."""
    xs, w3s, in_pairs = [], [], []
    off = 0  # logical channel offset into wt's Cin axis
    for p in parts:
        if _is_pair(ctx, p):
            c = p.shape[1] // 2
            pc = ctx.pair_pc
            for j in range(c // pc):
                xs.append(p if c == pc else p[:, 2 * pc * j : 2 * pc * (j + 1)])
                w3s.append(_pack_split_w3(
                    wt[..., off + pc * j : off + pc * (j + 1), :], b))
                in_pairs.append(True)
            off += c
        else:
            c = p.shape[1]
            for lo_c in range(0, c, _SPLIT_CIN):
                hi_c = min(lo_c + _SPLIT_CIN, c)
                chunk = p[:, lo_c:hi_c] if (lo_c, hi_c) != (0, c) else p
                xs.append(_split_x(chunk))
                w3s.append(_pack_split_w3(wt[..., off + lo_c : off + hi_c, :], b))
                in_pairs.append(False)
            off += c
    return xs, w3s, in_pairs


def _group_parts(parts: List[jnp.ndarray], max_cin: int = None):
    """Greedily group channel parts into chunks of total C <= max_cin.
    Returns (chunked inputs, per-chunk channel offsets/sizes)."""
    if max_cin is None:
        max_cin = _max_cin(parts[0].dtype)
    groups, cur, cur_c = [], [], 0
    for p in parts:
        c = p.shape[1]
        if cur and cur_c + c > max_cin:
            groups.append(cur)
            cur, cur_c = [], 0
        cur.append(p)
        cur_c += c
    groups.append(cur)
    xs, spans, off = [], [], 0
    for g in groups:
        c = sum(p.shape[1] for p in g)
        xs.append(g[0] if len(g) == 1 else jnp.concatenate(g, axis=1))
        spans.append((off, c))
        off += c
    return xs, spans


def pack_w3_batched(w_bklio: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, 3, Cin, Cout] per-sample HWIO banks -> [B, 3*Cout, Kp]
    dy-major (matching pack_w3's stacked-M layout)."""
    b, _, _, ci, co = w_bklio.shape
    w3 = jnp.transpose(w_bklio, (0, 1, 4, 2, 3)).reshape(b, 3 * co, 3 * ci)
    kp = _round_up(3 * ci, 128)
    return jnp.pad(w3, ((0, 0), (0, 0), (0, kp - 3 * ci)))


def _mask(ctx):
    return None if ctx.bucket is None else ctx.bucket["mask_lr"]


# Paired-chain support: a ``name``/``prefix`` may be a TUPLE of parameter
# prefixes (e.g. ("f2p_win...", "p2f_win...")). The inputs then carry the
# chains stacked chain-major on the batch axis and every conv runs ONCE
# with per-sample (per-chain) weights/biases — halving kernel launches on
# the bidirectional alignment scan (VERDICT r2 #1).


def _is_paired(name) -> bool:
    return isinstance(name, (tuple, list))


def _sub_name(name, suffix: str):
    if _is_paired(name):
        return tuple(f"{n}{suffix}" for n in name)
    return f"{name}{suffix}"


def _wparam(ctx, name, suffix: str = "weight"):
    """[3,3,Ci,Co] (single) or [P,3,3,Ci,Co] (paired, stacked)."""
    if _is_paired(name):
        return jnp.stack([ctx[f"{n}.{suffix}"] for n in name])
    return ctx[f"{name}.{suffix}"]


def _per_batch(arr, b: int):
    """Tile a [P, ...] per-chain operand to the [B] chain-major batch."""
    p = arr.shape[0]
    if p == b:
        return arr
    assert b % p == 0
    return jnp.repeat(arr, b // p, axis=0)


def conv3_cat(ctx, name, parts: List[jnp.ndarray], h: int, w: int,
              lrelu=LRELU, residual=None, out="pair") -> jnp.ndarray:
    """conv3x3(concat(parts)) with automatic Cin chunking. In split mode
    the result is PAIR-carried (``out="pair"``); boundary consumers pass
    ``out="f32"`` to keep the f32 accumulator instead."""
    b = parts[0].shape[0]
    wt = _wparam(ctx, name)
    if _is_split(ctx, parts[0]):
        xs, w3s, in_pairs = _split_chunks(ctx, wt, parts, b)
        cout = wt.shape[-1]
        return conv3x3_chw_parts(
            xs, w3s, _bias_col(ctx, name, cout, b), _ones(cout), residual,
            h=h, w=w, lrelu=lrelu, mask=_mask(ctx),
            out_dtype=jnp.float32, in_pairs=in_pairs,
            out_pair=out == "pair", res_pair=residual is not None,
            pc=ctx.pair_pc,
        )
    xs, spans = _group_parts(parts)
    dtype = parts[0].dtype
    if wt.ndim == 5:
        w3s = [_per_batch(pack_w3_batched(wt[..., off : off + c, :]), b)
               .astype(dtype) for off, c in spans]
    else:
        w3s = [pack_w3(wt[:, :, off : off + c, :]).astype(dtype)
               for off, c in spans]
    cout = wt.shape[-1]
    return conv3x3_chw_parts(xs, w3s, _bias_col(ctx, name, cout, b),
                             _ones(cout), residual, h=h, w=w, lrelu=lrelu,
                             mask=_mask(ctx))


def _bias_col(ctx, name, cout: int, b: int = 1) -> jnp.ndarray:
    if _is_paired(name):
        cols = [ctx.params.get(f"{n}.bias") for n in name]
        if all(c is None for c in cols):
            return jnp.zeros((cout, 1), jnp.float32)
        stacked = jnp.stack([
            jnp.zeros((cout,), jnp.float32) if c is None else c.astype(jnp.float32)
            for c in cols
        ]).reshape(len(name), cout, 1)
        return _per_batch(stacked, b)
    bias = ctx.params.get(f"{name}.bias")
    if bias is None:
        return jnp.zeros((cout, 1), jnp.float32)
    return bias.astype(jnp.float32).reshape(cout, 1)


def _ones(cout: int) -> jnp.ndarray:
    return jnp.ones((cout, 1), jnp.float32)


def _pad_cin(x: jnp.ndarray, mult: int = 8) -> jnp.ndarray:
    """Pad the channel axis of a CHW tensor up to a sublane multiple —
    Mosaic cannot DMA-slice sub-sublane channel counts (the 3/6-channel
    window inputs)."""
    c = x.shape[1]
    pad = (-c) % mult
    return x if pad == 0 else jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def conv3(ctx, name, x, h: int, w: int, lrelu=LRELU, residual=None,
          pre_add=None, out="pair") -> jnp.ndarray:
    """Named-parameter 3x3 conv on a flat-padded CHW tensor. ``x`` may
    carry zero-padded extra channels (matching zero weight rows are added;
    raw f32 entries only — pair carries are exact-width by construction)."""
    b = x.shape[0]
    wt = _wparam(ctx, name)
    ci = wt.shape[-2]
    if x.shape[1] > ci and not _is_pair(ctx, x):
        pad = [(0, 0)] * wt.ndim
        pad[-2] = (0, x.shape[1] - ci)
        wt = jnp.pad(wt, pad)
    if _is_split(ctx, x):
        xs, w3s, in_pairs = _split_chunks(ctx, wt, [x], b)
        cout = wt.shape[-1]
        return conv3x3_chw_parts(
            xs, w3s, _bias_col(ctx, name, cout, b), _ones(cout), residual,
            h=h, w=w, lrelu=lrelu, pre_add=pre_add, mask=_mask(ctx),
            out_dtype=jnp.float32, in_pairs=in_pairs,
            out_pair=out == "pair", res_pair=residual is not None,
            pc=ctx.pair_pc,
        )
    if wt.ndim == 5:
        w3 = _per_batch(pack_w3_batched(wt), b).astype(x.dtype)
        cout = w3.shape[1] // 3
    else:
        w3 = pack_w3(wt).astype(x.dtype)
        cout = w3.shape[0] // 3
    return conv3x3_chw(x, w3, _bias_col(ctx, name, cout, b), _ones(cout),
                       pre_add, residual, h=h, w=w, lrelu=lrelu,
                       mask=_mask(ctx))


def _pack_w1_pair(w_io: jnp.ndarray, pc: int) -> jnp.ndarray:
    """1x1 weight core [..., I, O] f32 -> [..., O, 3I] bf16 with per
    pc-chunk [Whi, Whi, Wlo] K-blocks, matching the kernel's pair-in
    two-dot contraction (conv1x1_chw in_pair)."""
    ci = w_io.shape[-2]
    hi = w_io.astype(jnp.bfloat16).astype(jnp.float32)
    lo = w_io - hi
    blocks = []
    for j in range(ci // pc):
        sl = slice(pc * j, pc * (j + 1))
        blocks += [hi[..., sl, :], hi[..., sl, :], lo[..., sl, :]]
    wk = jnp.concatenate(blocks, axis=-2)  # [..., 3I, O]
    return jnp.swapaxes(wk, -1, -2).astype(jnp.bfloat16)


def conv1(ctx, name, x, h: int, w: int, lrelu=LRELU, residual=None,
          pre_add=None, out="pair") -> jnp.ndarray:
    """Named-parameter 1x1 conv. ``x`` may be a list of channel parts
    standing for concat(parts, C) — required in split mode so the pair
    chunk width comes from the parts, not the concatenated width."""
    parts = x if isinstance(x, list) else [x]
    b = parts[0].shape[0]
    wt = _wparam(ctx, name)
    out_dtype = None
    in_pair = False
    pc = 64
    if _is_split(ctx, parts[0]):
        out_dtype = jnp.float32
        if _is_pair(ctx, parts[0]):
            # all parts pair-carried with one chunk width: ONE kernel call
            # over the concatenated pairs, weights packed per pc-chunk
            pc = ctx.pair_pc
            assert all((p.shape[1] // 2) % pc == 0 for p in parts), (
                [p.shape for p in parts], pc)
            in_pair = True
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            if wt.ndim == 5:
                w1 = _per_batch(_pack_w1_pair(wt[:, 0, 0], pc), b)
            else:
                w1 = _pack_w1_pair(wt[0, 0], pc)
            cout = w1.shape[-2]
            return conv1x1_chw(
                x, w1, _bias_col(ctx, name, cout, b), _ones(cout),
                pre_add, residual, h=h, w=w, lrelu=lrelu, mask=_mask(ctx),
                out_dtype=out_dtype, in_pair=True,
                out_pair=out == "pair", res_pair=residual is not None,
                pc=pc,
            )
        # raw f32 input: XLA pre-split (1x1 needs no Cin chunking — the
        # [3Ci, block] VMEM block stays under budget even at 320 -> 960)
        x = _split_x(parts[0] if len(parts) == 1
                     else jnp.concatenate(parts, axis=1))
        wt = _split_w(wt)
        cout = wt.shape[-1]
        if wt.ndim == 5:
            w1 = _per_batch(jnp.transpose(wt[:, 0, 0], (0, 2, 1)), b).astype(x.dtype)
        else:
            w1 = wt[0, 0].T.astype(x.dtype)
        return conv1x1_chw(
            x, w1, _bias_col(ctx, name, cout, b), _ones(cout),
            pre_add, residual, h=h, w=w, lrelu=lrelu, mask=_mask(ctx),
            out_dtype=out_dtype, out_pair=out == "pair",
            res_pair=residual is not None, pc=ctx.pair_pc,
        )
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if wt.ndim == 5:  # [P,1,1,I,O] -> per-sample [B,O,I]
        w1 = _per_batch(jnp.transpose(wt[:, 0, 0], (0, 2, 1)), b).astype(x.dtype)
        cout = w1.shape[1]
    else:
        w1 = wt[0, 0].T.astype(x.dtype)  # HWIO -> [O, I]
        cout = w1.shape[0]
    return conv1x1_chw(x, w1, _bias_col(ctx, name, cout, b), _ones(cout),
                       pre_add, residual, h=h, w=w, lrelu=lrelu,
                       mask=_mask(ctx), out_dtype=out_dtype)


def osconv_agg(ctx, prefix: str, parts: List[jnp.ndarray], scale, h: int,
               w: int) -> jnp.ndarray:
    """Per-sample aggregated OSConv weight with all four attentions folded.

    The reference applies ca to the input, (ka, sa) to the weight bank and
    fa to the output (savsr_arch.py:139-172); all four are linear scalings,
    so they fold into one aggregated weight W'[b,dy,dx,ci,co] =
    ka-sum(sa * W) * ca[ci] * fa[co]. The fold runs in f32 on [B,3,3,Ci,Co]
    (<2 MB) and casts once at pack time — numerically kinder than scaling
    bf16 activations.
    """
    from .savsr_arch import osconv_attention

    dtype = parts[0].dtype
    # pads are zero by construction, so the valid-pixel mean is sum/(h*w)
    # (under bucketed eval the true pixel count is an operand)
    inv_hw = (ctx.bucket["inv_hw"] if ctx.bucket is not None
              else jnp.float32(1.0 / (h * w)))
    gap = jnp.concatenate(
        [(_pair_sum_s(p, ctx.pair_pc) if _is_pair(ctx, p)
          else p.sum(axis=2, dtype=jnp.float32)) * inv_hw for p in parts],
        axis=1,
    ).astype(jnp.float32 if _is_split(ctx, parts[0]) else dtype)
    ca, fa, sa, ka = osconv_attention(ctx, prefix, gap, scale, kernel_size=3)

    wbank = ctx[f"{prefix}weight"]  # [K, 3, 3, I, O] f32
    agg = jnp.einsum("bK,Kklio->bklio", ka.astype(jnp.float32), wbank)
    if sa is not None:
        agg = agg * sa.astype(jnp.float32)[:, :, :, None, None]
    agg = agg * ca.astype(jnp.float32)[:, None, None, :, None]
    if fa is not None:
        agg = agg * fa.astype(jnp.float32)[:, None, None, None, :]
    return agg


def osconv_chw(ctx, prefix, parts: List[jnp.ndarray], scale, h: int,
               w: int, lrelu=None) -> jnp.ndarray:
    """OSConv2d on CHW parts: attention-folded per-sample weight, Cin
    chunked to the VMEM budget. A tuple ``prefix`` runs the paired chains:
    the tiny attention MLPs run per chain (XLA, [1,C] vectors); only the
    aggregated-weight conv — the hot part — is batched."""
    dtype = parts[0].dtype
    if _is_paired(prefix):
        bp = parts[0].shape[0] // len(prefix)
        agg = jnp.concatenate([
            osconv_agg(ctx, pfx, [p[j * bp : (j + 1) * bp] for p in parts],
                       scale, h, w)
            for j, pfx in enumerate(prefix)
        ], axis=0)
    else:
        agg = osconv_agg(ctx, prefix, parts, scale, h, w)
    cout = agg.shape[-1]
    if _is_split(ctx, parts[0]):
        # agg's batch dim already matches the (possibly chain-stacked) parts
        xs, w3s, in_pairs = _split_chunks(ctx, agg, parts, parts[0].shape[0])
        return conv3x3_chw_parts(xs, w3s, jnp.zeros((cout, 1), jnp.float32),
                                 _ones(cout), None, h=h, w=w, lrelu=lrelu,
                                 mask=_mask(ctx), out_dtype=jnp.float32,
                                 in_pairs=in_pairs, out_pair=True,
                                 pc=ctx.pair_pc)
    xs, spans = _group_parts(parts)
    w3s = [pack_w3_batched(agg[:, :, :, off : off + c, :]).astype(dtype)
           for off, c in spans]
    return conv3x3_chw_parts(xs, w3s, jnp.zeros((cout, 1), jnp.float32),
                             _ones(cout), None, h=h, w=w, lrelu=lrelu,
                             mask=_mask(ctx))


def residual_block_chw(ctx, prefix: str, feats: List[jnp.ndarray], scale,
                       use_osconv: bool, h: int, w: int) -> List[jnp.ndarray]:
    """ResidualBlock (reference savsr_arch.py:379-415) on CHW features.

    (Measured dead end, kept for the record: stacking the three conv2 base
    halves into one cout=3C conv doubles M-utilization but adds a
    [3C, S] HBM round trip per block — 62.6 vs 58.4 ms/window on chip, so
    the concat form below stays.)"""
    n = len(feats)
    x1 = [conv3(ctx, _sub_name(prefix, f"conv0.{i}"), feats[i], h, w)
          for i in range(n)]
    if use_osconv:
        base = osconv_chw(ctx, _sub_name(prefix, "osconv."), x1, scale, h, w,
                          lrelu=LRELU)
    else:
        base = conv1(ctx, _sub_name(prefix, "conv1"), x1, h, w)
    out = []
    for i in range(n):
        y = conv3(ctx, _sub_name(prefix, f"conv2.{i}"),
                  jnp.concatenate([base, x1[i]], axis=1), h, w,
                  residual=feats[i])
        out.append(y)
    return out


def window_l2_apply_chw(ctx, prefix: str, feats: List[jnp.ndarray], scale,
                        win_size: int, slid_win: int, num_block: int = 2,
                        hw=None) -> List[jnp.ndarray]:
    """WindowUnit_l2 (reference savsr_arch.py:467-501) on the CHW engine.
    feats: hidden-state pairs, NHWC [B, H, W, 2C] or flat-padded CHW
    [B, 2C, S] (then ``hw`` gives the image size). Output layout matches
    the input layout."""
    chw_in = feats[0].ndim == 3
    if chw_in:
        h, w = hw
    else:
        h, w = feats[0].shape[1:3]
        feats = [nhwc_to_chw(f) for f in feats]
    h_feat = [
        conv3(ctx, f"{prefix}conv_h.{i}", feats[i], h, w)
        for i in range(win_size)
    ]
    out = h_feat if len(h_feat) == 1 else []
    for i in range(win_size - slid_win + 1):
        sw = h_feat[i : i + slid_win]
        for bi in range(num_block):
            sw = residual_block_chw(ctx, f"{prefix}blocks.{bi}.", sw, scale,
                                    use_osconv=True, h=h, w=w)
        out.append(conv3_cat(ctx, f"{prefix}merge", sw, h, w, lrelu=None))
    if chw_in:
        return out
    return [chw_to_nhwc(pair_merge(o, ctx.pair_pc) if _is_pair(ctx, o)
                        else o, h, w) for o in out]


def rcab_chw(ctx, prefix: str, x, h: int, w: int) -> jnp.ndarray:
    """Residual channel-attention block (reference rcan RCAB) on CHW."""
    from .savsr_arch import _fc1x1
    from .arch_util import sigmoid

    y = conv3(ctx, f"{prefix}rcab.0", x, h, w, lrelu=(0.5, 0.5))  # relu
    y = conv3(ctx, f"{prefix}rcab.2", y, h, w, lrelu=None)
    # channel-attention GAP over the TRUE pixel count: under bucketed eval
    # (h, w) is the bucket canvas, so the divisor must be the operand
    # inv_hw (same rule as osconv_agg) or the attention input scales with
    # the bucket's slack.
    inv_hw = (ctx.bucket["inv_hw"] if ctx.bucket is not None
              else jnp.float32(1.0 / (h * w)))
    if _is_pair(ctx, y):
        pc = ctx.pair_pc
        a = _pair_sum_s(y, pc) * inv_hw
        a = jnp.maximum(_fc1x1(ctx, f"{prefix}rcab.3.attention.1", a), 0)
        a = sigmoid(_fc1x1(ctx, f"{prefix}rcab.3.attention.3", a))
        # pair re-split site: the channel scale + residual add run on the
        # reconstructed f32 values (one fused XLA elementwise pass)
        return pair_split(pair_merge(y, pc) * a[:, :, None]
                          + pair_merge(x, pc), pc)
    a = (y.sum(axis=2, dtype=jnp.float32) * inv_hw).astype(y.dtype)
    a = jnp.maximum(_fc1x1(ctx, f"{prefix}rcab.3.attention.1", a), 0)
    a = sigmoid(_fc1x1(ctx, f"{prefix}rcab.3.attention.3", a))
    return y * a[:, :, None] + x


def residual_group_chw(ctx, prefix: str, x, num_block: int, h: int,
                       w: int) -> jnp.ndarray:
    from .savsr_arch import _sub_ctx, stack_prefix_params

    stacked = stack_prefix_params(
        ctx.params, [f"{prefix}residual_group.{i}." for i in range(num_block)]
    )

    def body(y, p):
        return rcab_chw(_sub_ctx(ctx, p), "", y, h, w), None

    y, _ = jax.lax.scan(body, x, stacked)
    return conv3(ctx, f"{prefix}conv", y, h, w, lrelu=None, residual=x)


def _osadapt_mask_bucketed(ctx, prefix: str, x_nhwc) -> jnp.ndarray:
    """OSAdapt mask head on a bucketed canvas (reference savsr_arch.py:
    190-205). Each BN/activation makes the invalid region nonzero, and the
    next 3x3 conv would bleed it one row into the valid region, so the
    canvas is re-masked after every stage; the stride-2 pool and bilinear
    2x upsample become matmuls against true-size operand matrices (exact —
    the edge clamp of the upsample lives in the matrix)."""
    from .arch_util import batch_norm, conv2d, sigmoid

    b = ctx.bucket
    m2 = b["m2d"].astype(x_nhwc.dtype)
    m2h = b["m2d_half"].astype(x_nhwc.dtype)
    m = jax.nn.relu(batch_norm(ctx, f"{prefix}mask.1",
                               conv2d(ctx, f"{prefix}mask.0", x_nhwc, padding=1))) * m2
    m = jnp.einsum("Hh,bhwc->bHwc", b["pool_row"].astype(m.dtype), m)
    m = jnp.einsum("Ww,bhwc->bhWc", b["pool_col"].astype(m.dtype), m)
    m = jax.nn.relu(batch_norm(ctx, f"{prefix}mask.5",
                               conv2d(ctx, f"{prefix}mask.4", m, padding=1))) * m2h
    m = jax.nn.relu(batch_norm(ctx, f"{prefix}mask.8",
                               conv2d(ctx, f"{prefix}mask.7", m, padding=1))) * m2h
    m = jnp.einsum("Hh,bhwc->bHwc", b["up_row"].astype(m.dtype), m)
    m = jnp.einsum("Ww,bhwc->bhWc", b["up_col"].astype(m.dtype), m)
    m = sigmoid(batch_norm(ctx, f"{prefix}mask.12",
                           conv2d(ctx, f"{prefix}mask.11", m, padding=1)))
    return m * m2


def osadapt_chw(ctx, prefix: str, x, scale, h: int, w: int) -> jnp.ndarray:
    """OSAdapt on CHW: the tiny mask head stays NHWC/XLA (16-channel convs
    with BN + stride-2 pool don't fit the flat-offset convention); the
    64-channel adapt OSConv runs on the Pallas kernel.

    In split mode the result is returned as f32 (NOT pair-carried): the
    trunk loop fuses the ``+ gamma * share`` add into the same elementwise
    pass before re-splitting — one pair round trip per group, not two."""
    pair = _is_pair(ctx, x)
    xf = pair_merge(x, ctx.pair_pc) if pair else x
    if ctx.bucket is not None:
        m = _osadapt_mask_bucketed(ctx, prefix, chw_to_nhwc(xf, h, w))
    else:
        from .savsr_arch import osadapt_mask

        m = osadapt_mask(ctx, prefix, chw_to_nhwc(xf, h, w))  # [B, H, W, 1]
    adapted = osconv_chw(ctx, f"{prefix}adapt.", [x], scale, h, w)
    if pair:
        return xf + pair_merge(adapted, ctx.pair_pc) * nhwc_to_chw(m)
    return x + adapted * nhwc_to_chw(m)


def trunk_apply_chw(ctx, h_feat, scale, n_resgroups: int, n_resblocks: int,
                    hw=None):
    """h_win_conv_h + RCAN trunk with OSAdapt residual adapters (reference
    savsr_arch.py:692-706) on CHW. h_feat: NHWC [B, H, W, 2C] or CHW
    [B, 2C, S] with ``hw``; returns (h_feat, align_feat) NHWC."""
    if h_feat.ndim == 3:
        h, w = hw
    else:
        h, w = h_feat.shape[1:3]
        h_feat = nhwc_to_chw(h_feat)
    from .savsr_arch import _sub_ctx, stack_prefix_params

    x = conv3(ctx, "h_win_conv_h", h_feat, h, w)
    share = x
    pair = _is_pair(ctx, x)
    share_f = pair_merge(share, ctx.pair_pc) if pair else share
    gamma = ctx["gamma"].astype(jnp.float32 if pair else x.dtype)
    rg = stack_prefix_params(ctx.params, [f"RG.{i}." for i in range(n_resgroups)])
    ad = stack_prefix_params(ctx.params, [f"adapt.{i}." for i in range(n_resgroups)])

    def gbody(xc, leaves):
        rg_p, ad_p = leaves
        g = residual_group_chw(_sub_ctx(ctx, rg_p), "", xc, n_resblocks, h, w)
        g = osadapt_chw(_sub_ctx(ctx, ad_p), "", g, scale, h, w)
        # pair mode: osadapt returned f32; fold the share add into the same
        # elementwise pass and re-split once per group
        if pair:
            return pair_split(g + gamma * share_f, ctx.pair_pc), None
        return g + gamma * share, None

    x, _ = jax.lax.scan(gbody, x, (rg, ad))
    x = conv3(ctx, "conv_last", x, h, w, lrelu=None, residual=share,
              out="f32")
    return chw_to_nhwc(x, h, w), chw_to_nhwc(share_f, h, w)


def window_l1_apply_chw(ctx, prefix, x, h_past, scale,
                        num_block: int = 4, out_chw: bool = False) -> jnp.ndarray:
    """WindowUnit_l1 on the CHW engine. x: [B, T=3, H, W, C_in] NHWC window;
    h_past: [B, H, W, C] NHWC or flat-padded CHW [B, C, S] (the eval scan
    carries CHW so hidden states never round-trip through NHWC).

    A tuple ``prefix`` (("f2p_win.", "p2f_win.")) runs BOTH alignment
    chains in one pass: x/h_past carry the chains stacked chain-major on
    the batch axis and every conv runs once with per-chain weights."""
    b, t, h, w, _ = x.shape
    x_c = _pad_cin(nhwc_to_chw(x[:, t // 2]))
    sup = jnp.concatenate([x[:, i] for i in range(t) if i != t // 2], axis=-1)
    x_sup = _pad_cin(nhwc_to_chw(sup))
    if h_past.ndim == 4:
        h_past = nhwc_to_chw(h_past)
    feats = [
        conv3(ctx, _sub_name(prefix, "conv_c"), x_c, h, w),
        conv3(ctx, _sub_name(prefix, "conv_sup"), x_sup, h, w),
        h_past,
    ]
    for i in range(num_block):
        feats = residual_block_chw(ctx, _sub_name(prefix, f"blocks.{i}."),
                                   feats, scale, use_osconv=(i >= 1), h=h, w=w)
    merged = conv3_cat(ctx, _sub_name(prefix, "merge"), feats, h, w, lrelu=None)
    if out_chw:
        return merged
    if _is_pair(ctx, merged):
        merged = pair_merge(merged, ctx.pair_pc)
    return chw_to_nhwc(merged, h, w)
