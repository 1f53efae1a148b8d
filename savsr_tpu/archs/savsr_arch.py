"""SAVSR: arbitrary-scale video super-resolution network, TPU-native.

Functional JAX reimplementation of the reference architecture
(lbasicsr/archs/savsr_arch.py:574-742), NHWC layout, flat parameter dicts
whose keys mirror the torch state_dict (so savsr_tpu/utils/convert.py is a
pure layout transpose). The scale ``(sh, sw)`` is a static Python tuple —
the jit cache is keyed on (input shape, scale), mirroring the reference's
``set_scale`` host-side conditioning.

Structure (reference anchors):
  ScaleAttention  — savsr_arch.py:16-96   (omni-dimensional attentions)
  OSConv2d        — savsr_arch.py:99-183  (scale-conditioned dynamic conv)
  OSAdapt         — savsr_arch.py:186-214 (masked scale-adaptive residual)
  STAUpsample     — savsr_arch.py:217-376 (spatio-temporal arbitrary upsample)
  ResidualBlock   — savsr_arch.py:379-415 (multi-frame residual block)
  WindowUnit_l1/2 — savsr_arch.py:418-501 (sliding-window alignment/fusion)
  RCAN trunk      — savsr_arch.py:504-571
  SAVSR           — savsr_arch.py:574-742
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.osconv import osconv_apply
from ..utils.registry import ARCH_REGISTRY
from .arch_util import (
    Ctx,
    InitCtx,
    adaptive_avg_pool_11,
    avg_pool2,
    batch_norm,
    conv2d,
    grid_sample_bilinear,
    interpolate_bilinear,
    kaiming_normal,
    leaky_relu,
    linear,
    replicate_pad_hw,
    sigmoid,
    upsample_bilinear_2x,
)

Params = Dict[str, jnp.ndarray]
Scale = Tuple[float, float]


def get_hw(h: int, w: int, scale: Scale) -> Tuple[int, int]:
    """Output size = round(h*sh), round(w*sw) — python banker's rounding,
    matching the reference's get_HW_round (savsr_arch.py:745)."""
    return round(h * scale[0]), round(w * scale[1])


def normalize_scale(scale) -> Scale:
    if isinstance(scale, (tuple, list)):
        return (float(scale[0]), float(scale[1]))
    return (float(scale), float(scale))


# ---------------------------------------------------------------------------
# ScaleAttention
# ---------------------------------------------------------------------------


def _fc1x1(ctx: Ctx, name: str, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv on a [B, C] vector == matmul with the HWIO weight's core."""
    w = ctx[f"{name}.weight"]  # [1,1,in,out]
    y = x @ w[0, 0].astype(x.dtype)
    b = ctx.params.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def scale_attention_init(
    ic: InitCtx, prefix: str, in_planes: int, out_planes: int, kernel_size: int,
    groups: int = 1, reduction: float = 0.0625, kernel_num: int = 4, min_channel: int = 16,
) -> None:
    att = max(int(in_planes * reduction), min_channel)
    ic.conv(f"{prefix}fc", 1, 1, in_planes, att, bias=False, init="kaiming_normal_fan_out")
    ic.bn(f"{prefix}bn", att)
    ic.conv(f"{prefix}channel_fc", 1, 1, att, in_planes, init="kaiming_normal_fan_out")
    if not (in_planes == groups and in_planes == out_planes):
        ic.conv(f"{prefix}filter_fc", 1, 1, att, out_planes, init="kaiming_normal_fan_out")
    if kernel_size != 1:
        ic.conv(f"{prefix}spatial_fc", 1, 1, att, kernel_size * kernel_size,
                init="kaiming_normal_fan_out")
    if kernel_num != 1:
        ic.conv(f"{prefix}kernel_fc", 1, 1, att, kernel_num, init="kaiming_normal_fan_out")
    # biases zero-init per reference _initialize_weights (savsr_arch.py:52-60)
    for head in ("channel_fc", "filter_fc", "spatial_fc", "kernel_fc"):
        k = f"{prefix}{head}.bias"
        if k in ic.params:
            ic.params[k] = jnp.zeros_like(ic.params[k])


def scale_attention_apply(
    ctx: Ctx, prefix: str, scale_vector: jnp.ndarray, kernel_size: int,
    temperature: float = 1.0,
):
    """scale_vector [B, in_planes] -> (ca [B,Cin], fa [B,Cout] | None,
    sa [B,k,k] | None, ka [B,K] | None)."""
    v = _fc1x1(ctx, f"{prefix}fc", scale_vector)
    # BatchNorm over the batch axis of a [B, C] vector (H=W=1)
    v = batch_norm(ctx, f"{prefix}bn", v, axis=(0,))
    v = jax.nn.relu(v)

    ca = sigmoid(_fc1x1(ctx, f"{prefix}channel_fc", v) / temperature)
    fa = None
    if ctx.has(f"{prefix}filter_fc.weight"):
        fa = sigmoid(_fc1x1(ctx, f"{prefix}filter_fc", v) / temperature)
    sa = None
    if ctx.has(f"{prefix}spatial_fc.weight"):
        sa = sigmoid(_fc1x1(ctx, f"{prefix}spatial_fc", v) / temperature)
        sa = sa.reshape(sa.shape[0], kernel_size, kernel_size)
    ka = None
    if ctx.has(f"{prefix}kernel_fc.weight"):
        ka = jax.nn.softmax(_fc1x1(ctx, f"{prefix}kernel_fc", v) / temperature, axis=1)
    return ca, fa, sa, ka


# ---------------------------------------------------------------------------
# OSConv2d
# ---------------------------------------------------------------------------


def osconv_init(
    ic: InitCtx, prefix: str, in_planes: int, out_planes: int, kernel_size: int,
    reduction: float = 0.0625, kernel_num: int = 8,
) -> None:
    scale_attention_init(
        ic, f"{prefix}attention.", in_planes, out_planes, kernel_size,
        reduction=reduction, kernel_num=kernel_num,
    )
    # weight bank [K, kh, kw, I, O]; torch inits each kernel kaiming_normal
    bank = jnp.stack(
        [
            kaiming_normal(ic.next_key(), (kernel_size, kernel_size, in_planes, out_planes))
            for _ in range(kernel_num)
        ]
    )
    ic.raw(f"{prefix}weight", bank)
    ic.linear(f"{prefix}scale_routing.0", in_planes + 2, in_planes * 2)
    ic.linear(f"{prefix}scale_routing.2", in_planes * 2, in_planes)


def osconv_attention(
    ctx: Ctx, prefix: str, gap: jnp.ndarray, scale: Scale, kernel_size: int,
    temperature: float = 1.0,
):
    """Scale-routed attention heads from a [B, Cin] GAP vector (reference
    forward pre-amble, savsr_arch.py:139-150). Shared by the XLA and CHW
    engines so the routing math cannot fork."""
    b, dtype = gap.shape[0], gap.dtype
    if ctx.bucket is not None:
        scale_info = jnp.tile(ctx.bucket["scale_vec"][None].astype(dtype), (b, 1))
    else:
        scale_info = jnp.tile(
            jnp.asarray([[1.0 / scale[0], 1.0 / scale[1]]], dtype=dtype), (b, 1)
        )
    r = jnp.concatenate([scale_info, gap], axis=1)
    r = jax.nn.relu(linear(ctx, f"{prefix}scale_routing.0", r))
    r = jax.nn.relu(linear(ctx, f"{prefix}scale_routing.2", r))
    return scale_attention_apply(ctx, f"{prefix}attention.", r, kernel_size, temperature)


def osconv_apply_module(
    ctx: Ctx, prefix: str, x, scale: Scale,
    stride: int = 1, padding: int = 1, impl: str = "einsum",
    temperature: float = 1.0,
) -> jnp.ndarray:
    """OSConv2d forward (reference _forward_impl_common, savsr_arch.py:139-172).

    ``x`` may be a list of channel-parts standing for ``concat(x, C)``: the
    conv then runs as a sum of per-part convs with Cin-split weights — same
    math, no concat materialization (a measured copy hotspot on TPU).
    """
    parts = x if isinstance(x, list) else [x]
    if ctx.train_engines and len(parts) > 1:
        # concat form for training: the split backward is much slower
        parts = [jnp.concatenate(parts, axis=-1)]
    b = parts[0].shape[0]
    dtype = parts[0].dtype
    weight = ctx[f"{prefix}weight"]  # [K, kh, kw, I, O]
    kernel_size = weight.shape[1]

    gap = jnp.concatenate([adaptive_avg_pool_11(p) for p in parts], axis=1)
    ca, fa, sa, ka = osconv_attention(ctx, prefix, gap, scale, kernel_size, temperature)

    if impl == "pallas":
        # fully-fused path: attentions fold into the small aggregated weight
        # inside the kernel; raw activations go straight to the MXU
        from ..ops.pallas.osconv_kernel import osconv_fused

        assert stride == 1
        x_cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return osconv_fused(
            x_cat,
            weight,
            ca,
            fa if fa is not None else jnp.ones((b, weight.shape[-1]), dtype),
            sa if sa is not None else jnp.ones((b, kernel_size, kernel_size), dtype),
            ka if ka is not None else jnp.ones((b, 1), dtype),
            padding,
        )

    # aggregate per-sample kernels: sum_K ka * (sa ⊙ W_K)
    w = weight.astype(dtype)
    if ka is not None:
        agg = jnp.einsum("bK,Kklio->bklio", ka, w)
    else:
        agg = jnp.broadcast_to(w[0][None], (b, *w.shape[1:]))
    if sa is not None:
        agg = agg * sa[:, :, :, None, None]

    if impl == "pallas_train":
        # fully-fused trainable path: ca/fa fold into the small aggregated
        # weight (scaling the weight's Cin/Cout axes == scaling conv inputs/
        # outputs), raw activations stream through the Pallas forward AND
        # backward kernels (osconv_agg_train) — no elementwise activation
        # pass, no im2col patch tensor in either direction
        from ..ops.pallas.osconv_kernel import osconv_agg_train

        assert stride == 1
        x_cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        agg = agg * ca[:, None, None, :, None]
        if fa is not None:
            agg = agg * fa[:, None, None, None, :]
        return osconv_agg_train(x_cat, agg, padding)

    y = None
    off = 0
    for p in parts:
        c = p.shape[-1]
        pc = p * ca[:, None, None, off : off + c]
        yi = osconv_apply(
            pc, agg[:, :, :, off : off + c, :], stride=stride, padding=padding, impl=impl
        )
        y = yi if y is None else y + yi
        off += c
    if fa is not None:
        y = y * fa[:, None, None, :]
    return y


# ---------------------------------------------------------------------------
# OSAdapt
# ---------------------------------------------------------------------------


def osadapt_init(ic: InitCtx, prefix: str, channels: int, ratio: int = 4) -> None:
    c2 = channels // ratio
    ic.conv(f"{prefix}mask.0", 3, 3, channels, c2)
    ic.bn(f"{prefix}mask.1", c2)
    ic.conv(f"{prefix}mask.4", 3, 3, c2, c2)
    ic.bn(f"{prefix}mask.5", c2)
    ic.conv(f"{prefix}mask.7", 3, 3, c2, c2)
    ic.bn(f"{prefix}mask.8", c2)
    ic.conv(f"{prefix}mask.11", 3, 3, c2, 1)
    ic.bn(f"{prefix}mask.12", 1)
    osconv_init(ic, f"{prefix}adapt.", channels, channels, 3)


def osadapt_mask(ctx: Ctx, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """The downsample/upsample mask head of OSAdapt (reference
    savsr_arch.py:190-205), NHWC. Shared by the XLA and CHW engines."""
    m = jax.nn.relu(batch_norm(ctx, f"{prefix}mask.1", conv2d(ctx, f"{prefix}mask.0", x, padding=1)))
    m = avg_pool2(m)
    m = jax.nn.relu(batch_norm(ctx, f"{prefix}mask.5", conv2d(ctx, f"{prefix}mask.4", m, padding=1)))
    m = jax.nn.relu(batch_norm(ctx, f"{prefix}mask.8", conv2d(ctx, f"{prefix}mask.7", m, padding=1)))
    m = upsample_bilinear_2x(m)
    return sigmoid(batch_norm(ctx, f"{prefix}mask.12", conv2d(ctx, f"{prefix}mask.11", m, padding=1)))


def osadapt_apply(ctx: Ctx, prefix: str, x: jnp.ndarray, scale: Scale,
                  impl: str = "einsum") -> jnp.ndarray:
    m = osadapt_mask(ctx, prefix, x)
    adapted = osconv_apply_module(ctx, f"{prefix}adapt.", x, scale, impl=impl)
    return x + adapted * m


# ---------------------------------------------------------------------------
# STAUpsample
# ---------------------------------------------------------------------------


def stau_init(ic: InitCtx, prefix: str, channels: int, num_experts: int = 4,
              st_ksize: int = 5) -> None:
    ic.conv(f"{prefix}kernel_conv.0", 1, 1, channels, channels * st_ksize**2)
    # experts stored as matrices: compress [n, C/8, C], expand [n, C, C/8]
    wc = jnp.stack([
        kaiming_uniform_matrix(ic.next_key(), (channels // 8, channels))
        for _ in range(num_experts)
    ])
    we = jnp.stack([
        kaiming_uniform_matrix(ic.next_key(), (channels, channels // 8))
        for _ in range(num_experts)
    ])
    ic.raw(f"{prefix}weight_compress", wc)
    ic.raw(f"{prefix}weight_expand", we)
    ic.conv(f"{prefix}body.0", 1, 1, 4, 64)
    ic.conv(f"{prefix}body.2", 1, 1, 64, 64)
    ic.conv(f"{prefix}routing.0", 1, 1, 64, num_experts)
    ic.conv(f"{prefix}offset", 1, 1, 64, 2)
    ic.conv(f"{prefix}st_offset", 1, 1, 64, 2)
    ic.conv(f"{prefix}fusion", 1, 1, 2 * channels, channels)


def kaiming_uniform_matrix(key, shape_oi):
    """kaiming_uniform(a=sqrt(5)) on an [out, in] matrix (torch 1x1-conv
    stack init for the STAU experts, savsr_arch.py:233-241)."""
    out, inp = shape_oi
    gain = math.sqrt(2.0 / (1.0 + 5.0))
    bound = gain * math.sqrt(3.0 / inp)
    return jax.random.uniform(key, shape_oi, jnp.float32, -bound, bound)


def _stau_coordinate_input(h: int, w: int, scale: Scale) -> np.ndarray:
    """Static HR coordinate embedding input [1, H, W, 4]: channels
    (1/sw, 1/sh, R(y), R(x)) — reference savsr_arch.py:326-340."""
    H, W = get_hw(h, w, scale)
    coor_h = np.arange(H, dtype=np.float32)
    coor_h = ((coor_h + 0.5) / np.float32(scale[0])) - np.floor(
        (coor_h + 0.5) / np.float32(scale[0]) + 1e-3
    ) - 0.5
    coor_w = np.arange(W, dtype=np.float32)
    coor_w = ((coor_w + 0.5) / np.float32(scale[1])) - np.floor(
        (coor_w + 0.5) / np.float32(scale[1]) + 1e-3
    ) - 0.5
    inp = np.empty((1, H, W, 4), dtype=np.float32)
    inp[..., 0] = 1.0 / scale[1]
    inp[..., 1] = 1.0 / scale[0]
    inp[..., 2] = coor_h[None, :, None]
    inp[..., 3] = coor_w[None, None, :]
    return inp


def _stau_base_grid(h: int, w: int, scale: Scale) -> np.ndarray:
    """Static HR->LR projection grid [1, H, W, 2] normalized to [-1, 1]
    (reference grid_sample, savsr_arch.py:262-282; float64 meshgrid then f32)."""
    H, W = get_hw(h, w, scale)
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    gx = (gx + 0.5) / scale[1] - 0.5
    gy = (gy + 0.5) / scale[0] - 0.5
    gx = gx * 2.0 / (w - 1) - 1.0
    gy = gy * 2.0 / (h - 1) - 1.0
    grid = np.stack([gx, gy], axis=-1).astype(np.float32)[None]
    return grid


def _stau_grid_sample(
    x: jnp.ndarray, offset: jnp.ndarray, scale: Scale, train: bool = False,
    bucket=None,
) -> jnp.ndarray:
    """grid_sample with HR->LR grid + predicted offsets (zeros padding,
    align_corners=True). Under bucketed training the base grid is an
    operand ([Hb, Wb, 2] canvas, archs/bucketed.py); x stays the TRUE LR
    shape so the offset normalization from x.shape is exact."""
    b, h, w, _ = x.shape
    if bucket is not None:
        base = bucket["base_grid"][None].astype(x.dtype)
    else:
        base = jnp.asarray(_stau_base_grid(h, w, scale), dtype=x.dtype)
    off_x = offset[..., 0:1] * (2.0 / (w - 1))
    off_y = offset[..., 1:2] * (2.0 / (h - 1))
    grid = base + jnp.concatenate([off_x, off_y], axis=-1)
    grid = jnp.broadcast_to(grid, (b, *grid.shape[1:]))
    if train:
        # the block-gather's backward (2x2-block scatter) is slow; training
        # keeps the four row gathers whose scatter-adds XLA handles well
        return grid_sample_bilinear(x, grid, align_corners=True, padding_zeros=True)
    # block-gather engine: one 2x2xC gather per output pixel (exact; ~3%
    # whole-model faster than four row gathers on v5e)
    from .arch_util import grid_sample_bilinear_blockgather

    return grid_sample_bilinear_blockgather(x, grid, align_corners=True, padding_zeros=True)


def _fill_edge_slack(x: jnp.ndarray, h_true, w_true, pad: int) -> jnp.ndarray:
    """Replicate the last TRUE row/col of a bucketed NHWC canvas into the
    next ``pad`` slack rows/cols (traced indices) — reproduces
    replicate-pad-at-the-true-edge semantics on a larger static canvas."""
    row = jax.lax.dynamic_slice_in_dim(x, h_true - 1, 1, axis=1)
    for k in range(pad):
        x = jax.lax.dynamic_update_slice_in_dim(x, row, h_true + k, axis=1)
    col = jax.lax.dynamic_slice_in_dim(x, w_true - 1, 1, axis=2)
    for k in range(pad):
        x = jax.lax.dynamic_update_slice_in_dim(x, col, w_true + k, axis=2)
    return x


def sta_conv(feat: jnp.ndarray, kernel: jnp.ndarray, st_ksize: int = 5) -> jnp.ndarray:
    """Per-pixel spatio-temporal filtering (reference sta_conv,
    savsr_arch.py:297-313): feat [B,h,w,C] filtered by per-pixel ksize^2
    kernels packed in ``kernel [B,h,w,C*k*k]`` (channel-major: c*k*k + dy*k + dx).

    Implemented as k*k shifted multiply-accumulates on the VPU — no unfold
    materialization of the [B,h,w,C,25] tensor."""
    b, h, w, c = feat.shape
    pad = (st_ksize - 1) // 2
    fp = replicate_pad_hw(feat, pad)
    k5 = kernel.reshape(b, h, w, c, st_ksize * st_ksize)
    out = jnp.zeros_like(feat)
    for dy in range(st_ksize):
        for dx in range(st_ksize):
            out = out + fp[:, dy : dy + h, dx : dx + w, :] * k5[..., dy * st_ksize + dx]
    return out


def _stau_pixel_coords(offset, scale, h, w, dtype=jnp.float32, bucket=None):
    """Unnormalized sampling coords [H, W] (fy, fx) for the fused sampler —
    the exact composition of _stau_grid_sample's normalized grid and
    grid_sample_bilinear's align_corners=True unnormalization. Under
    bucketed eval the base grid / normalization factors are operands
    (edge-padded to the bucket so per-row min/max band bounds stay tight)."""
    if bucket is not None:
        base = bucket["base_grid"].astype(dtype)
        off = offset[0].astype(dtype)
        gx = base[..., 0] + off[..., 0] * bucket["off_norm"][0]
        gy = base[..., 1] + off[..., 1] * bucket["off_norm"][1]
        # same association order as the static path: ((g+1)*0.5)*(size-1)
        fx = (gx + 1.0) * 0.5 * bucket["size_m1"][0]
        fy = (gy + 1.0) * 0.5 * bucket["size_m1"][1]
        return fy, fx
    base = jnp.asarray(_stau_base_grid(h, w, scale), dtype=dtype)[0]  # [H,W,2]
    off = offset[0].astype(dtype)
    gx = base[..., 0] + off[..., 0] * (2.0 / (w - 1))
    gy = base[..., 1] + off[..., 1] * (2.0 / (h - 1))
    fx = (gx + 1.0) * 0.5 * (w - 1)
    fy = (gy + 1.0) * 0.5 * (h - 1)
    return fy, fx


def _stau_sta_rows(ctx, prefix, x, st_feat, st_ksize, wl):
    """kernel_conv + LeakyReLU + sta_conv via the fused STA kernel
    (ops/pallas/sta_kernel.py), producing the sampler's row layout
    directly. Returns [B, h, C, Wl]."""
    from ..ops.pallas.sta_kernel import sta_conv_fused

    b, h, w, c = x.shape
    bucket = ctx.bucket
    dtype = x.dtype
    pad = (st_ksize - 1) // 2
    hp = -(-h // 8) * 8
    wl2 = wl + 128

    if bucket is not None:
        # replicate at the TRUE edge: fill the canvas slack with edge
        # replicas before the uniform edge-pad
        x = _fill_edge_slack(x, bucket["h_lr"], bucket["w_lr"], pad)
    xp = replicate_pad_hw(x, pad)  # [B, h+2p, w+2p, C]

    def rows(t, target_rows, lanes):
        t = jnp.transpose(t, (0, 1, 3, 2))
        return jnp.pad(t, ((0, 0), (0, target_rows - t.shape[1]), (0, 0),
                           (0, lanes - t.shape[3])))

    x_pad_rows = rows(xp, hp + 2 * pad, wl2)
    st_rows = rows(st_feat, hp, wl)

    kk = st_ksize * st_ksize
    wk = ctx[f"{prefix}kernel_conv.0.weight"][0, 0].T  # [C*kk (c-major), C]
    wk = wk.reshape(c, kk, c).transpose(1, 0, 2).reshape(kk * c, c)
    bias = ctx[f"{prefix}kernel_conv.0.bias"]
    bias = bias.reshape(c, kk).T.reshape(kk * c, 1).astype(jnp.float32)

    if bucket is not None:
        wb = bucket["m2d0"].shape[2]
        mcol = jnp.pad(bucket["m2d0"][0, 0, :, 0], (0, wl - wb))[None]
    else:
        mcol = jnp.asarray((np.arange(wl) < w).astype(np.float32))[None]
    out = sta_conv_fused(st_rows, x_pad_rows, wk.astype(dtype), bias, mcol,
                         ksize=st_ksize)
    return out[:, :h]


def _stau_sampler_operands(offset, st_offset, routing, scale, h, w, H, W,
                           wp, band, bucket=None):
    """Derive the fused sampler's scalar-prefetch operands (pix planes,
    per-row band starts j0, per-group union band starts g0) from the
    coordinate-head outputs. Frame-invariant (the head depends only on
    shape/scale) — precomputable via SAVSR.stau_statics."""
    from ..ops.pallas.chw_conv import _round_up
    from ..ops.pallas.stau_kernel import GROUP as _G
    from ..ops.pallas.stau_kernel import TAPS as _T

    fy_f, fx_f = _stau_pixel_coords(offset, scale, h, w, bucket=bucket)
    fy_s, fx_s = _stau_pixel_coords(st_offset, scale, h, w, bucket=bucket)
    rt = jnp.transpose(routing[0].astype(jnp.float32), (0, 2, 1))  # [H,n,W]
    planes = jnp.stack([fy_f, fx_f, fy_s, fx_s], axis=1)           # [H,4,W]
    pix = jnp.concatenate([planes, rt], axis=1)                    # [H,4+n,W]
    # the kernel processes GROUPS of G HR rows per step (one union LR band
    # per group): pad H up to a multiple of G
    HG = _round_up(H, _G)
    pix = jnp.pad(pix, ((0, HG - H), (0, 8 - pix.shape[1]), (0, wp - W)))
    pix = pix.reshape(HG // _G, _G, 8, wp)

    h_valid = h if bucket is None else bucket["h_lr"]
    taps = min(_T, band)

    def j0_of(fy):
        # window start for the kernel's static taps-row unroll: clipping to
        # h_valid - taps keeps bottom-edge rows' active band inside the
        # window (rows outside [j0, j0+taps) carry wy = 0 exactly)
        m = jnp.floor(jnp.min(fy, axis=1)).astype(jnp.int32)
        # h_valid may be a traced operand (bucketed eval)
        j0 = jnp.clip(m, 0, jnp.maximum(h_valid - taps, 0))
        # in-band rows that can carry weight: [j0, min(floor(max fy)+1, h-1)]
        top = jnp.minimum(
            jnp.floor(jnp.max(fy, axis=1)).astype(jnp.int32) + 1, h_valid - 1
        )
        jc = jnp.clip(top - j0 + 1, 1, band)
        return j0, jc

    j0f, jcf = j0_of(fy_f)
    j0s, jcs = j0_of(fy_s)
    j0 = jnp.stack([j0f, j0s, jcf, jcs], axis=1)  # [H, 4]
    if HG != H:
        # padded HR rows replicate the LAST REAL row's band (their output
        # is cropped; j0=0 would drag the last group's union band to the
        # top of the image and overflow the RG window)
        j0 = jnp.concatenate(
            [j0] + [j0[-1:].at[:, 2:].set(1)] * (HG - H), axis=0
        )
    # per-group union band start (the DMA'd window is [g0, g0+RG)); each
    # row's j0 is then clamped into the window — a no-op unless the band
    # starts spread more than G rows within one group, which needs
    # offset-head outputs jumping > G LR rows between adjacent HR rows
    # (the same magnitude assumption the per-row band R itself makes)
    RG = min(h, band + _G)
    j0g = j0.reshape(HG // _G, _G, 4)
    # clip bound is the ARRAY height h (the DMA window must stay in x_rows;
    # under bucketed eval h_valid < h and rows j0 <= h_valid-band always
    # land inside [g0, g0+RG) for either clip branch)
    g0 = jnp.clip(jnp.min(j0g[:, :, :2], axis=1), 0, h - RG)  # [ng, 2]
    g0r = jnp.repeat(g0, _G, axis=0)  # [HG, 2]
    j0 = jnp.concatenate(
        [jnp.clip(j0[:, :2], g0r, g0r + (RG - taps)), j0[:, 2:]], axis=1
    )
    return pix, j0, g0


def _stau_fused(ctx, prefix, x, st_feat, offset, st_offset, routing, scale,
                band=8, st_ksize=5, return_rows=False):
    """Dispatch STAU sampling + experts + fusion to the fused Pallas kernel
    (ops/pallas/stau_kernel.py); the STA filtering chain runs in
    ops/pallas/sta_kernel.py in the same row layout."""
    from ..ops.pallas.chw_conv import _round_up
    from ..ops.pallas.stau_kernel import stau_upsample_fused

    b, h, w, c = x.shape
    bucket = ctx.bucket
    if bucket is not None:
        H, W = bucket["base_grid"].shape[:2]
    else:
        H, W = get_hw(h, w, scale)
    wl = _round_up(w, 128)
    wp = _round_up(W, 128)
    band = min(band, h)
    dtype = x.dtype

    def rows(t):  # [B,h,w,C] -> [B,h,C,Wl]
        t = jnp.transpose(t, (0, 1, 3, 2))
        return jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, wl - w)))

    sta_rows = _stau_sta_rows(ctx, prefix, x, st_feat, st_ksize, wl)

    if bucket is not None:
        # zero beyond the pre-pad_spatial crop: the hat sums then reproduce
        # the reference's zeros padding at the TRUE image border
        x = x * bucket["m2d0"].astype(dtype)
    st = ctx.stau_statics if not ctx.train else None
    if st is not None and "pix" in st:
        pix, j0, g0 = st["pix"], st["j0"], st["g0"]
    else:
        pix, j0, g0 = _stau_sampler_operands(
            offset, st_offset, routing, scale, h, w, H, W, wp, band,
            bucket=bucket,
        )

    ce = c // 8
    wc = ctx[f"{prefix}weight_compress"].astype(dtype).reshape(-1, c)
    we = jnp.transpose(ctx[f"{prefix}weight_expand"].astype(dtype), (1, 0, 2)).reshape(c, -1)
    wfus = ctx[f"{prefix}fusion.weight"][0, 0].T.astype(dtype)  # [C, 2C]
    bias = ctx[f"{prefix}fusion.bias"].astype(jnp.float32).reshape(-1, 1)

    out = stau_upsample_fused(
        rows(x), sta_rows, pix, j0, g0, wc, we, wfus, bias,
        R=band, h=h, w=w, W_hr=W,
    )[:, :H]  # [B, H, C, Wp]
    if return_rows:
        return out
    return jnp.transpose(out, (0, 1, 3, 2))[:, :, :W, :]


def _tail_row_mix(h0: int, H: int):
    """Static skip-resize row info: start row (clipped to h0-2) and its
    weight, from the <=2 nonzeros of the bilinear row matrix."""
    from .arch_util import _bilinear_matrix

    mh = _bilinear_matrix(h0, H, align_corners=False)  # [H, h0]
    j0 = np.zeros((H,), np.int32)
    wy = np.zeros((H,), np.float32)
    for i in range(H):
        nz = np.nonzero(mh[i])[0]
        j0[i] = min(int(nz[0]), h0 - 2)
        wy[i] = mh[i, j0[i]]
    return j0, wy


def tail_fused_apply(ctx: Ctx, sr_rows, x_center, h0: int, w0: int,
                     H: int, W: int):
    """Tail conv + bilinear skip on the sampler's row layout
    (ops/pallas/tail_kernel.py). sr_rows: [B, H, C, Wp]; x_center:
    [B, h0, w0, 3] (or a bucket canvas with operands in ctx.bucket).
    Returns NHWC [B, H, W, 3]."""
    from ..ops.pallas.chw_conv import _round_up
    from ..ops.pallas.tail_kernel import tail_fused
    from .arch_util import _bilinear_matrix

    b, Hr, c, wp = sr_rows.shape
    dtype = sr_rows.dtype
    bucket = ctx.bucket
    wl = _round_up(x_center.shape[2], 128)

    if bucket is not None:
        row_ok = bucket["mask_hr"][0, :, 0, 0]
        col_ok = jnp.pad(bucket["mask_hr"][0, 0, :, 0],
                         (0, wp - bucket["mask_hr"].shape[2]))
        j0 = bucket["tail_j0"]
        wy = bucket["tail_wy"]
        hatc = bucket["tail_hatc"]
    else:
        col_np = (np.arange(wp) < W).astype(np.float32)
        row_ok = None
        col_ok = jnp.asarray(col_np)
        j0_np, wy_np = _tail_row_mix(h0, Hr)
        j0 = jnp.asarray(j0_np)
        wy = jnp.asarray(wy_np)
        mw = _bilinear_matrix(w0, W, align_corners=False)  # [W, w0]
        hc = np.zeros((wl, wp), np.float32)
        hc[:w0, :W] = mw.T
        hatc = jnp.asarray(hc)

    # zero beyond the valid region so the 3x3 halo at the true border sees
    # zeros (reference zero padding), then add the boundary zero rows/lanes
    sr = sr_rows * col_ok.astype(dtype)[None, None, None, :]
    if row_ok is not None:
        sr = sr * row_ok.astype(dtype)[None, :, None, None]
    sr = jnp.pad(sr, ((0, 0), (1, 1), (0, 0), (1, 127)))

    xc = jnp.pad(x_center, ((0, 0), (0, 0), (0, 0), (0, 8 - x_center.shape[3])))
    xc = jnp.transpose(xc, (0, 1, 3, 2))
    xc = jnp.pad(xc, ((0, 0), (0, 0), (0, 0), (0, wl - xc.shape[3])))

    wt_hwio = ctx["tail.weight"]  # [3, 3, C, 3]
    wt = jnp.transpose(wt_hwio, (0, 1, 3, 2)).reshape(9, 3, c)
    wt = jnp.pad(wt, ((0, 0), (0, 5), (0, 0))).astype(dtype)
    bias = jnp.pad(ctx["tail.bias"], (0, 5)).astype(jnp.float32).reshape(8, 1)

    out = tail_fused(sr, xc.astype(dtype), j0, wy, wt, bias,
                     hatc.astype(dtype))  # [B, H, 8, Wp]
    return jnp.transpose(out, (0, 1, 3, 2))[:, :, :W, :3]


def _stau_head(ctx: Ctx, prefix: str, h: int, w: int, scale: Scale, dtype):
    """STAU coordinate head: static HR coordinate embedding -> offsets /
    expert routing (reference savsr_arch.py:326-364). Depends only on
    (params, h, w, scale) — NEVER on video content — so eval callers can
    compute it once per shape/scale and pass it via Ctx.stau_statics
    (profiled at ~10 ms/frame at 720p when recomputed inline)."""
    if ctx.bucket is not None:
        inp = ctx.bucket["coord_input"].astype(dtype)
    else:
        inp = jnp.asarray(_stau_coordinate_input(h, w, scale), dtype=dtype)
    emb = jax.nn.relu(conv2d(ctx, f"{prefix}body.0", inp))
    emb = jax.nn.relu(conv2d(ctx, f"{prefix}body.2", emb))
    offset = conv2d(ctx, f"{prefix}offset", emb)          # [1,H,W,2]
    st_offset = conv2d(ctx, f"{prefix}st_offset", emb)    # [1,H,W,2]
    routing = sigmoid(conv2d(ctx, f"{prefix}routing.0", emb))  # [1,H,W,n]
    return {"offset": offset, "st_offset": st_offset, "routing": routing}


def stau_apply(
    ctx: Ctx, prefix: str, x: jnp.ndarray, scale: Scale, st_feat: jnp.ndarray,
    channels: int, num_experts: int = 4, st_ksize: int = 5,
    return_rows: bool = False,
) -> jnp.ndarray:
    b, h, w, c = x.shape
    H, W = get_hw(h, w, scale)
    use_chw = ctx.conv_engine == "chw" and not ctx.train_engines

    if not use_chw:
        # spatio-temporal adaptive filtering of x by kernels predicted from
        # the alignment feature (the CHW path fuses kernel_conv + lrelu +
        # sta_conv into ops/pallas/sta_kernel.py inside _stau_fused)
        kernel_warp = leaky_relu(conv2d(ctx, f"{prefix}kernel_conv.0", st_feat), 0.1)
        sta_feat = sta_conv(x, kernel_warp, st_ksize)

    # coordinate embedding -> routing / offsets (batch-size-1, broadcast).
    # Frame-invariant: precomputed once per (shape, scale) when the caller
    # supplies ctx.stau_statics (eval only — training differentiates
    # through the head, savsr_arch.py reference :326-364)
    st = ctx.stau_statics if not ctx.train else None
    if st is not None:
        offset = st["offset"].astype(x.dtype)
        st_offset = st["st_offset"].astype(x.dtype)
        routing = st["routing"].astype(x.dtype)
    else:
        head = _stau_head(ctx, prefix, h, w, scale, x.dtype)
        offset, st_offset, routing = (
            head["offset"], head["st_offset"], head["routing"]
        )

    if use_chw:
        return _stau_fused(ctx, prefix, x, st_feat, offset, st_offset,
                           routing, scale, st_ksize=st_ksize,
                           return_rows=return_rows)

    # grid sample + spatially-varying compress/expand. The reference builds
    # per-pixel [C/8,C] and [C,C/8] matrices (savsr_arch.py:353-359); since
    # both are linear mixtures over experts, we contract with each shared
    # expert matrix first (4 MXU matmuls) and mix with the routing weights —
    # mathematically identical, no [H,W,C/8,C] materialization.
    fea0 = _stau_grid_sample(x, offset, scale, ctx.train_engines,
                             bucket=ctx.bucket)  # [B,H,W,C]
    wc = ctx[f"{prefix}weight_compress"].astype(x.dtype)  # [n, C/8, C]
    we = ctx[f"{prefix}weight_expand"].astype(x.dtype)    # [n, C, C/8]
    r = routing[0]  # [H,W,n]
    zc = jnp.einsum("bhwc,noc->bhwno", fea0, wc)
    fc = jnp.einsum("bhwno,hwn->bhwo", zc, r)
    ze = jnp.einsum("bhwo,nco->bhwnc", fc, we)
    fea = jnp.einsum("bhwnc,hwn->bhwc", ze, r) + fea0

    sta_up = _stau_grid_sample(sta_feat, st_offset, scale, ctx.train_engines,
                               bucket=ctx.bucket)
    out = conv2d(ctx, f"{prefix}fusion", jnp.concatenate([sta_up, fea], axis=-1))
    return out


# ---------------------------------------------------------------------------
# ResidualBlock / WindowUnits / RCAN trunk
# ---------------------------------------------------------------------------


def residual_block_init(ic: InitCtx, prefix: str, num_feat: int, num_frame: int,
                        use_osconv: bool) -> None:
    for i in range(num_frame):
        ic.conv(f"{prefix}conv0.{i}", 3, 3, num_feat, num_feat)
    if use_osconv:
        osconv_init(ic, f"{prefix}osconv.", num_feat * num_frame, num_feat, 3)
    else:
        ic.conv(f"{prefix}conv1", 1, 1, num_feat * num_frame, num_feat)
    for i in range(num_frame):
        ic.conv(f"{prefix}conv2.{i}", 3, 3, num_feat * 2, num_feat)


def _conv2d_parts(ctx: Ctx, name: str, parts: List[jnp.ndarray], padding: int = 0) -> jnp.ndarray:
    """conv(concat(parts, C)) == sum_i conv_i(part_i) with the weight split
    along Cin — identical math, no concat copy (profiling showed the channel
    concats feeding convs cost ~38% of the alignment loop on v5e)."""
    from jax import lax

    w = ctx[f"{name}.weight"]
    y = None
    off = 0
    for p in parts:
        c = p.shape[-1]
        yi = lax.conv_general_dilated(
            p, w[:, :, off : off + c, :].astype(p.dtype), (1, 1),
            ((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = yi if y is None else y + yi
        off += c
    b = ctx.params.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def residual_block_apply(
    ctx: Ctx, prefix: str, feats: List[jnp.ndarray], scale: Scale,
    use_osconv: bool, impl: str = "einsum",
) -> List[jnp.ndarray]:
    # note: fusing the per-frame convs into one feature-grouped conv is
    # mathematically identical but ~2x SLOWER on TPU (grouped convs fall off
    # XLA's fast conv path) — keep them separate
    n = len(feats)
    x1 = [leaky_relu(conv2d(ctx, f"{prefix}conv0.{i}", feats[i], padding=1)) for i in range(n)]
    if use_osconv:
        base = leaky_relu(
            osconv_apply_module(ctx, f"{prefix}osconv.", x1, scale, impl=impl)
        )
    else:
        base = leaky_relu(_conv2d_parts(ctx, f"{prefix}conv1", x1))
    out = []
    for i in range(n):
        x2 = leaky_relu(
            _conv2d_parts(ctx, f"{prefix}conv2.{i}", [base, x1[i]], padding=1)
        )
        out.append(feats[i] + x2)
    return out


def window_l1_init(ic: InitCtx, prefix: str, num_in_ch: int, num_feat: int,
                   win_size: int = 3, num_block: int = 4) -> None:
    ic.conv(f"{prefix}conv_c", 3, 3, num_in_ch, num_feat)
    ic.conv(f"{prefix}conv_sup", 3, 3, num_in_ch * (win_size - 1), num_feat)
    for i in range(num_block):
        residual_block_init(ic, f"{prefix}blocks.{i}.", num_feat, 3, use_osconv=(i >= 1))
    ic.conv(f"{prefix}merge", 3, 3, 3 * num_feat, num_feat)


def window_l1_apply(
    ctx: Ctx, prefix: str, x: jnp.ndarray, h_past: jnp.ndarray, scale: Scale,
    num_block: int = 4, impl: str = "einsum",
) -> jnp.ndarray:
    """x: [B, T=3, H, W, C_in] sliding window; h_past: [B, H, W, C]."""
    if ctx.conv_engine == "chw" and not ctx.train_engines:
        from .chw_engine import window_l1_apply_chw

        return window_l1_apply_chw(ctx, prefix, x, h_past, scale, num_block)
    t = x.shape[1]
    x_c = x[:, t // 2]
    sup = [x[:, i] for i in range(t) if i != t // 2]
    x_sup = jnp.concatenate(sup, axis=-1)
    h_sup = leaky_relu(conv2d(ctx, f"{prefix}conv_sup", x_sup, padding=1))
    h_c = leaky_relu(conv2d(ctx, f"{prefix}conv_c", x_c, padding=1))
    feats = [h_c, h_sup, h_past]
    for i in range(num_block):
        feats = residual_block_apply(
            ctx, f"{prefix}blocks.{i}.", feats, scale, use_osconv=(i >= 1), impl=impl
        )
    return _conv2d_parts(ctx, f"{prefix}merge", feats, padding=1)


def window_l2_init(ic: InitCtx, prefix: str, num_feat: int, win_size: int = 5,
                   slid_win: int = 5, num_block: int = 2) -> None:
    for i in range(win_size):
        ic.conv(f"{prefix}conv_h.{i}", 3, 3, num_feat * 2, num_feat)
    for i in range(num_block):
        residual_block_init(ic, f"{prefix}blocks.{i}.", num_feat, slid_win, use_osconv=True)
    ic.conv(f"{prefix}merge", 3, 3, slid_win * num_feat, num_feat * 2)


def window_l2_apply(
    ctx: Ctx, prefix: str, feats: List[jnp.ndarray], scale: Scale,
    win_size: int, slid_win: int, num_block: int = 2, impl: str = "einsum",
    hw=None,
) -> List[jnp.ndarray]:
    if ctx.conv_engine == "chw" and not ctx.train_engines:
        from .chw_engine import window_l2_apply_chw

        return window_l2_apply_chw(ctx, prefix, feats, scale, win_size,
                                   slid_win, num_block, hw=hw)
    h_feat = [
        leaky_relu(conv2d(ctx, f"{prefix}conv_h.{i}", feats[i], padding=1))
        for i in range(win_size)
    ]
    out_feat = h_feat if len(h_feat) == 1 else []
    for i in range(win_size - slid_win + 1):
        sw = h_feat[i : i + slid_win]
        for bi in range(num_block):
            sw = residual_block_apply(
                ctx, f"{prefix}blocks.{bi}.", sw, scale, use_osconv=True, impl=impl
            )
        out_feat.append(_conv2d_parts(ctx, f"{prefix}merge", sw, padding=1))
    return out_feat


def rcab_init(ic: InitCtx, prefix: str, num_feat: int, squeeze_factor: int = 16) -> None:
    ic.conv(f"{prefix}rcab.0", 3, 3, num_feat, num_feat)
    ic.conv(f"{prefix}rcab.2", 3, 3, num_feat, num_feat)
    ic.conv(f"{prefix}rcab.3.attention.1", 1, 1, num_feat, num_feat // squeeze_factor)
    ic.conv(f"{prefix}rcab.3.attention.3", 1, 1, num_feat // squeeze_factor, num_feat)


def rcab_apply(ctx: Ctx, prefix: str, x: jnp.ndarray, res_scale: float = 1.0) -> jnp.ndarray:
    y = jax.nn.relu(conv2d(ctx, f"{prefix}rcab.0", x, padding=1))
    y = conv2d(ctx, f"{prefix}rcab.2", y, padding=1)
    # channel attention (SE)
    a = adaptive_avg_pool_11(y)
    a = jax.nn.relu(_fc1x1(ctx, f"{prefix}rcab.3.attention.1", a))
    a = sigmoid(_fc1x1(ctx, f"{prefix}rcab.3.attention.3", a))
    y = y * a[:, None, None, :]
    return y * res_scale + x


def residual_group_init(ic: InitCtx, prefix: str, num_feat: int, num_block: int) -> None:
    for i in range(num_block):
        rcab_init(ic, f"{prefix}residual_group.{i}.", num_feat)
    ic.conv(f"{prefix}conv", 3, 3, num_feat, num_feat)


def stack_prefix_params(params: Params, prefixes: List[str]) -> Params:
    """Stack the parameters under each prefix into [n, ...] leaves keyed by
    the stripped suffix — the repeated trunk blocks become a lax.scan over
    stacked weights in eval, shrinking the HLO (and the 40-60 s/program
    remote compiles of the multi-scale eval sweep) by the repeat count."""
    suffixes = sorted(
        {k[len(prefixes[0]):] for k in params if k.startswith(prefixes[0])}
    )
    return {s: jnp.stack([params[p + s] for p in prefixes]) for s in suffixes}


def _sub_ctx(ctx: Ctx, params: Params) -> Ctx:
    return Ctx(params, train=ctx.train, engines=ctx.engines,
               conv_engine=ctx.conv_engine, bucket=ctx.bucket,
               split_conv=ctx.split_conv, pair_pc=ctx.pair_pc)


def residual_group_apply(ctx: Ctx, prefix: str, x: jnp.ndarray, num_block: int,
                         roll: bool | None = None) -> jnp.ndarray:
    if roll is None:
        roll = not ctx.train
    if roll:
        stacked = stack_prefix_params(
            ctx.params, [f"{prefix}residual_group.{i}." for i in range(num_block)]
        )

        def body(y, p):
            return rcab_apply(_sub_ctx(ctx, p), "", y), None

        y, _ = jax.lax.scan(body, x, stacked)
    else:
        # unrolled in training (keeps per-block remat segmentation simple)
        y = x
        for i in range(num_block):
            y = rcab_apply(ctx, f"{prefix}residual_group.{i}.", y)
    return conv2d(ctx, f"{prefix}conv", y, padding=1) + x


# ---------------------------------------------------------------------------
# SAVSR top level
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SAVSRConfig:
    num_in_ch: int = 3
    num_feat: int = 64
    num_frame: int = 7
    slid_win: int = 3
    fusion_win: int = 5
    interval: int = 0
    w1_num_block: int = 4
    w2_num_block: int = 2
    n_resgroups: int = 4
    n_resblocks: int = 8
    center_frame_idx: int | None = None
    osconv_impl: str = "einsum"
    # engine forcing for the train/eval implementation pairs (see Ctx.engines)
    engines: str = "auto"
    # alignment-chain conv backend: "xla" | "chw" (Pallas serving engine)
    conv_engine: str = "xla"
    # run the f2p/p2f chains as ONE paired pass with per-chain weights
    # (CHW engine only). Measured on-chip: 18.5 vs 20.0 fps — the
    # per-sample weight indexing costs more than the halved launches save,
    # so the default stays False; kept as a knob (and as coverage for the
    # per-sample-weight kernel path the OSConv folding also uses).
    pair_align: bool = False
    # 'float32' reproduces the reference bit-for-bit-ish; 'bfloat16'/'default'
    # unlocks full-rate MXU matmuls for the perf path.
    matmul_precision: str = "float32"
    # conv precision for the CHW serving engine (eval only):
    #   "native" — convs run at the carry dtype under matmul_precision
    #   "split"  — f32 carries, but each conv contracts bf16 hi/lo halves
    #              ([Xhi; Xlo; Xhi] x [Whi, Whi, Wlo]): f32-grade accuracy
    #              (error ~2^-16) in 3 MXU passes instead of float32's 6.
    #              Non-conv ops still follow matmul_precision (keep it
    #              'float32' so the STAU head/samplers stay strict).
    conv_precision: str = "native"
    # rematerialize per-module in the training forward (jax.checkpoint):
    # trades ~30% extra FLOPs for activation memory, required for the
    # shipped batch-16 recipe on a 16GB chip. remat_policy:
    #   "full"  — recompute everything in the segment (min memory)
    #   "dots"  — save matmul/conv outputs, recompute elementwise
    #             (jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    remat_train: bool = True
    remat_policy: str = "full"
    # selective remat: rematerialize ONLY the STAU upsampler segment even
    # when remat_train=False. STAU's grid-sample gathers + per-pixel expert
    # tensors are the dominant saved-activation cost of the no-remat step
    # (the measured HBM-OOM site at B=16 with the taps engine) while its
    # recompute is cheap relative to the alignment chains — the memory/FLOP
    # sweet spot between full remat and none.
    remat_stau: bool = False
    # training loop structure:
    #   "unroll" — the alignment scan and trunk groups are unrolled in the
    #              training forward (one HLO copy per iteration; simplest
    #              remat segmentation; the measured round-3 default)
    #   "scan"   — roll them into lax.scan like the eval path, threading the
    #              chained BatchNorm running-stat updates through the scan
    #              carry (identical math; ~n_iter x smaller training HLO ->
    #              much faster cold compiles of the no-remat step)
    train_loop: str = "unroll"

    @property
    def center(self) -> int:
        return self.num_frame // 2 if self.center_frame_idx is None else self.center_frame_idx

    @property
    def iter_win(self) -> int:
        if self.interval == 0:
            return self.num_frame
        if self.center % 2 == 0:
            return self.center + 1
        return self.center + 2


def frame_sample_indices(num_frame: int, interval: int) -> Tuple[List[int], List[int]]:
    """Static forward/backward frame index lists (savsr_arch.py:638-659)."""
    index = list(range(num_frame))
    if interval == 0:
        return index, index
    center = num_frame // 2
    if center % 2 == 0:
        forward_idx = index[1 :: (interval + 1)]
        forward_idx.insert(center // 2, center)
        backward_idx = index[:: (interval + 1)]
    else:
        forward_idx = index[:: (interval + 1)]
        forward_idx.insert(center // 2 + 1, center)
        backward_idx = index[1 :: (interval + 1)]
        if len(forward_idx) != len(backward_idx):
            backward_idx.append(forward_idx[-1])
            backward_idx.insert(0, forward_idx[0])
    return forward_idx, backward_idx


@ARCH_REGISTRY.register()
class SAVSR:
    """Config holder + functional init/apply (the network itself is the
    (params, apply) pair; there is no module object state)."""

    def __init__(self, downsample_scale=2, **kwargs):
        kwargs.pop("downsample_scale", None)
        self.cfg = SAVSRConfig(**{k: v for k, v in kwargs.items() if v is not None or k == "center_frame_idx"})

    def init(self, key) -> Params:
        return savsr_init(key, self.cfg)

    def apply(self, params: Params, x: jnp.ndarray, scale, train: bool = False,
              stau_statics=None, bucket=None):
        return savsr_apply(params, x, normalize_scale(scale), self.cfg,
                           train=train, stau_statics=stau_statics,
                           bucket=bucket)

    def stau_statics(self, params: Params, lq_hw, scale, dtype=jnp.float32,
                     bucket=None):
        """Frame-invariant STAU coordinate-head outputs for (lq shape,
        scale) — compute ONCE per shape/scale in eval/serving and pass to
        ``apply(..., stau_statics=...)``; saves ~10 ms/frame at 720p
        (see _stau_head). ``dtype`` must match the forward's feature dtype
        (bf16 for the serving config) for exact equality with the inline
        path. Jit-compatible (params/bucket traced; shapes static)."""
        from ..ops.pallas.chw_conv import _round_up

        h, w = int(lq_hw[0]), int(lq_hw[1])
        scale = normalize_scale(scale)
        ctx = Ctx(params, train=False, engines=self.cfg.engines,
                  conv_engine=self.cfg.conv_engine, bucket=bucket)
        with jax.default_matmul_precision(self.cfg.matmul_precision):
            st = _stau_head(ctx, "upsample.", h, w, scale, dtype)
            if self.cfg.conv_engine == "chw":
                # also derive the fused sampler's operands (pix planes,
                # band starts) — same frame-invariance, saves the per-frame
                # plane assembly/reductions in _stau_fused
                if bucket is not None:
                    H, W = bucket["base_grid"].shape[:2]
                else:
                    H, W = get_hw(h, w, scale)
                pix, j0, g0 = _stau_sampler_operands(
                    st["offset"], st["st_offset"], st["routing"], scale,
                    h, w, H, W, _round_up(W, 128), min(8, h), bucket=bucket,
                )
                st = {**st, "pix": pix, "j0": j0, "g0": g0}
            return st


def savsr_init(key, cfg: SAVSRConfig) -> Params:
    ic = InitCtx(key)
    window_l1_init(ic, "f2p_win.", cfg.num_in_ch, cfg.num_feat, cfg.slid_win, cfg.w1_num_block)
    window_l1_init(ic, "p2f_win.", cfg.num_in_ch, cfg.num_feat, cfg.slid_win, cfg.w1_num_block)
    n_l2 = (cfg.iter_win - cfg.fusion_win + 1) // 2
    for i in range(n_l2):
        window_l2_init(
            ic, f"h_win.{i}.", cfg.num_feat,
            win_size=(cfg.iter_win - cfg.slid_win + 1) - 2 * i,
            slid_win=cfg.fusion_win, num_block=cfg.w2_num_block,
        )
    ic.conv("h_win_conv_h", 3, 3, cfg.num_feat * 2, cfg.num_feat)
    for i in range(cfg.n_resgroups):
        residual_group_init(ic, f"RG.{i}.", cfg.num_feat, cfg.n_resblocks)
        osadapt_init(ic, f"adapt.{i}.", cfg.num_feat)
    ic.raw("gamma", jnp.ones((1,), jnp.float32))
    ic.conv("conv_last", 3, 3, cfg.num_feat, cfg.num_feat)
    stau_init(ic, "upsample.", cfg.num_feat)
    ic.conv("tail", 3, 3, cfg.num_feat, cfg.num_in_ch)
    return ic.params


def pad_spatial(x: jnp.ndarray, multiple: int = 2) -> jnp.ndarray:
    """Reflect-pad [B,T,H,W,C] so H,W are multiples of ``multiple``
    (OSAdapt's avgpool/upsample requires it; savsr_arch.py:670-690)."""
    h, w = x.shape[2], x.shape[3]
    pad_h = (multiple - h % multiple) % multiple
    pad_w = (multiple - w % multiple) % multiple
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")


def savsr_apply(
    params: Params, x: jnp.ndarray, scale: Scale, cfg: SAVSRConfig,
    train: bool = False, stau_statics=None, bucket=None,
):
    """SAVSR forward: x [B, T, H, W, C] RGB in [0,1] -> [B, H*sh, W*sw, C].

    Returns (sr, stats_updates); stats_updates is empty in eval mode.
    ``stau_statics``: optional precomputed coordinate-head outputs
    (SAVSR.stau_statics) — eval-only fast path, ignored under train.
    ``bucket``: bucketed multi-scale TRAINING operands
    (archs/bucketed.py make_train_bucket_operands) — the static ``scale``
    becomes a dummy and every scale-dependent value (ScaleAttention scale
    vector, STAU coordinate input / base grid, bilinear-skip matrices,
    HR mask) rides in as a traced operand, so every scale whose HR size
    fits one canvas shares ONE compiled program.
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _savsr_apply_inner(params, x, scale, cfg, train,
                                  stau_statics=stau_statics, bucket=bucket)


def _ckpt_call(ctx: Ctx, fn, *args, remat, policy: str = "full"):
    """Run ``fn(ctx', *args) -> out`` as a jax.checkpoint segment in training.

    BN running-stat updates accumulated so far are folded into the params the
    segment sees (preserving chained updates), and the segment's own updates
    are merged back into the outer ctx.
    """
    if not (ctx.train and remat):
        return fn(ctx, *args)

    base_params = ctx.params

    def wrapped(params, updates, args):
        inner = Ctx({**params, **updates}, train=True, engines=ctx.engines,
                    conv_engine=ctx.conv_engine, bucket=ctx.bucket)
        out = fn(inner, *args)
        return out, inner.stats_updates

    kw = {}
    if policy == "dots":
        kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    out, updates = jax.checkpoint(wrapped, **kw)(
        base_params, dict(ctx.stats_updates), args
    )
    ctx.stats_updates.update(updates)
    return out


def _savsr_apply_inner(
    params: Params, x: jnp.ndarray, scale: Scale, cfg: SAVSRConfig,
    train: bool = False, stau_statics=None, bucket=None,
):
    split = cfg.conv_precision == "split" and not train
    if split:
        from .chw_engine import model_pc

        pair_pc = model_pc(cfg.num_feat)
    else:
        pair_pc = 64
    ctx = Ctx(params, train=train, engines=cfg.engines,
              conv_engine=cfg.conv_engine, split_conv=split,
              pair_pc=pair_pc, bucket=bucket,
              stau_statics=None if train else stau_statics)
    b, t, h_input, w_input, c = x.shape
    H, W = get_hw(h_input, w_input, scale)
    impl = cfg.osconv_impl

    x_center = x[:, cfg.center]
    x = pad_spatial(x)
    hp, wp = x.shape[2], x.shape[3]

    fwd_idx, bwd_idx = frame_sample_indices(t, cfg.interval)
    x_forward = x[:, jnp.asarray(fwd_idx)] if cfg.interval else x
    x_backward = x[:, jnp.asarray(bwd_idx)] if cfg.interval else x

    n_iter = cfg.iter_win - cfg.slid_win + 1
    half = cfg.slid_win // 2

    ht_f2p = jnp.zeros((b, hp, wp, cfg.num_feat), dtype=x.dtype)
    ht_p2f = jnp.zeros_like(ht_f2p)
    # sequential bidirectional propagation (savsr_arch.py:708-719); weights
    # are shared across the n_iter steps. In eval we roll the loop into a
    # lax.scan (one program copy -> ~n_iter x smaller HLO / faster compile);
    # in training it stays unrolled so chained BatchNorm running-stat
    # updates thread through Ctx.
    if train and cfg.train_loop == "scan":
        # Rolled training alignment loop: the same sequential math as the
        # unrolled branch below as ONE lax.scan program copy (~n_iter x
        # smaller training HLO -> much faster cold compiles). The chained
        # BatchNorm running-stat updates (batch_norm reads the previous
        # update before writing its own) thread through the scan carry.
        wins_b = jnp.stack(
            [
                x_backward[:, cfg.iter_win - 1 - 2 * half - idx : cfg.iter_win - idx]
                for idx in range(n_iter)
            ]
        )
        wins_f = jnp.stack(
            [x_forward[:, idx : idx + cfg.slid_win] for idx in range(n_iter)]
        )
        stat_keys = sorted(
            k for k in params
            if k.startswith(("f2p_win.", "p2f_win."))
            and k.rsplit(".", 1)[-1]
            in ("running_mean", "running_var", "num_batches_tracked")
        )
        stats0 = {k: ctx.stats_updates.get(k, params[k]) for k in stat_keys}

        def align_step(p, carry, xs):
            hf, hpf, stats = carry
            it_b, it_f = xs
            inner = Ctx(p, train=True, stats_updates=dict(stats),
                        engines=ctx.engines, conv_engine=ctx.conv_engine,
                        bucket=ctx.bucket)
            hf = window_l1_apply(inner, "f2p_win.", it_b, hf, scale,
                                 cfg.w1_num_block, impl)
            hpf = window_l1_apply(inner, "p2f_win.", it_f, hpf, scale,
                                  cfg.w1_num_block, impl)
            stats = {k: inner.stats_updates[k] for k in stat_keys}
            return (hf, hpf, stats), (hf, hpf)

        if cfg.remat_train:
            kw = {}
            if cfg.remat_policy == "dots":
                kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            align_step = jax.checkpoint(align_step, **kw)

        (_, _, stats_fin), (hf_seq, hp_seq) = jax.lax.scan(
            lambda carry, xs: align_step(params, carry, xs),
            (ht_f2p, ht_p2f, stats0), (wins_b, wins_f),
        )
        ctx.stats_updates.update(stats_fin)
        h_feat = [
            jnp.concatenate([hf_seq[n_iter - 1 - i], hp_seq[i]], axis=-1)
            for i in range(n_iter)
        ]
    elif train:
        h_f2p_list: List[jnp.ndarray] = [None] * n_iter
        h_p2f_list: List[jnp.ndarray] = []

        def _w1(c, name, it, ht):
            return window_l1_apply(c, name, it, ht, scale, cfg.w1_num_block, impl)

        for idx in range(n_iter):
            cur_t = cfg.iter_win - 1 - half - idx
            it = x_backward[:, cur_t - half : cur_t + half + 1]
            ht_f2p = _ckpt_call(
                ctx, lambda c, a, b_: _w1(c, "f2p_win.", a, b_), it, ht_f2p,
                remat=cfg.remat_train, policy=cfg.remat_policy,
            )
            h_f2p_list[n_iter - 1 - idx] = ht_f2p

            cur_t = idx + half
            it = x_forward[:, cur_t - half : cur_t + half + 1]
            ht_p2f = _ckpt_call(
                ctx, lambda c, a, b_: _w1(c, "p2f_win.", a, b_), it, ht_p2f,
                remat=cfg.remat_train, policy=cfg.remat_policy,
            )
            h_p2f_list.append(ht_p2f)
        h_feat = [
            jnp.concatenate([h_f2p_list[i], h_p2f_list[i]], axis=-1)
            for i in range(n_iter)
        ]
    else:
        wins_b = jnp.stack(
            [
                x_backward[:, cfg.iter_win - 1 - 2 * half - idx : cfg.iter_win - idx]
                for idx in range(n_iter)
            ]
        )
        wins_f = jnp.stack(
            [x_forward[:, idx : idx + cfg.slid_win] for idx in range(n_iter)]
        )

        use_chw = ctx.conv_engine == "chw" and not ctx.train_engines
        if use_chw:
            # hidden states carried flat-padded CHW: window outputs feed the
            # next window / window_l2 / trunk with no NHWC round trips and
            # contiguous axis-1 channel concats
            from ..ops.pallas.chw_conv import layout_params
            from .chw_engine import window_l1_apply_chw

            s_total = layout_params(hp, wp)[4]

        # split tier: hidden states are PAIR-carried (bf16 hi/lo channels,
        # chw_engine.pair_split convention) — 2C rows, bf16
        split = getattr(ctx, "split_conv", False)
        c_carry = 2 * cfg.num_feat if split else cfg.num_feat
        dt_carry = jnp.bfloat16 if split else x.dtype

        if use_chw and cfg.pair_align:
            # both chains in ONE paired pass: windows stacked chain-major on
            # the batch axis, per-chain weights per sample — halves kernel
            # launches on the sequential alignment scan
            h2 = jnp.zeros((2 * b, c_carry, s_total), dtype=dt_carry)

            def body_paired(h2, xs):
                it_b, it_f = xs
                it2 = jnp.concatenate([it_b, it_f], axis=0)
                h2 = window_l1_apply_chw(
                    ctx, ("f2p_win.", "p2f_win."), it2, h2, scale,
                    cfg.w1_num_block, out_chw=True,
                )
                return h2, h2

            _, h2_seq = jax.lax.scan(body_paired, h2, (wins_b, wins_f))
            hf_seq, hp_seq = h2_seq[:, :b], h2_seq[:, b:]
        elif use_chw:
            ht_f2p = jnp.zeros((b, c_carry, s_total), dtype=dt_carry)
            ht_p2f = jnp.zeros_like(ht_f2p)

            def body_chw(carry, xs):
                hf, hp_ = carry
                it_b, it_f = xs
                hf = window_l1_apply_chw(ctx, "f2p_win.", it_b, hf, scale,
                                         cfg.w1_num_block, out_chw=True)
                hp_ = window_l1_apply_chw(ctx, "p2f_win.", it_f, hp_, scale,
                                          cfg.w1_num_block, out_chw=True)
                return (hf, hp_), (hf, hp_)

            _, (hf_seq, hp_seq) = jax.lax.scan(body_chw, (ht_f2p, ht_p2f),
                                               (wins_b, wins_f))
        else:
            ht_f2p = jnp.zeros((b, hp, wp, cfg.num_feat), dtype=x.dtype)
            ht_p2f = jnp.zeros_like(ht_f2p)

            def body(carry, xs):
                hf, hp_ = carry
                it_b, it_f = xs
                hf = window_l1_apply(ctx, "f2p_win.", it_b, hf, scale, cfg.w1_num_block, impl)
                hp_ = window_l1_apply(ctx, "p2f_win.", it_f, hp_, scale, cfg.w1_num_block, impl)
                return (hf, hp_), (hf, hp_)

            _, (hf_seq, hp_seq) = jax.lax.scan(body, (ht_f2p, ht_p2f), (wins_b, wins_f))
        # f2p outputs were produced from the future end backwards
        cat_axis = 1 if use_chw else -1
        h_feat = [
            jnp.concatenate([hf_seq[n_iter - 1 - i], hp_seq[i]], axis=cat_axis)
            for i in range(n_iter)
        ]
    # dev-only stage probe for scripts/stage_bench.py: return the named
    # intermediate so stage costs can be measured as prefix diffs
    _stop = os.environ.get("SAVSR_STOP_AFTER")
    if _stop == "align":
        return h_feat[0], ctx.stats_updates
    n_l2 = (cfg.iter_win - cfg.fusion_win + 1) // 2
    for i in range(n_l2):
        h_feat = window_l2_apply(
            ctx, f"h_win.{i}.", h_feat, scale,
            win_size=(cfg.iter_win - cfg.slid_win + 1) - 2 * i,
            slid_win=cfg.fusion_win, num_block=cfg.w2_num_block, impl=impl,
            hw=(hp, wp),
        )
    h_feat = h_feat[0]
    if _stop == "l2":
        return h_feat, ctx.stats_updates
    if ctx.conv_engine == "chw" and not ctx.train_engines:
        from .chw_engine import trunk_apply_chw

        h_feat, align_feat = trunk_apply_chw(
            ctx, h_feat, scale, cfg.n_resgroups, cfg.n_resblocks, hw=(hp, wp)
        )
    else:
        h_feat = leaky_relu(conv2d(ctx, "h_win_conv_h", h_feat, padding=1))
        align_feat = h_feat

        # reconstruction trunk with scale-adaptive residual adapters
        share_source = h_feat
        gamma = ctx["gamma"].astype(x.dtype)

        if train and cfg.train_loop == "scan":
            # rolled trunk: scan over stacked per-group params (same math as
            # the unrolled branch; ~n_resgroups x smaller HLO). Each group's
            # OSAdapt BN stats are distinct keys, so they come out as stacked
            # per-iteration scan outputs and scatter back below.
            rg = stack_prefix_params(
                params, [f"RG.{i}." for i in range(cfg.n_resgroups)]
            )
            ad = stack_prefix_params(
                params, [f"adapt.{i}." for i in range(cfg.n_resgroups)]
            )
            ad_stat_keys = sorted(
                s for s in ad
                if s.rsplit(".", 1)[-1]
                in ("running_mean", "running_var", "num_batches_tracked")
            )

            def group_step(leaves, h):
                rg_p, ad_p = leaves
                inner = Ctx({**rg_p, **ad_p}, train=True, engines=ctx.engines,
                            conv_engine=ctx.conv_engine, bucket=ctx.bucket)
                h = residual_group_apply(inner, "", h, cfg.n_resblocks, roll=True)
                h = osadapt_apply(inner, "", h, scale, impl)
                stats = {k: inner.stats_updates[k] for k in ad_stat_keys}
                return h + gamma * share_source, stats

            if cfg.remat_train:
                kw = {}
                if cfg.remat_policy == "dots":
                    kw["policy"] = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                group_step = jax.checkpoint(group_step, **kw)

            h_feat, stats_stack = jax.lax.scan(
                lambda h, leaves: group_step(leaves, h), h_feat, (rg, ad)
            )
            for s in ad_stat_keys:
                for i in range(cfg.n_resgroups):
                    ctx.stats_updates[f"adapt.{i}.{s}"] = stats_stack[s][i]
        elif train:
            def _group(c, h, name_rg, name_ad):
                h = residual_group_apply(c, name_rg, h, cfg.n_resblocks)
                return osadapt_apply(c, name_ad, h, scale, impl)

            for i in range(cfg.n_resgroups):
                h_feat = _ckpt_call(
                    ctx,
                    functools.partial(_group, name_rg=f"RG.{i}.", name_ad=f"adapt.{i}."),
                    h_feat,
                    remat=cfg.remat_train, policy=cfg.remat_policy,
                )
                h_feat = h_feat + gamma * share_source
        else:
            # scan-rolled over stacked per-group params (identical math,
            # ~n_resgroups x smaller HLO -> faster eval-sweep compiles)
            rg = stack_prefix_params(
                params, [f"RG.{i}." for i in range(cfg.n_resgroups)]
            )
            ad = stack_prefix_params(
                params, [f"adapt.{i}." for i in range(cfg.n_resgroups)]
            )

            def gbody(h, leaves):
                rg_p, ad_p = leaves
                h = residual_group_apply(_sub_ctx(ctx, rg_p), "", h, cfg.n_resblocks)
                h = osadapt_apply(_sub_ctx(ctx, ad_p), "", h, scale, impl)
                return h + gamma * share_source, None

            h_feat, _ = jax.lax.scan(gbody, h_feat, (rg, ad))
        h_feat = conv2d(ctx, "conv_last", h_feat, padding=1)
        h_feat = h_feat + share_source

    # arbitrary-scale upsampling on the un-padded region
    if ctx.conv_engine == "chw" and not ctx.train_engines:
        if _stop == "trunk":
            return h_feat, ctx.stats_updates
        sr_rows = stau_apply(
            ctx, "upsample.", h_feat[:, :h_input, :w_input], scale,
            align_feat[:, :h_input, :w_input], cfg.num_feat, return_rows=True,
        )
        if _stop == "stau":
            return sr_rows, ctx.stats_updates
        sr = tail_fused_apply(ctx, sr_rows, x_center, h_input, w_input, H, W)
        return sr, ctx.stats_updates

    def _stau(c, h, a):
        return stau_apply(c, "upsample.", h, scale, a, cfg.num_feat)

    sr = _ckpt_call(
        ctx, _stau, h_feat[:, :h_input, :w_input],
        align_feat[:, :h_input, :w_input],
        remat=cfg.remat_train or cfg.remat_stau,
        policy=cfg.remat_policy,
    )
    if ctx.bucket is not None:
        # bucketed multi-scale training (archs/bucketed.py
        # make_train_bucket_operands): sr is an HR bucket canvas whose
        # slack rows/cols carry garbage from the edge-padded STAU grids.
        # Zero them BEFORE the 3x3 tail conv so the true region sees the
        # exact zero-pad-at-the-image-border semantics, then add the
        # bilinear skip as operand matrices (rows beyond the true HR are
        # zero, so the canvas slack stays loss-maskable).
        m = ctx.bucket["mask_hr"].astype(sr.dtype)
        sr = conv2d(ctx, "tail", sr * m, padding=1)
        up = jnp.einsum(
            "Hh,bhwc,Ww->bHWc",
            ctx.bucket["up_hr_row"].astype(sr.dtype), x_center,
            ctx.bucket["up_hr_col"].astype(sr.dtype),
            precision="highest",  # matches interpolate_bilinear exactly
        )
        return sr + up, ctx.stats_updates
    sr = conv2d(ctx, "tail", sr, padding=1)
    sr = sr + interpolate_bilinear(x_center, (H, W), align_corners=False)
    return sr, ctx.stats_updates
