"""Functional NN building blocks over flat parameter dicts (NHWC, JAX).

Design: a network is a pytree ``params: dict[str, jnp.ndarray]`` whose keys
mirror the reference torch ``state_dict`` naming (e.g.
``f2p_win.conv_c.weight``) so that checkpoint import is a pure layout
transpose (savsr_tpu/utils/convert.py). Conv weights are stored HWIO,
linear weights [in, out]. All functions are pure; BatchNorm returns batch
statistics updates through the ``Ctx`` accumulator.

This module plays the role of lbasicsr/archs/arch_util.py for the rebuild
(init helpers, flow_warp, pixel shuffle, make_coord) in TPU-native form.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, jnp.ndarray]


@dataclass
class Ctx:
    """Forward-pass context: parameters, train flag, BN-stat updates.

    ``stats_updates`` accumulates new running means/vars during a training
    forward; the caller merges them back into the parameter dict.
    """

    params: Params
    train: bool = False
    stats_updates: Dict[str, jnp.ndarray] = field(default_factory=dict)
    # engine selection for numerically-identical implementation pairs whose
    # backward cost differs (split-conv vs concat-conv, block-gather vs
    # row-gather): "auto" follows ``train``; "train"/"eval" force one side
    # (used by the train-vs-eval equivalence test)
    engines: str = "auto"
    # conv backend for the alignment chain: "xla" (reference-exact NHWC) or
    # "chw" (flat-padded CHW Pallas serving engine, eval-only — see
    # archs/chw_engine.py)
    conv_engine: str = "xla"
    # bucketed any-scale eval operands (archs/bucketed.py): when set, the
    # tensors live on a larger static canvas and every scale/shape-dependent
    # quantity (pad masks, GAP normalization, STAU grids, resize matrices)
    # comes from this dict instead of static shapes — one compiled program
    # serves every (clip shape, scale) within the bucket
    bucket: Optional[Dict[str, jnp.ndarray]] = None
    # split-precision convolutions (CHW engine, eval only): features travel
    # as bf16 hi/lo PAIR channels and each conv contracts the stacked
    # [Xhi; Xlo; Xhi] against [Whi, Whi, Wlo] — an f32-grade matmul
    # (error ~2^-16 vs bf16's ~2^-8) in three MXU passes instead of the six
    # of matmul_precision='float32'. See chw_engine (pair_split / _pair_out).
    split_conv: bool = False
    # pair-chunk width of the split tier's hi/lo interleave — one model-wide
    # constant (min(64, num_feat)) so channel concats of pair tensors stay
    # pair tensors with the same layout
    pair_pc: int = 64
    # precomputed frame-invariant STAU coordinate-head outputs
    # (savsr_arch._stau_head): the head depends only on (params, h, w,
    # scale), never on video content, yet costs ~10 ms/frame at 720p when
    # recomputed inline (three Cout<=4 1x1 convs at HR resolution lower to
    # pathologically lane-wasteful fusions). Eval-only — training needs
    # gradients through the head, so it always computes inline.
    stau_statics: Optional[Dict[str, jnp.ndarray]] = None

    @property
    def train_engines(self) -> bool:
        if self.engines == "auto":
            return self.train
        return self.engines == "train"

    def __getitem__(self, key: str) -> jnp.ndarray:
        return self.params[key]

    def has(self, key: str) -> bool:
        return key in self.params


# ---------------------------------------------------------------------------
# initializers (torch-compatible fan conventions)
# ---------------------------------------------------------------------------


def _fan_in_out(shape_hwio: Tuple[int, ...]) -> Tuple[int, int]:
    if len(shape_hwio) == 4:
        kh, kw, cin, cout = shape_hwio
        rf = kh * kw
        return cin * rf, cout * rf
    cin, cout = shape_hwio
    return cin, cout


def kaiming_uniform(key, shape_hwio, a: float = math.sqrt(5.0), mode: str = "fan_in"):
    """torch nn.init.kaiming_uniform_ (the default conv/linear init)."""
    fan_in, fan_out = _fan_in_out(shape_hwio)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan)
    return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)


def kaiming_normal(key, shape_hwio, mode: str = "fan_out", nonlinearity: str = "relu"):
    fan_in, fan_out = _fan_in_out(shape_hwio)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = math.sqrt(2.0) if nonlinearity == "relu" else 1.0
    std = gain / math.sqrt(fan)
    return jax.random.normal(key, shape_hwio, jnp.float32) * std


def uniform_bias(key, fan_in: int, size: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (size,), jnp.float32, -bound, bound)


class InitCtx:
    """Parameter-dict builder with a splittable PRNG stream."""

    def __init__(self, key):
        self._key = key
        self.params: Dict[str, jnp.ndarray] = {}

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def conv(self, name: str, kh: int, kw: int, cin: int, cout: int, bias: bool = True,
             init: str = "default"):
        shape = (kh, kw, cin, cout)
        if init == "kaiming_normal_fan_out":
            w = kaiming_normal(self.next_key(), shape)
        else:
            w = kaiming_uniform(self.next_key(), shape)
        self.params[f"{name}.weight"] = w
        if bias:
            self.params[f"{name}.bias"] = uniform_bias(self.next_key(), cin * kh * kw, cout)

    def linear(self, name: str, cin: int, cout: int, bias: bool = True):
        self.params[f"{name}.weight"] = kaiming_uniform(self.next_key(), (cin, cout))
        if bias:
            self.params[f"{name}.bias"] = uniform_bias(self.next_key(), cin, cout)

    def bn(self, name: str, c: int):
        self.params[f"{name}.weight"] = jnp.ones((c,), jnp.float32)
        self.params[f"{name}.bias"] = jnp.zeros((c,), jnp.float32)
        self.params[f"{name}.running_mean"] = jnp.zeros((c,), jnp.float32)
        self.params[f"{name}.running_var"] = jnp.ones((c,), jnp.float32)
        self.params[f"{name}.num_batches_tracked"] = jnp.zeros((), jnp.int32)

    def raw(self, name: str, value):
        self.params[name] = value


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------


def conv2d(
    ctx: Ctx,
    name: str,
    x: jnp.ndarray,
    stride: int = 1,
    padding: Union[int, str] = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC, torch-style integer padding."""
    w = ctx[f"{name}.weight"]
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = padding
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    b = ctx.params.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear(ctx: Ctx, name: str, x: jnp.ndarray) -> jnp.ndarray:
    w = ctx[f"{name}.weight"]
    y = x @ w.astype(x.dtype)
    b = ctx.params.get(f"{name}.bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm(
    ctx: Ctx,
    name: str,
    x: jnp.ndarray,
    eps: float = 1e-5,
    momentum: float = 0.1,
    axis: Tuple[int, ...] = (0, 1, 2),
) -> jnp.ndarray:
    """BatchNorm over ``axis`` (default NHW) with torch running-stat update.

    In train mode batch statistics normalize and the running stats update is
    recorded in ``ctx.stats_updates`` (per-device, unsynced — matching DDP's
    default non-synced BatchNorm in the reference)."""
    gamma = ctx[f"{name}.weight"]
    beta = ctx[f"{name}.bias"]
    if ctx.train:
        mean = jnp.mean(x, axis=axis)
        var = jnp.var(x, axis=axis)
        # torch normalizes with biased variance but tracks unbiased
        n = int(np.prod([x.shape[a] for a in axis]))
        unbiased = var * (n / max(n - 1, 1))
        # chain across repeated applications of a weight-shared module (the
        # temporal loop calls each BN several times per step, like torch)
        rm = ctx.stats_updates.get(f"{name}.running_mean", ctx[f"{name}.running_mean"])
        rv = ctx.stats_updates.get(f"{name}.running_var", ctx[f"{name}.running_var"])
        ctx.stats_updates[f"{name}.running_mean"] = (1 - momentum) * rm + momentum * mean
        ctx.stats_updates[f"{name}.running_var"] = (1 - momentum) * rv + momentum * unbiased
        # torch increments num_batches_tracked every train-mode forward
        nbt_key = f"{name}.num_batches_tracked"
        if nbt_key in ctx.params:
            nbt = ctx.stats_updates.get(nbt_key, ctx[nbt_key])
            ctx.stats_updates[nbt_key] = nbt + 1
    else:
        mean = ctx[f"{name}.running_mean"]
        var = ctx[f"{name}.running_var"]
    inv = lax.rsqrt(var.astype(x.dtype) + eps)
    return (x - mean.astype(x.dtype)) * inv * gamma.astype(x.dtype) + beta.astype(x.dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    # abs-based form (identical values): fuses into neighboring ops on TPU
    # where the compare+select form was emitted as standalone kernels
    a = 0.5 * (1.0 + negative_slope)
    b = 0.5 * (1.0 - negative_slope)
    return a * x + b * jnp.abs(x)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x)


def adaptive_avg_pool_11(x: jnp.ndarray) -> jnp.ndarray:
    """Global average pool NHWC -> [B, C]."""
    return jnp.mean(x, axis=(1, 2))


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling, stride 2 (NHWC)."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def reflect_pad_hw(x: jnp.ndarray, pad_h: Tuple[int, int], pad_w: Tuple[int, int]):
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0)), mode="reflect")


def replicate_pad_hw(x: jnp.ndarray, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


# ---------------------------------------------------------------------------
# interpolation (torch F.interpolate semantics via dense-matrix matmuls)
# ---------------------------------------------------------------------------


def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out,in] bilinear interpolation matrix, torch conventions, edge clamp."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
    for i in range(out_size):
        src = i * scale if align_corners else (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(math.floor(src))
        hi = min(lo + 1, in_size - 1)
        f = src - lo
        mat[i, lo] += 1.0 - f
        mat[i, hi] += f
    return mat


def interpolate_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """NHWC bilinear resize matching ``F.interpolate(mode='bilinear')``."""
    h, w = x.shape[1], x.shape[2]
    H, W = size
    mh = jnp.asarray(_bilinear_matrix(h, H, align_corners), dtype=x.dtype)
    mw = jnp.asarray(_bilinear_matrix(w, W, align_corners), dtype=x.dtype)
    y = jnp.einsum("Hh,bhwc->bHwc", mh, x, precision="highest")
    y = jnp.einsum("Ww,bhwc->bhWc", mw, y, precision="highest")
    return y


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False)."""
    return interpolate_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=False)


# ---------------------------------------------------------------------------
# sampling / warping
# ---------------------------------------------------------------------------


def grid_sample_bilinear_blockgather(
    x: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True, padding_zeros: bool = True
) -> jnp.ndarray:
    """grid_sample via ONE lax.gather of 2x2xC blocks per output pixel
    (instead of four row gathers) — alternative engine for TPU A/B."""
    b, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    yc = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    xc = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
    H, W = gx.shape[1], gx.shape[2]
    idx = jnp.stack([yc, xc], axis=-1).reshape(b, H * W, 2)

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    patches = jax.vmap(
        lambda xx, ii: lax.gather(xx, ii, dimension_numbers=dn, slice_sizes=(2, 2, c), mode="clip")
    )(xp, idx)
    patches = patches.reshape(b, H, W, 2, 2, c)

    if padding_zeros:
        def valid(yi, xi):
            return ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(x.dtype)[..., None]
        m00 = valid(y0, x0); m01 = valid(y0, x0 + 1)
        m10 = valid(y0 + 1, x0); m11 = valid(y0 + 1, x0 + 1)
    else:
        m00 = m01 = m10 = m11 = 1.0

    return (
        patches[:, :, :, 0, 0] * m00 * (1 - wx) * (1 - wy)
        + patches[:, :, :, 0, 1] * m01 * wx * (1 - wy)
        + patches[:, :, :, 1, 0] * m10 * (1 - wx) * wy
        + patches[:, :, :, 1, 1] * m11 * wx * wy
    )


def grid_sample_bilinear(
    x: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True, padding_zeros: bool = True
) -> jnp.ndarray:
    """``F.grid_sample(mode='bilinear')`` for NHWC input.

    Args:
        x: [B, h, w, C].
        grid: [B, H, W, 2] normalized coords in [-1, 1], last dim (gx, gy).
    Returns: [B, H, W, C].
    """
    b, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def gather(yi, xi):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = yc * w + xc  # [B, H, W]
        return jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(*idx.shape, c)

    def mask(yi, xi):
        if not padding_zeros:
            return jnp.asarray(1.0, x.dtype)
        return ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    # the zero-padding masks fold into the per-pixel [B,H,W] weights, not the
    # gathered [B,H,W,C] values: mask entries are exactly 0/1, so
    # v*(m*wx*wy) == (v*m)*wx*wy (up to f32 reassociation of the tiny weight
    # product). This removes four full-size select copies per call — a
    # measured HBM hotspot of the no-remat training step.
    w00 = (mask(y0, x0) * (1 - wx) * (1 - wy))[..., None]
    w01 = (mask(y0, x0 + 1) * wx * (1 - wy))[..., None]
    w10 = (mask(y0 + 1, x0) * (1 - wx) * wy)[..., None]
    w11 = (mask(y0 + 1, x0 + 1) * wx * wy)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interp_mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Warp NHWC features by per-pixel flow [B, H, W, 2] (dx, dy), the VSR
    alignment primitive (reference arch_util.py:162)."""
    b, h, w, _ = x.shape
    ys = jnp.arange(h, dtype=x.dtype)
    xs = jnp.arange(w, dtype=x.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]
    gxn = 2.0 * vx / max(w - 1, 1) - 1.0
    gyn = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([gxn, gyn], axis=-1)
    return grid_sample_bilinear(
        x, grid, align_corners=align_corners, padding_zeros=(padding_mode == "zeros")
    )


def resize_flow(flow: jnp.ndarray, size_type: str, sizes, interpolation="bilinear"):
    """Resize a flow field [B, H, W, 2] and rescale its magnitudes."""
    h, w = flow.shape[1], flow.shape[2]
    if size_type == "ratio":
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == "shape":
        out_h, out_w = sizes[0], sizes[1]
    else:
        raise ValueError(f"size_type must be ratio|shape, got {size_type}")
    ratio_h, ratio_w = out_h / h, out_w / w
    scaled = flow * jnp.asarray([ratio_w, ratio_h], dtype=flow.dtype)
    return interpolate_bilinear(scaled, (out_h, out_w), align_corners=False)


def pixel_shuffle(x: jnp.ndarray, upscale: int) -> jnp.ndarray:
    """NHWC pixel shuffle (depth-to-space, torch channel ordering)."""
    b, h, w, c = x.shape
    r = upscale
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c // (r * r))


def pixel_unshuffle(x: jnp.ndarray, downscale: int) -> jnp.ndarray:
    """NHWC pixel unshuffle (space-to-depth, torch channel ordering)."""
    b, h, w, c = x.shape
    r = downscale
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def make_coord(shape: Tuple[int, int], ranges=None, flatten: bool = True):
    """Coordinates at pixel centers in [-1, 1] (LIIF convention,
    reference arch_util.py:457-485)."""
    coord_seqs = []
    for i, n in enumerate(shape):
        if ranges is None:
            v0, v1 = -1.0, 1.0
        else:
            v0, v1 = ranges[i]
        r = (v1 - v0) / (2 * n)
        coord_seqs.append(v0 + r + (2 * r) * jnp.arange(n, dtype=jnp.float32))
    grids = jnp.meshgrid(*coord_seqs, indexing="ij")
    ret = jnp.stack(grids, axis=-1)
    return ret.reshape(-1, ret.shape[-1]) if flatten else ret


def trunc_normal_init(key, shape, mean=0.0, std=1.0, a=-2.0, b=2.0):
    """Truncated normal init (reference arch_util.py:322)."""
    return mean + std * jax.random.truncated_normal(key, a, b, shape, jnp.float32)


# ---------------------------------------------------------------------------
# generic SR building blocks (capability parity with arch_util.py:64-450)
# ---------------------------------------------------------------------------


def residual_block_no_bn_init(ic: "InitCtx", prefix: str, num_feat: int = 64,
                              res_scale_init: float = 0.1) -> None:
    """Plain 2-conv residual block (reference ResidualBlockNoBN,
    arch_util.py:64): convs scaled-init by 0.1 when res_scale == 1."""
    ic.conv(f"{prefix}conv1", 3, 3, num_feat, num_feat)
    ic.conv(f"{prefix}conv2", 3, 3, num_feat, num_feat)
    for name in (f"{prefix}conv1.weight", f"{prefix}conv2.weight"):
        ic.params[name] = ic.params[name] * res_scale_init


def residual_block_no_bn_apply(ctx: Ctx, prefix: str, x: jnp.ndarray,
                               res_scale: float = 1.0) -> jnp.ndarray:
    y = jax.nn.relu(conv2d(ctx, f"{prefix}conv1", x, padding=1))
    y = conv2d(ctx, f"{prefix}conv2", y, padding=1)
    return x + y * res_scale


def upsample_pixelshuffle_init(ic: "InitCtx", prefix: str, scale: int, num_feat: int) -> None:
    """conv + pixel_shuffle upsampler for integer scales 2^n / 3
    (reference Upsample, arch_util.py:95)."""
    idx = 0
    if (scale & (scale - 1)) == 0:  # power of 2
        n = int(math.log2(scale))
        for _ in range(n):
            ic.conv(f"{prefix}{idx}", 3, 3, num_feat, 4 * num_feat)
            idx += 2  # skip the parameter-free PixelShuffle slots
    elif scale == 3:
        ic.conv(f"{prefix}0", 3, 3, num_feat, 9 * num_feat)
    else:
        raise ValueError(f"scale {scale} is not supported (2^n and 3 only).")


def upsample_pixelshuffle_apply(ctx: Ctx, prefix: str, x: jnp.ndarray, scale: int) -> jnp.ndarray:
    if (scale & (scale - 1)) == 0:
        idx = 0
        for _ in range(int(math.log2(scale))):
            x = conv2d(ctx, f"{prefix}{idx}", x, padding=1)
            x = pixel_shuffle(x, 2)
            idx += 2
        return x
    if scale == 3:
        x = conv2d(ctx, f"{prefix}0", x, padding=1)
        return pixel_shuffle(x, 3)
    raise ValueError(f"scale {scale} is not supported (2^n and 3 only).")


def dynamic_conv2d_init(ic: "InitCtx", prefix: str, in_planes: int, out_planes: int,
                        kernel_size: int = 3, K: int = 5) -> None:
    """Vanilla dynamic convolution bank + input-conditioned softmax routing
    (DASR's Dynamic_conv2d, reference arch_util.py:369-450)."""
    att = max(in_planes // 4, 16)
    ic.conv(f"{prefix}attention.fc1", 1, 1, in_planes, att)
    ic.conv(f"{prefix}attention.fc2", 1, 1, att, K)
    bank = jnp.stack([
        kaiming_uniform(ic.next_key(), (kernel_size, kernel_size, in_planes, out_planes))
        for _ in range(K)
    ])
    ic.raw(f"{prefix}weight", bank)
    ic.raw(f"{prefix}bias", jnp.zeros((K, out_planes), jnp.float32))


def dynamic_conv2d_apply(ctx: Ctx, prefix: str, x: jnp.ndarray, padding: int = 1,
                         temperature: float = 30.0) -> jnp.ndarray:
    from ..ops.osconv import osconv_apply_einsum

    att = adaptive_avg_pool_11(x)  # [B, Cin]
    w1 = ctx[f"{prefix}attention.fc1.weight"][0, 0]
    att = jax.nn.relu(att @ w1 + ctx[f"{prefix}attention.fc1.bias"])
    w2 = ctx[f"{prefix}attention.fc2.weight"][0, 0]
    att = jax.nn.softmax((att @ w2 + ctx[f"{prefix}attention.fc2.bias"]) / temperature, axis=1)
    bank = ctx[f"{prefix}weight"]  # [K, kh, kw, I, O]
    agg = jnp.einsum("bK,Kklio->bklio", att, bank)
    bias = jnp.einsum("bK,Ko->bo", att, ctx[f"{prefix}bias"])
    y = osconv_apply_einsum(x, agg, 1, padding)
    return y + bias[:, None, None, :]
