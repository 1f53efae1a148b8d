"""Bucketed any-scale eval: ONE compiled program per (LR bucket, HR bucket).

The multi-scale eval protocol (42 scale blocks x per-clip shapes,
options/test/SAVSR/*.yml; reference test.py sweeps them as separate torch
runs) costs one XLA program per (clip shape, scale) here — measured 31 min
cold / 11 min warm for one clip's 42 programs through the remote compiler
(PERF.md). This module removes the wall: on the CHW engine, the TRUE image
shape and the scale enter the computation only through

  - the flat-layout pad masks (kernel operands),
  - the OSConv GAP normalization 1/(h*w) and scale vector (operands),
  - the STAU coordinate embedding / base sampling grids (operands),
  - the OSAdapt pool/upsample and the final bilinear-add matrices
    (operands, built host-side with the true sizes),

so every (shape, scale) within a static bucket shares one program, exactly:
convs see zeros beyond the true region = the reference's zero padding at
the true border; sta_conv's replicate padding is reproduced by copying the
true edge row/col into the slack; out-of-band sample rows drop out of the
hat sums. Host-side: pad clips into the bucket, build operands per
(shape, scale), crop the HR canvas back after the forward.

Reference protocol anchors: lbasicsr/archs/savsr_arch.py:662-742 (forward:
pad_spatial, windows, trunk, STAU on the un-padded crop, tail + bilinear
skip), lbasicsr/data/transforms.py as_mod_crop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.chw_conv import layout_params
from .arch_util import Ctx, _bilinear_matrix
from .savsr_arch import (
    SAVSRConfig,
    _stau_base_grid,
    _stau_coordinate_input,
    frame_sample_indices,
    get_hw,
    normalize_scale,
    stau_apply,
    window_l2_apply,
)

Operands = Dict[str, jnp.ndarray]

# per-pixel cost anchors for the f32 CHW quality-eval path that
# bucket_eval actually runs (PERF.md: one global Vid4 bucket, LR 528x656,
# costs ~1.4 s/frame; split ~70/30 between LR-proportional work
# (alignment scan + trunk + window_l2) and HR-proportional work
# (STAU + tail), the same ~37:1 per-pixel ratio as the measured bf16
# serving stage split). Only the RATIO matters for grouping; the absolute
# level sets the trade against ``compile_cost``.
_LR_COST = 0.98 / (528 * 656)
_HR_COST = 0.42 / (2112 * 2624)


def bucket_requirements(h0: int, w0: int, scale) -> Tuple[int, int, int, int]:
    """Minimum (lr_h, lr_w, hr_h, hr_w) bucket dims for a (shape, scale)."""
    scale = normalize_scale(scale)
    he, we = h0 + h0 % 2, w0 + w0 % 2
    H, W = get_hw(h0, w0, scale)
    return he + 2, we + 2, H, W


def plan_buckets(items, max_buckets: int = 3, compile_cost: float = 60.0,
                 mult: Tuple[int, int] = (16, 64)):
    """Group a sweep's (shape, scale) set into <= max_buckets buckets
    minimizing estimated wall-clock = padded-canvas compute + one compile
    per bucket (VERDICT r2 #5: one global bucket wastes ~1.4 s/frame on
    small scales; per-(shape, scale) programs pay the compile wall).

    items: list of (h0, w0, scale, weight) — weight = frames at that
    (shape, scale). compile_cost: seconds charged per distinct bucket
    (~60 cold through the remote compiler, ~15 warm; PERF.md).
    Returns {(h0, w0, scale): ((lr_h, lr_w), (hr_h, hr_w))}.
    """
    if not items:
        return {}
    rnd = lambda v, m: -(-v // m) * m
    norm = [(h0, w0, normalize_scale(s), wgt) for h0, w0, s, wgt in items]
    reqs = [bucket_requirements(h0, w0, s) for h0, w0, s, _ in norm]
    order = sorted(range(len(norm)),
                   key=lambda i: (reqs[i][0] * reqs[i][1],
                                  reqs[i][2] * reqs[i][3]))

    def group_cost(i, j):
        """Cost of items order[i..j] sharing one bucket, plus its dims."""
        lr_h = rnd(max(reqs[order[k]][0] for k in range(i, j + 1)), mult[0])
        lr_w = rnd(max(reqs[order[k]][1] for k in range(i, j + 1)), mult[0])
        hr_h = rnd(max(reqs[order[k]][2] for k in range(i, j + 1)), mult[1])
        hr_w = rnd(max(reqs[order[k]][3] for k in range(i, j + 1)), mult[1])
        per_frame = _LR_COST * lr_h * lr_w + _HR_COST * hr_h * hr_w
        frames = sum(norm[order[k]][3] for k in range(i, j + 1))
        return frames * per_frame + compile_cost, ((lr_h, lr_w), (hr_h, hr_w))

    n = len(order)
    # DP over contiguous partitions of the sorted order
    INF = float("inf")
    best = [[(INF, None)] * (max_buckets + 1) for _ in range(n + 1)]
    best[0] = [(0.0, None)] + [(0.0, None)] * max_buckets
    for j in range(1, n + 1):
        for g in range(1, max_buckets + 1):
            for i in range(j):
                prev = best[i][g - 1][0]
                if prev == INF:
                    continue
                c, _ = group_cost(i, j - 1)
                if prev + c < best[j][g][0]:
                    best[j][g] = (prev + c, i)
    g = min(range(1, max_buckets + 1), key=lambda g: best[n][g][0])
    # walk back the split points
    splits, j = [], n
    while j > 0:
        i = best[j][g][1]
        splits.append((i, j))
        j, g = i, g - 1
    plan = {}
    for i, j in splits:
        _, bucket = group_cost(i, j - 1)
        for k in range(i, j):
            h0, w0, s, _ = norm[order[k]]
            plan[(h0, w0, s)] = bucket
    return plan


def _chw_mask(hb: int, wb: int, h: int, w: int) -> np.ndarray:
    """[1, S] flat-layout mask marking the true (h, w) region of a
    (hb, wb) bucket canvas."""
    th, ns, wp, block, s_total, guard = layout_params(hb, wb)
    m = np.zeros((hb + 2, wp), np.float32)
    m[1 : h + 1, 1 : w + 1] = 1.0
    full = np.zeros((s_total,), np.float32)
    full[guard : guard + (hb + 2) * wp] = m.reshape(-1)
    return full[None]


def _rect(hb, wb, h, w):
    m = np.zeros((1, hb, wb, 1), np.float32)
    m[:, :h, :w] = 1.0
    return m


def _pool_matrix(out_size: int, in_bucket: int, in_true: int) -> np.ndarray:
    """Non-overlapping 2x2 mean pooling as a matrix (true rows only)."""
    m = np.zeros((out_size, in_bucket), np.float32)
    for i in range(in_true // 2):
        m[i, 2 * i] = 0.5
        m[i, 2 * i + 1] = 0.5
    return m


def make_bucket_operands(
    h0: int, w0: int, scale, lr_bucket: Tuple[int, int],
    hr_bucket: Tuple[int, int],
) -> Operands:
    """Build the per-(shape, scale) operand set for ``savsr_apply_bucketed``.

    h0, w0: the TRUE (post-as_mod_crop) LR clip size. The canvas layout is:
    reflect-pad to even (he, we) — pad_spatial's job, done host-side — then
    zero-pad to the (hb, wb) bucket.
    """
    hb, wb = lr_bucket
    Hb, Wb = hr_bucket
    scale = normalize_scale(scale)
    he, we = h0 + h0 % 2, w0 + w0 % 2
    H, W = get_hw(h0, w0, scale)
    assert he + 2 <= hb and we + 2 <= wb, "bucket needs >=2 rows/cols slack"
    assert H <= Hb and W <= Wb, (H, W, Hb, Wb)

    ops = {}
    ops["mask_lr"] = jnp.asarray(_chw_mask(hb, wb, he, we))
    ops["m2d"] = jnp.asarray(_rect(hb, wb, he, we))
    ops["m2d0"] = jnp.asarray(_rect(hb, wb, h0, w0))
    ops["m2d_half"] = jnp.asarray(_rect(hb // 2, wb // 2, he // 2, we // 2))
    ops["mask_hr"] = jnp.asarray(_rect(Hb, Wb, H, W))
    ops["inv_hw"] = jnp.float32(1.0 / (he * we))
    ops["scale_vec"] = jnp.asarray([1.0 / scale[0], 1.0 / scale[1]], jnp.float32)
    ops["h_lr"] = jnp.int32(h0)
    ops["w_lr"] = jnp.int32(w0)

    ci = np.zeros((1, Hb, Wb, 4), np.float32)
    ci[:, :H, :W] = _stau_coordinate_input(h0, w0, scale)
    ops["coord_input"] = jnp.asarray(ci)
    # base sampling grid edge-padded into the bucket so per-row min/max
    # (band bounds) are not distorted by padded lanes
    bg = _stau_base_grid(h0, w0, scale)[0]  # [H, W, 2] normalized
    bg = np.pad(bg, ((0, Hb - H), (0, Wb - W), (0, 0)), mode="edge")
    ops["base_grid"] = jnp.asarray(bg)
    ops["off_norm"] = jnp.asarray([2.0 / (w0 - 1), 2.0 / (h0 - 1)], jnp.float32)
    ops["size_m1"] = jnp.asarray([w0 - 1, h0 - 1], jnp.float32)

    ops["pool_row"] = jnp.asarray(_pool_matrix(hb // 2, hb, he))
    ops["pool_col"] = jnp.asarray(_pool_matrix(wb // 2, wb, we))
    ur = np.zeros((hb, hb // 2), np.float32)
    ur[:he, : he // 2] = _bilinear_matrix(he // 2, he, align_corners=False)
    uc = np.zeros((wb, wb // 2), np.float32)
    uc[:we, : we // 2] = _bilinear_matrix(we // 2, we, align_corners=False)
    ops["up_row"] = jnp.asarray(ur)
    ops["up_col"] = jnp.asarray(uc)
    # fused tail kernel operands (savsr_arch.tail_fused_apply)
    from .savsr_arch import _tail_row_mix

    wp = -(-Wb // 128) * 128
    wl = -(-wb // 128) * 128
    tj0, twy = _tail_row_mix(h0, H)
    ops["tail_j0"] = jnp.asarray(np.pad(tj0, (0, Hb - H)))
    ops["tail_wy"] = jnp.asarray(np.pad(twy, (0, Hb - H)))
    hc = np.zeros((wl, wp), np.float32)
    hc[:w0, :W] = _bilinear_matrix(w0, W, align_corners=False).T
    ops["tail_hatc"] = jnp.asarray(hc)
    return ops


def train_bucket_dims(h0: int, w0: int, scale, mult: int = 64) -> Tuple[int, int]:
    """HR canvas dims for bucketed TRAINING: round the true HR size up to a
    multiple of ``mult``. The training LQ crop is FIXED (60x60 in the
    shipped recipe, train_SAVSR_Vimeo90K_asBI.yml) — only the GT side
    varies with the drawn scale, so bucketing the HR canvas alone collapses
    the 60-entry scale pool's 60 programs into the few distinct rounded
    canvas sizes (mult=64: H in 66..240 -> {128, 192, 256})."""
    H, W = get_hw(h0, w0, normalize_scale(scale))
    rnd = lambda v: -(-v // mult) * mult
    return rnd(H), rnd(W)


def make_train_bucket_operands(
    h0: int, w0: int, scale, hr_bucket: Tuple[int, int]
) -> Operands:
    """Operand set for ONE-program-per-HR-bucket multi-scale training
    (savsr_apply(..., bucket=ops) with train=True on the XLA engines).

    Unlike eval bucketing, the LR side is NOT bucketed (the training crop
    is static), so only the HR-side quantities become operands:

      - ``scale_vec``: the ScaleAttention scale vector (osconv_attention),
      - ``coord_input`` / ``base_grid``: the STAU coordinate embedding and
        HR->LR sampling grid, zero-/edge-padded to the canvas,
      - ``up_hr_row`` / ``up_hr_col``: the final bilinear skip as matrices
        whose rows beyond the true HR are zero,
      - ``mask_hr``: the true-region mask (applied before the tail conv so
        canvas slack cannot bleed into the true rows, and by the trainer as
        the loss weight),
      - ``loss_scale``: canvas_numel / true_numel — corrects a masked
        mean-over-canvas back to the reference's mean-over-true-pixels.

    Reference protocol anchor: lbasicsr/models/asvsr_model.py set_scale +
    the per-batch scale pool of lbasicsr/data/vimeo90k_dataset.py.
    """
    Hb, Wb = hr_bucket
    scale = normalize_scale(scale)
    H, W = get_hw(h0, w0, scale)
    assert H <= Hb and W <= Wb, (H, W, Hb, Wb)

    ops: Operands = {}
    ops["scale_vec"] = jnp.asarray(
        [1.0 / scale[0], 1.0 / scale[1]], jnp.float32
    )
    ci = np.zeros((1, Hb, Wb, 4), np.float32)
    ci[:, :H, :W] = _stau_coordinate_input(h0, w0, scale)
    ops["coord_input"] = jnp.asarray(ci)
    bg = _stau_base_grid(h0, w0, scale)[0]  # [H, W, 2] normalized
    bg = np.pad(bg, ((0, Hb - H), (0, Wb - W), (0, 0)), mode="edge")
    ops["base_grid"] = jnp.asarray(bg)
    ops["mask_hr"] = jnp.asarray(_rect(Hb, Wb, H, W))
    ur = np.zeros((Hb, h0), np.float32)
    ur[:H] = _bilinear_matrix(h0, H, align_corners=False)
    uc = np.zeros((Wb, w0), np.float32)
    uc[:W] = _bilinear_matrix(w0, W, align_corners=False)
    ops["up_hr_row"] = jnp.asarray(ur)
    ops["up_hr_col"] = jnp.asarray(uc)
    ops["loss_scale"] = jnp.float32((Hb * Wb) / (H * W))
    return ops


def pad_gt_to_bucket(gt, hr_bucket: Tuple[int, int]):
    """Zero-pad a [B, H, W, C] GT batch to the HR bucket canvas."""
    Hb, Wb = hr_bucket
    return jnp.pad(
        gt, ((0, 0), (0, Hb - gt.shape[1]), (0, Wb - gt.shape[2]), (0, 0))
    )


def pad_clip_to_bucket(x: np.ndarray, lr_bucket: Tuple[int, int]) -> np.ndarray:
    """[B, T, h0, w0, C] -> bucket canvas: reflect-pad to even
    (= pad_spatial, reference savsr_arch.py:670-690), zero-pad to bucket."""
    hb, wb = lr_bucket
    h0, w0 = x.shape[2], x.shape[3]
    x = np.pad(x, ((0, 0), (0, 0), (0, h0 % 2), (0, w0 % 2), (0, 0)),
               mode="reflect")
    return np.pad(
        x, ((0, 0), (0, 0), (0, hb - x.shape[2]), (0, wb - x.shape[3]), (0, 0))
    )


def savsr_apply_bucketed(params, x: jnp.ndarray, ops: Operands,
                         cfg: SAVSRConfig, stau_statics=None) -> jnp.ndarray:
    """SAVSR forward on a bucketed canvas (CHW engine, eval only).

    x: [B, T, hb, wb, C] canvas from ``pad_clip_to_bucket``. Returns the HR
    bucket canvas [B, Hb, Wb, C]; the caller crops [:, :H, :W] host-side.
    ``stau_statics``: optional precomputed coordinate-head outputs for this
    operand set (SAVSR.stau_statics with bucket=ops).
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _apply_bucketed_inner(params, x, ops, cfg, stau_statics)


def _apply_bucketed_inner(params, x, ops, cfg, stau_statics=None):
    from .chw_engine import trunk_apply_chw, window_l1_apply_chw

    split = cfg.conv_precision == "split"
    if split:
        from .chw_engine import model_pc

        pair_pc = model_pc(cfg.num_feat)
    else:
        pair_pc = 64
    ctx = Ctx(params, train=False, engines="eval", conv_engine="chw",
              bucket=ops, stau_statics=stau_statics,
              split_conv=split, pair_pc=pair_pc)
    b, t, hb, wb, _ = x.shape
    dummy_scale = (1.0, 1.0)  # every scale-dependent value rides in ops

    x_center = x[:, cfg.center]
    fwd_idx, bwd_idx = frame_sample_indices(t, cfg.interval)
    x_forward = x[:, jnp.asarray(fwd_idx)] if cfg.interval else x
    x_backward = x[:, jnp.asarray(bwd_idx)] if cfg.interval else x

    n_iter = cfg.iter_win - cfg.slid_win + 1
    half = cfg.slid_win // 2
    s_total = layout_params(hb, wb)[4]
    # split tier: alignment hidden states are pair-carried (chw_engine)
    if ctx.split_conv:
        ht0 = jnp.zeros((b, 2 * cfg.num_feat, s_total), dtype=jnp.bfloat16)
    else:
        ht0 = jnp.zeros((b, cfg.num_feat, s_total), dtype=x.dtype)

    wins_b = jnp.stack(
        [
            x_backward[:, cfg.iter_win - 1 - 2 * half - idx : cfg.iter_win - idx]
            for idx in range(n_iter)
        ]
    )
    wins_f = jnp.stack(
        [x_forward[:, idx : idx + cfg.slid_win] for idx in range(n_iter)]
    )

    def body(carry, xs):
        hf, hp_ = carry
        it_b, it_f = xs
        hf = window_l1_apply_chw(ctx, "f2p_win.", it_b, hf, dummy_scale,
                                 cfg.w1_num_block, out_chw=True)
        hp_ = window_l1_apply_chw(ctx, "p2f_win.", it_f, hp_, dummy_scale,
                                  cfg.w1_num_block, out_chw=True)
        return (hf, hp_), (hf, hp_)

    _, (hf_seq, hp_seq) = jax.lax.scan(body, (ht0, ht0), (wins_b, wins_f))
    h_feat = [
        jnp.concatenate([hf_seq[n_iter - 1 - i], hp_seq[i]], axis=1)
        for i in range(n_iter)
    ]

    n_l2 = (cfg.iter_win - cfg.fusion_win + 1) // 2
    for i in range(n_l2):
        h_feat = window_l2_apply(
            ctx, f"h_win.{i}.", h_feat, dummy_scale,
            win_size=(cfg.iter_win - cfg.slid_win + 1) - 2 * i,
            slid_win=cfg.fusion_win, num_block=cfg.w2_num_block,
            hw=(hb, wb),
        )
    h_feat, align_feat = trunk_apply_chw(
        ctx, h_feat[0], dummy_scale, cfg.n_resgroups, cfg.n_resblocks,
        hw=(hb, wb),
    )

    sr_rows = stau_apply(ctx, "upsample.", h_feat, dummy_scale, align_feat,
                         cfg.num_feat, return_rows=True)
    from .savsr_arch import tail_fused_apply

    Hb, Wb = ops["mask_hr"].shape[1:3]
    sr = tail_fused_apply(ctx, sr_rows, x_center, hb, wb, Hb, Wb)
    # tail_fused_apply returns [B, Hb, Wb, 3]; pad channels were dropped
    return sr
