"""42-scale eval-sweep wall-clock: fixed global bucket vs bucket_auto.

Builds a synthetic Vid4-style clip, sweeps the 42 scale blocks of the
shipped test config through ``savsr_tpu.test`` with (a) one fixed global
bucket and (b) the auto-planned buckets, and reports wall-clock + PSNR
agreement (VERDICT r2 #5 done-criteria artifact). Uses the tiny-ish GT
size ``--gt-size`` so the chip run stays in minutes; the relative gain is
what matters (the auto plan stops small scales paying the big-canvas
cost).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import re
import time

import numpy as np


def synth_vid4(root, gt_h, gt_w, n_frames):
    import cv2

    rng = np.random.default_rng(0)
    d = os.path.join(root, "GT", "calendar")
    os.makedirs(d, exist_ok=True)
    yy, xx = np.mgrid[0:gt_h, 0:gt_w]
    base = (120 + 80 * np.sin(yy / 9.0)[..., None] * np.cos(xx / 11.0)[..., None]
            + 40 * rng.random((gt_h, gt_w, 3))).clip(0, 255).astype(np.uint8)
    for i in range(n_frames):
        cv2.imwrite(os.path.join(d, f"{i:08d}.png"), np.roll(base, 3 * i, axis=1))


def scales_from_config():
    txt = open("options/test/SAVSR/test_SAVSR_Vid4_asBI.yml").read()
    pat = re.findall(r"downsampling_scale: !!python/tuple \[([\d.]+), ([\d.]+)\]", txt)
    return [(float(a), float(b)) for a, b in pat]


def run_sweep(gt_root, scales, bucket_block, name):
    from savsr_tpu.test import test_pipeline
    import sys

    blocks = []
    for i, (sh, sw) in enumerate(scales):
        blocks.append(f"""
  test_{i:02d}:
    name: Vid4_x{sh}_{sw}
    type: ASVideoTestDataset
    dataroot_gt: {gt_root}
    dataroot_lq: {gt_root}
    io_backend: {{type: disk}}
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [{sh}, {sw}]
    downsampling_mode: torch""")
    yml = f"""
name: sweep_{name}
model_type: ASVSRModel
num_gpu: 1
manual_seed: 0
datasets:{''.join(blocks)}

network_g:
  type: SAVSR
  num_in_ch: 3
  num_feat: 64
  num_frame: 7
  slid_win: 3
  fusion_win: 5
  interval: 0
  w1_num_block: 4
  w2_num_block: 2
  n_resgroups: 4
  n_resblocks: 8
  center_frame_idx: ~

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

val:
  save_img: false
  suffix: ~
{bucket_block}
  metrics:
    psnr_y:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: true
"""
    cfg = f"/tmp/sweep_{name}.yml"
    open(cfg, "w").write(yml)
    sys.argv = ["test.py", "-opt", cfg]
    t0 = time.perf_counter()
    results = test_pipeline("/tmp")
    dt = time.perf_counter() - t0
    return dt, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-size", default="144x176")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scales", type=int, default=0, help="limit blocks (0=all)")
    args = ap.parse_args()
    gt_h, gt_w = map(int, args.gt_size.split("x"))
    root = "/tmp/sweep_vid4"
    synth_vid4(root, gt_h, gt_w, args.frames)
    scales = scales_from_config()
    if args.scales:
        scales = scales[:: max(1, len(scales) // args.scales)][: args.scales]
    print(f"{len(scales)} scale blocks, GT {gt_h}x{gt_w}, {args.frames} frames")

    # fixed global bucket: must cover the x1.1 LR (largest canvas) and the
    # x4 HR (largest output)
    lr_h = -(-int(gt_h / 1.1) + 18 // 1) // 16 * 16
    lr_w = -(-int(gt_w / 1.1) + 18 // 1) // 16 * 16
    hr_h = -(-gt_h // 64) * 64
    hr_w = -(-gt_w // 64) * 64
    fixed = ("  bucket_eval: true\n"
             f"  bucket_lr: [{lr_h}, {lr_w}]\n"
             f"  bucket_hr: [{hr_h}, {hr_w}]\n")
    auto = ("  bucket_eval: true\n"
            "  bucket_auto: true\n"
            "  bucket_compile_cost: 45\n")

    t_fixed, r_fixed = run_sweep(os.path.join(root, "GT"), scales, fixed, "fixed")
    t_auto, r_auto = run_sweep(os.path.join(root, "GT"), scales, auto, "auto")
    worst = max(abs(r_fixed[k]["psnr_y"] - r_auto[k]["psnr_y"]) for k in r_fixed)
    print(f"fixed global bucket: {t_fixed:.1f}s   auto buckets: {t_auto:.1f}s "
          f"({t_fixed / t_auto:.2f}x)   worst PSNR delta {worst:.4f} dB")


if __name__ == "__main__":
    main()
