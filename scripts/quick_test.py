"""Folder-vs-folder PSNR/SSIM scorer + offline LR-set generation.

Counterpart of the reference's quick_test / downsample_video utilities
(lbasicsr/data/data_util.py:423-893): score SR dumps from any model against
GT folders (with as_mod_crop/resize reconciliation), or generate fixed
arbitrary-scale LR datasets on disk.

Usage:
    python scripts/quick_test.py score --sr results/.../visualization/Vid4_x4 \
        --gt datasets/Vid4/GT --scale 4 4 [--y-channel]
    python scripts/quick_test.py downsample --gt datasets/Vid4/GT \
        --out datasets/Vid4/asBI_x2.5 --scale 2.5 2.5 [--mode torch]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.abspath(osp.join(__file__, "..", "..")))

from savsr_tpu.data.data_util import arbitrary_scale_downsample  # noqa: E402
from savsr_tpu.data.resize import resize_np  # noqa: E402
from savsr_tpu.data.transforms import as_mod_crop  # noqa: E402
from savsr_tpu.metrics import calculate_psnr, calculate_ssim  # noqa: E402
from savsr_tpu.utils.img_util import imread, imwrite  # noqa: E402
from savsr_tpu.utils.misc import scandir  # noqa: E402


def _folders(root):
    return sorted(
        d for d in os.listdir(root) if osp.isdir(osp.join(root, d))
    ) or [""]


def score(sr_root, gt_root, scale, y_channel=True, crop_border=0):
    results = {}
    for folder in _folders(gt_root):
        gt_dir = osp.join(gt_root, folder)
        sr_dir = osp.join(sr_root, folder)
        if not osp.isdir(sr_dir):
            print(f"skip {folder}: no SR folder")
            continue
        gt_files = sorted(scandir(gt_dir))
        sr_files = sorted(scandir(sr_dir))
        assert len(gt_files) == len(sr_files), (folder, len(gt_files), len(sr_files))
        psnrs, ssims = [], []
        for gt_f, sr_f in zip(gt_files, sr_files):
            gt = imread(osp.join(gt_dir, gt_f))
            sr = imread(osp.join(sr_dir, sr_f))
            gt = as_mod_crop(gt, tuple(scale))
            if sr.shape != gt.shape:  # reconcile by antialiased bicubic
                sr = resize_np(
                    sr.astype(np.float32) / 255.0, gt.shape[:2], mode="torch"
                )
                sr = (np.clip(sr, 0, 1) * 255.0).round().astype(np.uint8)
            psnrs.append(
                calculate_psnr(gt.astype(np.float64), sr.astype(np.float64),
                               crop_border=crop_border, test_y_channel=y_channel)
            )
            ssims.append(
                calculate_ssim(gt.astype(np.float64), sr.astype(np.float64),
                               crop_border=crop_border, test_y_channel=y_channel)
            )
        results[folder] = (float(np.mean(psnrs)), float(np.mean(ssims)))
        print(f"{folder}: PSNR {results[folder][0]:.4f}  SSIM {results[folder][1]:.4f}")
    if results:
        avg_p = np.mean([v[0] for v in results.values()])
        avg_s = np.mean([v[1] for v in results.values()])
        print(f"AVERAGE: PSNR {avg_p:.4f}  SSIM {avg_s:.4f}")
    return results


def downsample(gt_root, out_root, scale, mode="torch"):
    for folder in _folders(gt_root):
        gt_dir = osp.join(gt_root, folder)
        out_dir = osp.join(out_root, folder)
        for f in sorted(scandir(gt_dir)):
            img = imread(osp.join(gt_dir, f), float32=True)
            img = as_mod_crop(img, tuple(scale))
            lr = arbitrary_scale_downsample(
                img[None, ..., ::-1].copy()[None], tuple(scale), mode=mode
            )[0, 0][..., ::-1]
            lr = (np.clip(lr, 0, 1) * 255.0).round().astype(np.uint8)
            imwrite(lr, osp.join(out_dir, f))
        print(f"downsampled {folder} -> {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("score")
    p1.add_argument("--sr", required=True)
    p1.add_argument("--gt", required=True)
    p1.add_argument("--scale", nargs=2, type=float, default=[4, 4])
    p1.add_argument("--y-channel", action="store_true", default=True)
    p1.add_argument("--crop-border", type=int, default=0)
    p2 = sub.add_parser("downsample")
    p2.add_argument("--gt", required=True)
    p2.add_argument("--out", required=True)
    p2.add_argument("--scale", nargs=2, type=float, required=True)
    p2.add_argument("--mode", default="torch", choices=["torch", "core"])
    args = parser.parse_args()
    if args.cmd == "score":
        score(args.sr, args.gt, args.scale, args.y_channel, args.crop_border)
    else:
        downsample(args.gt, args.out, args.scale, args.mode)
