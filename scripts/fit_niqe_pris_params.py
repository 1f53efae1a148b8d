"""Fit NIQE pristine parameters from a folder of pristine images.

Makes NIQE self-sufficient: the reference depends on BasicSR's pretrained
``niqe_pris_params.npz`` release asset (lbasicsr/metrics/niqe.py:144 loads
it; the reference checkout itself ships without it). This script rebuilds
an equivalent asset from any corpus of pristine (sharp, natural,
undistorted) images via the original NIQE model-estimation procedure
(Mittal et al. 2013): 36-dim per-block features at two scales, sharp-block
selection, MVG fit. Numbers from a custom corpus are self-consistent but
NOT comparable to published NIQE scores — for those, drop the official
BasicSR asset at savsr_tpu/metrics/niqe_pris_params.npz.

Usage:
    python scripts/fit_niqe_pris_params.py --input <folder-of-images> \
        [--output savsr_tpu/metrics/niqe_pris_params.npz] \
        [--sh-th 0.75] [--block 96] [--convert-to y|gray]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from savsr_tpu.metrics.niqe import fit_pris_params  # noqa: E402
from savsr_tpu.utils.color_util import bgr2ycbcr  # noqa: E402

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def load_gray_images(folder: str, convert_to: str = "y"):
    paths = sorted(
        p for p in glob.glob(os.path.join(folder, "**", "*"), recursive=True)
        if p.lower().endswith(IMG_EXTS)
    )
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        if img is None:
            print(f"  skip unreadable {p}")
            continue
        img = img.astype(np.float32)
        if convert_to == "y":
            gray = bgr2ycbcr(img / 255.0, y_only=True) * 255.0
        else:
            gray = cv2.cvtColor(img / 255.0, cv2.COLOR_BGR2GRAY) * 255.0
        yield p, np.squeeze(gray)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="folder of pristine images")
    ap.add_argument(
        "--output",
        default=os.path.join(os.path.dirname(__file__), "..", "savsr_tpu",
                             "metrics", "niqe_pris_params.npz"),
    )
    ap.add_argument("--sh-th", type=float, default=0.75,
                    help="sharp-block selection threshold (fraction of max)")
    ap.add_argument("--block", type=int, default=96, help="block size")
    ap.add_argument("--convert-to", choices=["y", "gray"], default="y")
    args = ap.parse_args()

    imgs, names = [], []
    for p, g in load_gray_images(args.input, args.convert_to):
        if g.shape[0] < args.block or g.shape[1] < args.block:
            print(f"  skip too-small {p} ({g.shape})")
            continue
        imgs.append(g)
        names.append(p)
    if not imgs:
        print(f"no usable images under {args.input}", file=sys.stderr)
        return 1
    print(f"fitting pristine MVG from {len(imgs)} images ...")
    pris = fit_pris_params(
        imgs, block_size_h=args.block, block_size_w=args.block,
        sharpness_threshold=args.sh_th,
    )
    out = os.path.abspath(args.output)
    np.savez(out, **pris)
    print(f"wrote {out}: mu_pris_param{pris['mu_pris_param'].shape}, "
          f"cov_pris_param{pris['cov_pris_param'].shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
