"""Generate meta-info manifests from official dataset lists.

The reference ships pre-generated meta txt files (lbasicsr/data/meta_info/);
those are derived from the datasets' official split lists, which we do not
re-distribute. This script regenerates them locally:

  - Vimeo90K: from sep_trainlist.txt / sep_testlist.txt of the official
    vimeo_septuplet release -> '<clip>/<seq> (256,448,3)' lines.
  - REDS: from the extracted train_sharp folders -> '<clip> 100 (720,1280,3)'.

Usage:
    python scripts/data_preparation/generate_meta_info.py vimeo90k \
        --list datasets/vimeo90k/vimeo_septuplet/sep_trainlist.txt \
        --out savsr_tpu/data/meta_info/meta_info_Vimeo90K_train_GT.txt
    python scripts/data_preparation/generate_meta_info.py reds \
        --root datasets/REDS/train_sharp \
        --out savsr_tpu/data/meta_info/meta_info_REDS_GT.txt
"""

from __future__ import annotations

import argparse
import os
import os.path as osp


def vimeo90k(list_path: str, out_path: str) -> None:
    with open(list_path) as f:
        keys = [line.strip() for line in f if line.strip()]
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for key in keys:
            f.write(f"{key} (256,448,3)\n")
    print(f"wrote {len(keys)} entries to {out_path}")


def reds(root: str, out_path: str) -> None:
    clips = sorted(d for d in os.listdir(root) if osp.isdir(osp.join(root, d)))
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for clip in clips:
            n = len(os.listdir(osp.join(root, clip)))
            f.write(f"{clip} {n} (720,1280,3)\n")
    print(f"wrote {len(clips)} clips to {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("vimeo90k")
    p1.add_argument("--list", required=True)
    p1.add_argument("--out", required=True)
    p2 = sub.add_parser("reds")
    p2.add_argument("--root", required=True)
    p2.add_argument("--out", required=True)
    args = parser.parse_args()
    if args.cmd == "vimeo90k":
        vimeo90k(args.list, args.out)
    else:
        reds(args.root, args.out)
