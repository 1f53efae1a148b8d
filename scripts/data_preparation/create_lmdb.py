"""Create LMDB datasets for DIV2K / REDS / Vimeo90K.

Counterpart of the reference scripts/data_preparation/create_lmdb.py; uses
savsr_tpu.utils.lmdb_util (requires the ``lmdb`` package).

Usage:
    python scripts/data_preparation/create_lmdb.py --dataset vimeo90k \
        --data-root datasets/vimeo90k/vimeo_septuplet/sequences \
        --lmdb-path datasets/vimeo90k/vimeo90k_train_GT7frames.lmdb \
        --meta-info savsr_tpu/data/meta_info/meta_info_Vimeo90K_train_GT.txt
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.abspath(osp.join(__file__, "..", "..", "..")))

from savsr_tpu.utils.lmdb_util import make_lmdb_from_imgs  # noqa: E402
from savsr_tpu.utils.misc import scandir  # noqa: E402


def prepare_keys_div2k(folder_path):
    img_path_list = sorted(scandir(folder_path, suffix="png", recursive=False))
    keys = [p.split(".png")[0] for p in img_path_list]
    return img_path_list, keys


def create_lmdb_for_div2k(data_root, lmdb_path):
    img_list, keys = prepare_keys_div2k(data_root)
    make_lmdb_from_imgs(data_root, lmdb_path, img_list, keys)


def prepare_keys_reds(folder_path):
    img_path_list = sorted(scandir(folder_path, suffix="png", recursive=True))
    keys = [v.split(".png")[0] for v in img_path_list]  # e.g. 000/00000000
    return img_path_list, keys


def create_lmdb_for_reds(data_root, lmdb_path):
    img_list, keys = prepare_keys_reds(data_root)
    make_lmdb_from_imgs(data_root, lmdb_path, img_list, keys, multiprocessing_read=True)


def prepare_keys_vimeo90k(folder_path, train_list_path, mode="gt"):
    with open(train_list_path, "r") as fin:
        train_list = [line.strip().split(" ")[0] for line in fin]
    img_path_list, keys = [], []
    n_frames = 7 if mode == "gt" else 7
    for line in train_list:
        folder, sub_folder = line.split("/")
        for j in range(1, n_frames + 1):
            img_path_list.append(osp.join(folder, sub_folder, f"im{j}.png"))
            keys.append(f"{folder}/{sub_folder}/im{j}")
    return img_path_list, keys


def create_lmdb_for_vimeo90k(data_root, lmdb_path, meta_info):
    img_list, keys = prepare_keys_vimeo90k(data_root, meta_info)
    make_lmdb_from_imgs(data_root, lmdb_path, img_list, keys, multiprocessing_read=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True, choices=["div2k", "reds", "vimeo90k"])
    parser.add_argument("--data-root", required=True)
    parser.add_argument("--lmdb-path", required=True)
    parser.add_argument("--meta-info", default=None)
    args = parser.parse_args()
    if args.dataset == "div2k":
        create_lmdb_for_div2k(args.data_root, args.lmdb_path)
    elif args.dataset == "reds":
        create_lmdb_for_reds(args.data_root, args.lmdb_path)
    else:
        create_lmdb_for_vimeo90k(args.data_root, args.lmdb_path, args.meta_info)
