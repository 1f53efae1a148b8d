"""REDS training datasets (windowed + recurrent, fixed and arbitrary scale).

Mirrors lbasicsr/data/reds_dataset.py: keys come from a meta-info manifest
('<clip> <n_frames> <shape>'); REDS4/official validation clips are excluded;
temporal augmentation samples a frame interval per item. AS variants are
GT-only with the batch-level as_collate_fn degradation (same contract as
ASVimeo90KDataset).
"""

from __future__ import annotations

import random
from os import path as osp
from typing import Dict, List

import numpy as np

from ..utils.file_client import FileClient
from ..utils.img_util import imfrombytes
from ..utils.logger import get_root_logger
from ..utils.registry import DATASET_REGISTRY
from .data_util import arbitrary_scale_downsample
from .loader import Dataset
from .transforms import augment, paired_random_crop, single_random_crop
from .vimeo90k_dataset import SCALE_H_LIST, SCALE_W_LIST, SYM_SCALES


def _val_partition(kind: str) -> List[str]:
    if kind == "REDS4":
        return ["000", "011", "015", "020"]
    if kind == "official":
        return [f"{v:03d}" for v in range(240, 270)]
    raise ValueError(
        f"Wrong validation partition {kind}. Supported: ['official', 'REDS4']."
    )


@DATASET_REGISTRY.register()
class REDSDataset(Dataset):
    """Fixed-scale windowed REDS training dataset."""

    _center_windowed = True  # recurrent subclasses take any num_frame

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_root, self.lq_root = opt["dataroot_gt"], opt.get("dataroot_lq")
        if self._center_windowed:
            assert opt["num_frame"] % 2 == 1, "num_frame should be odd"
        self.num_frame = opt["num_frame"]
        self.num_half_frames = opt["num_frame"] // 2

        self.keys = []
        with open(opt["meta_info_file"], "r") as fin:
            for line in fin:
                folder, frame_num, _ = line.split(" ")
                self.keys.extend([f"{folder}/{i:08d}" for i in range(int(frame_num))])
        val = _val_partition(opt.get("val_partition", "REDS4"))
        self.keys = [v for v in self.keys if v.split("/")[0] not in val]

        self.file_client = None
        self.io_backend_opt = dict(opt["io_backend"])
        self.is_lmdb = self.io_backend_opt.get("type") == "lmdb"
        if self.is_lmdb:
            self.io_backend_opt["db_paths"] = [self.lq_root, self.gt_root]
            self.io_backend_opt["client_keys"] = ["lq", "gt"]

        self.interval_list = opt.get("interval_list", [1])
        self.random_reverse = opt.get("random_reverse", False)
        get_root_logger().info(
            f"REDS dataset: {len(self.keys)} keys; interval list "
            f"{self.interval_list}; random reverse {self.random_reverse}."
        )

    def _ensure_client(self):
        if self.file_client is None:
            o = dict(self.io_backend_opt)
            self.file_client = FileClient(o.pop("type"), **o)

    def _read(self, path, client_key):
        return imfrombytes(self.file_client.get(path, client_key), float32=True)

    def _neighbor_list(self, clip_frames: int = 100):
        interval = random.choice(self.interval_list)
        center = random.randint(0, clip_frames - 1)
        start = center - self.num_half_frames * interval
        end = center + self.num_half_frames * interval
        while start < 0 or end > clip_frames - 1:
            center = random.randint(0, clip_frames - 1)
            start = center - self.num_half_frames * interval
            end = center + self.num_half_frames * interval
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()
        return center, neighbors

    def __getitem__(self, index: int):
        self._ensure_client()
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        key = self.keys[index]
        clip_name, frame_name = key.split("/")

        interval = random.choice(self.interval_list)
        center = int(frame_name)
        start = center - self.num_half_frames * interval
        end = center + self.num_half_frames * interval
        while start < 0 or end > 99:
            center = random.randint(0, 99)
            start = center - self.num_half_frames * interval
            end = center + self.num_half_frames * interval
        frame_name = f"{center:08d}"
        neighbors = list(range(start, end + 1, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        if self.is_lmdb:
            img_gt = self._read(f"{clip_name}/{frame_name}", "gt")
        else:
            img_gt = self._read(osp.join(self.gt_root, clip_name, f"{frame_name}.png"), "gt")
        img_lqs = []
        for n in neighbors:
            if self.is_lmdb:
                img_lqs.append(self._read(f"{clip_name}/{n:08d}", "lq"))
            else:
                img_lqs.append(
                    self._read(osp.join(self.lq_root, clip_name, f"{n:08d}.png"), "lq")
                )

        img_gt, img_lqs = paired_random_crop(img_gt, img_lqs, gt_size, scale, key)
        img_lqs.append(img_gt)
        img_results = augment(img_lqs, self.opt["use_hflip"], self.opt["use_rot"])
        img_results = [
            np.ascontiguousarray(v[..., ::-1], dtype=np.float32) for v in img_results
        ]
        return {
            "lq": np.stack(img_results[:-1], axis=0),
            "gt": img_results[-1],
            "key": key,
        }

    def __len__(self) -> int:
        return len(self.keys)


@DATASET_REGISTRY.register()
class ASREDSDataset(REDSDataset):
    """Arbitrary-scale windowed REDS: GT-only + batch-level degradation
    (reference reds_dataset.py:211-382)."""

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.epoch = 0
        self.init_int_scale = opt.get("init_int_scale", False)
        self.single_scale_ft = opt.get("single_scale_ft", False)
        self.CL_train_set = opt.get("CL_train_set", None)
        self.lq_size = opt.get("lq_size", 60)
        self.max_scale = opt.get("max_scale", 4)
        if opt.get("only_sy_scale", False):
            self.scale_h_list, self.scale_w_list = list(SYM_SCALES), list(SYM_SCALES)
        else:
            self.scale_h_list, self.scale_w_list = list(SCALE_H_LIST), list(SCALE_W_LIST)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __getitem__(self, index: int):
        self._ensure_client()
        key = self.keys[index]
        clip_name, _ = key.split("/")
        _, neighbors = self._neighbor_list()

        img_gts = []
        for n in neighbors:
            if self.is_lmdb:
                img_gts.append(self._read(f"{clip_name}/{n:08d}", "gt"))
            else:
                img_gts.append(
                    self._read(osp.join(self.gt_root, clip_name, f"{n:08d}.png"), "gt")
                )
        patch = self.lq_size * self.max_scale
        img_gts = single_random_crop(img_gts, (patch, patch))
        img_gts = augment(img_gts, self.opt["use_hflip"], self.opt["use_rot"])
        img_gts = np.stack(
            [np.ascontiguousarray(v[..., ::-1], dtype=np.float32) for v in img_gts], axis=0
        )
        return {"gt": img_gts, "key": key}

    # scale curriculum + collate shared with the Vimeo AS implementation
    draw_scale = None  # replaced below


# reuse the AS collate machinery from the Vimeo dataset without inheriting its
# IO layout
from .vimeo90k_dataset import ASVimeo90KDataset as _ASV  # noqa: E402

ASREDSDataset.cl_train_stg = _ASV.cl_train_stg
ASREDSDataset.draw_scale = _ASV.draw_scale
ASREDSDataset.as_collate_fn = _ASV.as_collate_fn


@DATASET_REGISTRY.register()
class REDSRecurrentDataset(REDSDataset):
    """Recurrent REDS: consecutive num_frame sequence from a random start
    (reference reds_dataset.py:385-529)."""

    _center_windowed = False

    def __getitem__(self, index: int):
        self._ensure_client()
        scale = self.opt["scale"]
        gt_size = self.opt["gt_size"]
        key = self.keys[index]
        clip_name, frame_name = key.split("/")

        interval = random.choice(self.interval_list)
        start = int(frame_name)
        if start > 100 - self.num_frame * interval:
            start = random.randint(0, 100 - self.num_frame * interval)
        neighbors = list(range(start, start + self.num_frame * interval, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        img_lqs, img_gts = [], []
        for n in neighbors:
            if self.is_lmdb:
                img_lqs.append(self._read(f"{clip_name}/{n:08d}", "lq"))
                img_gts.append(self._read(f"{clip_name}/{n:08d}", "gt"))
            else:
                img_lqs.append(
                    self._read(osp.join(self.lq_root, clip_name, f"{n:08d}.png"), "lq")
                )
                img_gts.append(
                    self._read(osp.join(self.gt_root, clip_name, f"{n:08d}.png"), "gt")
                )

        img_gts, img_lqs = paired_random_crop(img_gts, img_lqs, gt_size, scale, key)
        imgs = augment(img_lqs + img_gts, self.opt["use_hflip"], self.opt["use_rot"])
        imgs = [np.ascontiguousarray(v[..., ::-1], dtype=np.float32) for v in imgs]
        t = len(neighbors)
        return {
            "lq": np.stack(imgs[:t], axis=0),
            "gt": np.stack(imgs[t:], axis=0),
            "key": key,
        }


@DATASET_REGISTRY.register()
class ASREDSRecurrentDataset(ASREDSDataset):
    """Recurrent arbitrary-scale REDS (reference reds_dataset.py:532-718):
    GT-only consecutive sequences + AS collate keeping full sequences."""

    _center_windowed = False

    def __init__(self, opt: dict):
        super().__init__(opt)
        self.flip_sequence = opt.get("flip_sequence", False)

    def __getitem__(self, index: int):
        self._ensure_client()
        key = self.keys[index]
        clip_name, frame_name = key.split("/")
        interval = random.choice(self.interval_list)
        start = int(frame_name)
        if start > 100 - self.num_frame * interval:
            start = random.randint(0, 100 - self.num_frame * interval)
        neighbors = list(range(start, start + self.num_frame * interval, interval))
        if self.random_reverse and random.random() < 0.5:
            neighbors.reverse()

        img_gts = []
        for n in neighbors:
            if self.is_lmdb:
                img_gts.append(self._read(f"{clip_name}/{n:08d}", "gt"))
            else:
                img_gts.append(
                    self._read(osp.join(self.gt_root, clip_name, f"{n:08d}.png"), "gt")
                )
        patch = self.lq_size * self.max_scale
        img_gts = single_random_crop(img_gts, (patch, patch))
        img_gts = augment(img_gts, self.opt["use_hflip"], self.opt["use_rot"])
        img_gts = np.stack(
            [np.ascontiguousarray(v[..., ::-1], dtype=np.float32) for v in img_gts], axis=0
        )
        return {"gt": img_gts, "key": key}

    def as_collate_fn(self, batch: List[Dict]) -> Dict:
        out: Dict = {"key": [d["key"] for d in batch]}
        gt = np.stack([d["gt"] for d in batch], axis=0)
        scale_h, scale_w = self.draw_scale()
        lq_size = self.opt["lq_size"]
        gt_size = (round(lq_size * scale_h), round(lq_size * scale_w))
        b, t, h, w, c = gt.shape
        gt = single_random_crop(gt.reshape(b * t, h, w, c), gt_size)
        gt = gt.reshape(b, t, *gt.shape[1:])
        lq = arbitrary_scale_downsample(
            gt, (scale_h, scale_w), self.opt.get("downsample_mode", "torch")
        )
        if self.flip_sequence:
            gt = np.concatenate([gt, gt[:, ::-1]], axis=1)
            lq = np.concatenate([lq, lq[:, ::-1]], axis=1)
        out["gt"] = np.ascontiguousarray(gt)
        out["lq"] = np.ascontiguousarray(lq)
        out["scale"] = (scale_h, scale_w)
        return out
