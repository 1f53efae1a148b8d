"""Recurrent-VSR models: full-sequence training/eval.

Counterpart of lbasicsr/models/video_recurrent_model.py: optional separate
LR for flow modules, flow-freeze for the first N iters, folder-level eval
sharding padded to the process count (anti-deadlock), ``flip_seq`` temporal
self-ensemble and ``center_frame_only``.
"""

from __future__ import annotations

from collections import Counter
from os import path as osp

import jax
import numpy as np

from ..metrics import calculate_metric
from ..utils.img_util import array2img, imwrite
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .base_model import split_params
from .video_base_model import VideoBaseModel


@MODEL_REGISTRY.register()
class VideoRecurrentModel(VideoBaseModel):
    def __init__(self, opt):
        super().__init__(opt)
        if self.is_train:
            self.fix_flow_iter = opt["train"].get("fix_flow")
            self.flow_lr_mul = opt["train"].get("flow_lr_mul", 1)

    def setup_optimizers(self):
        train_opt = self.opt["train"]
        self.flow_lr_mul = train_opt.get("flow_lr_mul", 1)
        get_root_logger().info(f"Multiple the learning rate for flow network with {self.flow_lr_mul}.")
        super().setup_optimizers()

    def _grad_mask(self, trainable, current_iter):
        """Zero/scale gradients of flow ('spynet'/'deform') params: freeze for
        the first fix_flow iters, then scale by flow_lr_mul."""
        fix = getattr(self, "fix_flow_iter", None)
        mul = getattr(self, "flow_lr_mul", 1)

        def factor(key):
            is_flow = ("spynet" in key) or ("deform" in key) or ("flow" in key)
            if not is_flow:
                return 1.0
            if fix and current_iter < fix:
                return 0.0
            return mul

        return {k: factor(k) for k in trainable}

    def optimize_parameters(self, current_iter):
        factors = self._grad_mask(split_params(self.params)[0], current_iter)
        self._flow_factors = factors if any(v != 1.0 for v in factors.values()) else None
        super().optimize_parameters(current_iter)

    def test(self):
        n = self.lq.shape[1]
        flip_seq = self.opt["val"].get("flip_seq", False)
        self.center_frame_only = self.opt["val"].get("center_frame_only", False)
        lq = self.lq
        if flip_seq:
            lq = np.concatenate([np.asarray(lq), np.asarray(lq)[:, ::-1]], axis=1)
            self.lq = lq
        super().test()
        if flip_seq:
            out = np.asarray(self.output)
            self.output = 0.5 * (out[:, :n] + out[:, n:][:, ::-1])
        if self.center_frame_only:
            self.output = np.asarray(self.output)[:, n // 2]

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        """Folder-level eval: each process takes a stride of folders; the
        folder list is padded so every process runs the same number of
        iterations (anti-deadlock, reference video_recurrent_model.py:92-99)."""
        dataset = dataloader.dataset
        dataset_name = dataset.opt["name"]
        with_metrics = self.opt["val"]["metrics"] is not None
        rank, world_size = jax.process_index(), jax.process_count()

        if with_metrics:
            if not hasattr(self, "metric_results"):
                self.metric_results = {}
            num_frame_each_folder = Counter(dataset.data_info["folder"])
            for folder, num_frame in num_frame_each_folder.items():
                self.metric_results[folder] = np.zeros(
                    (num_frame, len(self.opt["val"]["metrics"])), dtype=np.float64
                )
            self._initialize_best_metric_results(dataset_name)
            for folder in self.metric_results:
                self.metric_results[folder][:] = 0

        num_folders = len(dataset)
        num_pad = (world_size - (num_folders % world_size)) % world_size
        metric_data = {}
        for i in range(rank, num_folders + num_pad, world_size):
            idx = min(i, num_folders - 1)
            val_data = dict(dataset[idx])
            folder = val_data["folder"]
            val_data["lq"] = val_data["lq"][None]
            val_data["gt"] = val_data["gt"][None]
            self.feed_data(val_data)
            self.test()
            visuals = self.get_current_visuals()
            del self.lq

            if i < num_folders:
                out_seq = np.asarray(visuals["result"])[0]  # [T,H,W,C]
                gt_seq = np.asarray(visuals["gt"])[0] if "gt" in visuals else None
                for fi in range(out_seq.shape[0]):
                    result_img = array2img(out_seq[fi])
                    metric_data["img"] = result_img
                    if gt_seq is not None:
                        metric_data["img2"] = array2img(gt_seq[fi])
                    if save_img and not self.opt["is_train"]:
                        suffix = self.opt["val"].get("suffix") or self.opt["name"]
                        imwrite(
                            result_img,
                            osp.join(self.opt["path"]["visualization"], dataset_name,
                                     folder, f"{fi:08d}_{suffix}.png"),
                        )
                    if with_metrics:
                        for mi, opt_ in enumerate(self.opt["val"]["metrics"].values()):
                            self.metric_results[folder][fi, mi] += calculate_metric(
                                metric_data, opt_
                            )

        if with_metrics:
            if world_size > 1:
                from jax.experimental import multihost_utils

                for folder in self.metric_results:
                    self.metric_results[folder] = np.asarray(
                        multihost_utils.process_allgather(
                            self.metric_results[folder]
                        ).sum(axis=0)
                    )
            self._log_validation_metric_values(current_iter, dataset_name, tb_logger)

    def get_current_visuals(self):
        """Sequence outputs skip the single-image BI post-process; shape
        reconciliation happens per frame in validation."""
        from collections import OrderedDict

        out = np.asarray(self.output)
        d = OrderedDict()
        d["result"] = out
        if self.gt is not None:
            gt = np.asarray(self.gt)
            if out.ndim == 5 and out.shape != gt.shape:
                from ..data.resize import resize_np

                out = resize_np(out, (gt.shape[-3], gt.shape[-2]), mode="torch")
                d["result"] = out
            d["gt"] = gt
        return d


@MODEL_REGISTRY.register()
class ASVideoRecurrentModel(VideoRecurrentModel):
    """Recurrent model whose forward is conditioned on the batch scale
    (reference video_recurrent_model.py:204-246); with functional apply the
    scale is simply threaded through feed_data -> test/optimize."""

    def test(self):
        # scale already captured in feed_data; identical flow otherwise
        super().test()
