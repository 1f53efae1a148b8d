"""VideoBaseModel: windowed-VSR validation with per-folder/per-frame metrics.

Counterpart of lbasicsr/models/video_base_model.py. Eval work is sharded
across *processes* by frame striding (``range(process_index, N,
process_count)``) and metric tensors are summed across processes with a
psum via multihost utils — the collective analogue of the reference's
``dist.reduce`` + barrier.
"""

from __future__ import annotations

from collections import Counter
from os import path as osp
from typing import Dict

import jax
import numpy as np

from ..metrics import calculate_metric
from ..utils.img_util import array2img, imwrite
from ..utils.logger import get_root_logger
from ..utils.registry import MODEL_REGISTRY
from .sr_model import SRModel


@MODEL_REGISTRY.register()
class VideoBaseModel(SRModel):
    """Base video SR model (windowed per-frame evaluation)."""

    def dist_validation(self, dataloader, current_iter, tb_logger, save_img):
        dataset = dataloader.dataset
        # arbitrary-scale val sets carry their own scale
        if dataset.opt.get("downsampling_scale", 0) != 0:
            self.opt["scale"] = dataset.opt["downsampling_scale"]
        dataset_name = dataset.opt["name"]
        with_metrics = self.opt["val"].get("metrics") is not None

        if with_metrics:
            self.metric_results: Dict[str, np.ndarray] = {}
            num_frame_each_folder = Counter(dataset.data_info["folder"])
            for folder, num_frame in num_frame_each_folder.items():
                self.metric_results[folder] = np.zeros(
                    (num_frame, len(self.opt["val"]["metrics"])), dtype=np.float64
                )
            self._initialize_best_metric_results(dataset_name)

        rank = jax.process_index()
        world_size = jax.process_count()
        metric_data = {}
        for idx in range(rank, len(dataset), world_size):
            val_data = dataset[idx]
            val_data = dict(val_data)
            val_data["lq"] = val_data["lq"][None]
            val_data["gt"] = val_data["gt"][None]
            folder = val_data["folder"]
            frame_idx, max_idx = val_data["idx"].split("/")
            lq_path = val_data["lq_path"]

            self.feed_data(val_data)
            self.test()
            visuals = self.get_current_visuals()
            result_img = array2img(visuals["result"][0])
            metric_data["img"] = result_img
            if "gt" in visuals:
                metric_data["img2"] = array2img(visuals["gt"][0])

            if save_img:
                if self.opt["is_train"]:
                    raise NotImplementedError(
                        "saving image is not supported during training."
                    )
                if "vimeo" in dataset_name.lower():
                    sp = lq_path.split("/")
                    img_name = f"{sp[-3]}_{sp[-2]}_{sp[-1].split('.')[0]}"
                else:
                    img_name = osp.splitext(osp.basename(lq_path))[0]
                suffix = self.opt["val"].get("suffix") or self.opt["name"]
                save_img_path = osp.join(
                    self.opt["path"]["visualization"], dataset_name, folder,
                    f"{img_name}_{suffix}.png",
                )
                imwrite(result_img, save_img_path)

            if with_metrics:
                if self.opt["val"].get("metrics_device", False):
                    # fast on-device metrics FOR IN-TRAINING MONITORING ONLY:
                    # float path (no uint8 rounding) deviates 0.01-0.03 dB
                    # from the canonical host metrics — more than half the
                    # 0.05 dB parity budget. Never use metrics_device for
                    # reported/benchmark numbers; final eval must take the
                    # host path below.
                    results = self._device_metrics()
                    for metric_idx, r in enumerate(results):
                        self.metric_results[folder][int(frame_idx), metric_idx] += r
                else:
                    for metric_idx, opt_ in enumerate(self.opt["val"]["metrics"].values()):
                        result = calculate_metric(metric_data, opt_)
                        self.metric_results[folder][int(frame_idx), metric_idx] += result

        if with_metrics:
            if world_size > 1:
                # sum partial per-frame metric tensors across processes
                from jax.experimental import multihost_utils

                for folder in self.metric_results:
                    summed = multihost_utils.process_allgather(
                        self.metric_results[folder]
                    ).sum(axis=0)
                    self.metric_results[folder] = np.asarray(summed)
            self._log_validation_metric_values(current_iter, dataset_name, tb_logger)

    def _device_metrics(self):
        """PSNR/SSIM of the current output vs gt on device (NHWC [0,1])."""
        import jax.numpy as jnp

        from ..data.resize import resize_jax
        from ..metrics.psnr_ssim import calculate_psnr_jnp, calculate_ssim_jnp

        out = self.output
        gt = self.gt
        if out.shape != gt.shape:
            out = resize_jax(out, (gt.shape[-3], gt.shape[-2]), mode="torch")
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        gt = gt.astype(jnp.float32)
        results = []
        for name, m_opt in self.opt["val"]["metrics"].items():
            y = m_opt.get("test_y_channel", False)
            cb = m_opt.get("crop_border", 0)
            if "psnr" in m_opt["type"]:
                results.append(float(calculate_psnr_jnp(out, gt, cb, y)[0]))
            elif "ssim" in m_opt["type"]:
                results.append(float(calculate_ssim_jnp(out, gt, cb, y)[0]))
            else:
                raise ValueError(f"metrics_device does not support {m_opt['type']}")
        return results

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        self.dist_validation(dataloader, current_iter, tb_logger, save_img)

    def validation(self, dataloader, current_iter, tb_logger, save_img=False):
        self.dist_validation(dataloader, current_iter, tb_logger, save_img)

    def _log_validation_metric_values(self, current_iter, dataset_name, tb_logger):
        metric_results_avg = {
            folder: arr.mean(axis=0) for folder, arr in self.metric_results.items()
        }
        total_avg_results = {m: 0.0 for m in self.opt["val"]["metrics"].keys()}
        for folder, vec in metric_results_avg.items():
            for idx, metric in enumerate(total_avg_results.keys()):
                total_avg_results[metric] += float(vec[idx])
        for metric in total_avg_results.keys():
            total_avg_results[metric] /= len(metric_results_avg)
            self._update_best_metric_result(
                dataset_name, metric, total_avg_results[metric], current_iter
            )

        log_str = f"Validation {dataset_name}\n"
        for metric_idx, (metric, value) in enumerate(total_avg_results.items()):
            log_str += f"\t # {metric}: {value:.4f}"
            for folder, vec in metric_results_avg.items():
                log_str += f"\t # {folder}: {float(vec[metric_idx]):.4f}"
            if hasattr(self, "best_metric_results"):
                rec = self.best_metric_results[dataset_name][metric]
                log_str += f"\n\t    Best: {rec['val']:.4f} @ {rec['iter']} iter"
            log_str += "\n"
        get_root_logger().info(log_str)
        if tb_logger:
            for metric_idx, (metric, value) in enumerate(total_avg_results.items()):
                tb_logger.add_scalar(f"metrics/{metric}", value, current_iter)
                for folder, vec in metric_results_avg.items():
                    tb_logger.add_scalar(
                        f"metrics/{metric}/{folder}", float(vec[metric_idx]), current_iter
                    )
        self.last_metric_results = total_avg_results
