"""Evaluation entry point: ``python -m savsr_tpu.test -opt <cfg.yml>``.

Behavioural mirror of lbasicsr/test.py: build one loader per ``test_*``
dataset block, resolve the per-dataset scale (downsampling_scale >
val_scale > opt.scale), and run model.validation on each.
"""

from __future__ import annotations

import logging
import os
from os import path as osp

from .data import build_dataloader, build_dataset
from .models import build_model
from .utils import (
    dict2str,
    get_env_info,
    get_root_logger,
    get_time_str,
    make_exp_dirs,
    parse_options,
)


def _plan_sweep_buckets(opt, test_loaders, logger):
    """Pre-scan every test dataset's (LR shape, scale) set and compute the
    bucket plan (archs/bucketed.plan_buckets). LR sizes derive from the GT
    frame headers via the as_mod_crop arithmetic — no full decode needed."""
    from math import floor

    import cv2

    from .archs.bucketed import plan_buckets
    from .archs.savsr_arch import normalize_scale
    from .data.transforms import cal_step

    def lr_dim(v: int, s: float) -> int:
        return int(floor(v / cal_step(s) / s) * cal_step(s))

    items = []
    for loader in test_loaders:
        ds = loader.dataset
        ds_opt = ds.opt
        scale = (ds_opt.get("downsampling_scale") or ds_opt.get("val_scale")
                 or opt.get("scale"))
        if scale is None or not hasattr(ds, "imgs_gt"):
            continue
        scale = normalize_scale(scale)
        for folder, entry in ds.imgs_gt.items():
            if hasattr(entry, "shape"):  # cache_data: [T, H, W, C] array
                n, h, w = entry.shape[0], entry.shape[1], entry.shape[2]
            else:  # path list: read one header
                img = cv2.imread(str(entry[0]), cv2.IMREAD_UNCHANGED)
                if img is None:
                    continue
                n, h, w = len(entry), img.shape[0], img.shape[1]
            items.append((lr_dim(h, scale[0]), lr_dim(w, scale[1]), scale, n))
    if not items:
        return {}
    val = opt["val"]
    plan = plan_buckets(
        items,
        max_buckets=int(val.get("bucket_max", 3)),
        compile_cost=float(val.get("bucket_compile_cost", 60.0)),
        mult=tuple(val.get("bucket_mult", (16, 64))),
    )
    buckets = sorted(set(plan.values()))
    logger.info(
        f"Auto-bucketed {len(items)} (shape, scale) blocks into "
        f"{len(buckets)} buckets: {buckets}"
    )
    return plan


def test_pipeline(root_path):
    opt, _ = parse_options(root_path, is_train=False)
    opt["root_path"] = root_path

    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"], f"test_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    test_loaders = []
    for _, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loader = build_dataloader(
            test_set, dataset_opt, num_gpu=opt["num_gpu"], dist=opt["dist"]
        )
        logger.info(f"Number of test images in {dataset_opt['name']}: {len(test_set)}")
        test_loaders.append(test_loader)

    model = build_model(opt)

    if (opt.get("val") or {}).get("bucket_eval") and opt["val"].get("bucket_auto"):
        # auto-group the sweep's (shape, scale) set into a few buckets
        # minimizing padded-canvas compute + compiles (VERDICT r2 #5)
        plan = _plan_sweep_buckets(opt, test_loaders, logger)
        if plan:
            model.bucket_plan = plan

    results = {}
    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt["name"]
        logger.info(f"Testing {test_set_name}...")
        # per-dataset arbitrary-scale resolution (reference test.py:40-45)
        ds_opt = test_loader.dataset.opt
        if ds_opt.get("downsampling_scale") is not None:
            opt["scale"] = ds_opt["downsampling_scale"]
            model.opt["scale"] = ds_opt["downsampling_scale"]
        elif ds_opt.get("val_scale") is not None:
            opt["scale"] = ds_opt["val_scale"]
            model.opt["scale"] = ds_opt["val_scale"]
        model.validation(
            test_loader, current_iter=opt["name"], tb_logger=None,
            save_img=opt["val"]["save_img"],
        )
        if hasattr(model, "last_metric_results"):
            results[test_set_name] = dict(model.last_metric_results)
    return results


if __name__ == "__main__":
    test_pipeline(os.getcwd())
