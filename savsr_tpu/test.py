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
