"""Training entry point: ``python -m savsr_tpu.train -opt <cfg.yml>``.

Behavioural mirror of lbasicsr/train.py:94-255 (epoch/iter loop, auto
resume, periodic log/save/val, prefetching), on a JAX device mesh instead
of DDP processes.
"""

from __future__ import annotations

import datetime
import logging
import math
import os
import pickle
import time
from os import path as osp

from .data import build_dataloader, build_dataset, EnlargedSampler
from .data.loader import CPUPrefetcher, DevicePrefetcher
from .models import build_model
from .utils import (
    AvgTimer,
    MessageLogger,
    check_resume,
    dict2str,
    get_env_info,
    get_root_logger,
    get_time_str,
    init_tb_logger,
    init_wandb_logger,
    make_exp_dirs,
    mkdir_and_rename,
    parse_options,
)
from .utils.options import copy_opt_file


def init_tb_loggers(opt):
    # wandb rides the tensorboard stream (reference train.py:36-40): init it
    # before the SummaryWriter so sync_tensorboard catches the event files
    if (
        opt["logger"].get("wandb") is not None
        and opt["logger"]["wandb"].get("project") is not None
        and "debug" not in opt["name"]
    ):
        assert opt["logger"].get("use_tb_logger") is True, (
            "should turn on tensorboard when using wandb"
        )
        init_wandb_logger(opt)
    tb_logger = None
    if (
        opt["logger"].get("use_tb_logger")
        and "debug" not in opt["name"]
        and opt["rank"] == 0
    ):
        tb_logger = init_tb_logger(
            log_dir=osp.join(opt["root_path"], "tb_logger", opt["name"])
        )
    return tb_logger


def create_train_val_dataloader(opt, logger):
    train_loader, train_sampler, val_loaders = None, None, []
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            dataset_enlarge_ratio = dataset_opt.get("dataset_enlarge_ratio", 1)
            train_set = build_dataset(dataset_opt)
            train_sampler = EnlargedSampler(
                len(train_set), opt["world_size"], opt["rank"], dataset_enlarge_ratio
            )
            train_loader = build_dataloader(
                train_set, dataset_opt, num_gpu=opt["num_gpu"], dist=opt["dist"],
                sampler=train_sampler, seed=opt["manual_seed"],
            )

            num_iter_per_epoch = math.ceil(
                len(train_set)
                * dataset_enlarge_ratio
                / (dataset_opt["batch_size_per_gpu"] * opt["world_size"])
            )
            total_iters = int(opt["train"]["total_iter"])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info(
                "Training statistics:"
                f"\n\tNumber of train images: {len(train_set)}"
                f"\n\tDataset enlarge ratio: {dataset_enlarge_ratio}"
                f"\n\tBatch size per device group: {dataset_opt['batch_size_per_gpu']}"
                f"\n\tWorld size (process count): {opt['world_size']}"
                f"\n\tRequire iter number per epoch: {num_iter_per_epoch}"
                f"\n\tTotal epochs: {total_epochs}; iters: {total_iters}."
            )
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dataset_opt)
            val_loaders.append(
                build_dataloader(
                    val_set, dataset_opt, num_gpu=opt["num_gpu"], dist=opt["dist"]
                )
            )
        else:
            raise ValueError(f"Dataset phase {phase} is not recognized.")
    return train_loader, train_sampler, val_loaders, total_epochs, total_iters


def load_resume_state(opt):
    resume_state_path = None
    if opt["auto_resume"]:
        state_path = opt["path"].get("training_states") or osp.join(
            "experiments", opt["name"], "training_states"
        )
        if osp.isdir(state_path):
            states = [
                v for v in os.listdir(state_path) if v.endswith(".state")
            ]
            if states:
                max_state = max(float(v.split(".state")[0]) for v in states)
                resume_state_path = osp.join(state_path, f"{max_state:.0f}.state")
                opt["path"]["resume_state"] = resume_state_path
    else:
        if opt["path"].get("resume_state"):
            resume_state_path = opt["path"]["resume_state"]

    if resume_state_path is None:
        return None
    with open(resume_state_path, "rb") as f:
        resume_state = pickle.load(f)
    check_resume(opt, resume_state["iter"])
    return resume_state


def train_pipeline(root_path):
    opt, args = parse_options(root_path, is_train=True)
    opt["root_path"] = root_path

    resume_state = load_resume_state(opt)
    if resume_state is None:
        make_exp_dirs(opt)
        if (
            opt["logger"].get("use_tb_logger")
            and "debug" not in opt["name"]
            and opt["rank"] == 0
        ):
            mkdir_and_rename(osp.join(opt["root_path"], "tb_logger", opt["name"]))
    copy_opt_file(args.opt, opt["path"]["experiments_root"])

    log_file = osp.join(opt["path"]["log"], f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = init_tb_loggers(opt)

    result = create_train_val_dataloader(opt, logger)
    train_loader, train_sampler, val_loaders, total_epochs, total_iters = result

    model = build_model(opt)
    if resume_state:
        model.resume_training(resume_state)
        logger.info(
            f"Resuming training from epoch: {resume_state['epoch']}, "
            f"iter: {resume_state['iter']}."
        )
        start_epoch = resume_state["epoch"]
        current_iter = resume_state["iter"]
    else:
        start_epoch = 0
        current_iter = 0

    msg_logger = MessageLogger(opt, current_iter, tb_logger)

    # prefetcher selection (reference train.py:148-158): 'device' (alias
    # 'cuda') keeps the next batch uploaded + sharded while the current step
    # runs; default/'cpu' reads ahead on host threads only
    prefetch_mode = opt["datasets"]["train"].get("prefetch_mode")
    if prefetch_mode in ("device", "cuda"):
        prefetcher = DevicePrefetcher(train_loader, model.prepare_batch)
        logger.info(f"Use DevicePrefetcher (prefetch_mode={prefetch_mode}).")
    elif prefetch_mode is None or prefetch_mode == "cpu":
        prefetcher = CPUPrefetcher(train_loader)
    else:
        raise ValueError(
            f"Wrong prefetch_mode {prefetch_mode}. Supported ones are: None, 'cpu', 'device'."
        )

    logger.info(f"Start training from epoch: {start_epoch}, iter: {current_iter}")
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    start_time = time.time()
    epoch = start_epoch

    for epoch in range(start_epoch, total_epochs + 1):
        train_loader.set_epoch(epoch)
        prefetcher.reset()
        train_data = prefetcher.next()

        while train_data is not None:
            data_timer.record()
            current_iter += 1
            if current_iter > total_iters:
                break
            model.update_learning_rate(
                current_iter, warmup_iter=opt["train"].get("warmup_iter", -1)
            )
            model.feed_data(train_data)
            model.optimize_parameters(current_iter)
            iter_timer.record()
            if current_iter == 1:
                msg_logger.reset_start_time()

            if current_iter % opt["logger"]["print_freq"] == 0:
                log_vars = {"epoch": epoch, "iter": current_iter}
                log_vars.update({"lrs": model.get_current_learning_rate(current_iter)})
                log_vars.update(
                    {"time": iter_timer.get_avg_time(), "data_time": data_timer.get_avg_time()}
                )
                log_vars.update(model.log_dict)
                msg_logger(log_vars)

            if current_iter % opt["logger"]["save_checkpoint_freq"] == 0:
                logger.info("Saving models and training states.")
                model.save(epoch, current_iter)

            if opt.get("val") is not None and (
                current_iter % opt["val"]["val_freq"] == 0
            ):
                for val_loader in val_loaders:
                    model.validation(
                        val_loader, current_iter, tb_logger, opt["val"]["save_img"]
                    )

            data_timer.start()
            iter_timer.start()
            train_data = prefetcher.next()
        if current_iter > total_iters:
            break

    consumed = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    logger.info(f"End of training. Time consumed: {consumed}")
    logger.info("Save the latest model.")
    model.save(epoch=-1, current_iter=-1)
    if opt.get("val") is not None:
        for val_loader in val_loaders:
            model.validation(val_loader, current_iter, tb_logger, opt["val"]["save_img"])


if __name__ == "__main__":
    root_path = os.getcwd()
    train_pipeline(root_path)
