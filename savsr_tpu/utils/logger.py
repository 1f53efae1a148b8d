"""Logging: process-0 gated root logger, training message logger, timers.

Mirrors the observability surface of lbasicsr/utils/logger.py: a root logger
that only emits on process 0, a MessageLogger that formats
epoch/iter/lr/ETA/losses and mirrors scalars to TensorBoard, and windowed
iteration timers.
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Optional

from .dist_util import is_master, master_only

_initialized_loggers = set()


def get_root_logger(
    logger_name: str = "savsr_tpu",
    log_level: int = logging.INFO,
    log_file: Optional[str] = None,
) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        return logger
    fmt = "%(asctime)s %(levelname)s: %(message)s"
    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(logging.Formatter(fmt))
    logger.addHandler(stream_handler)
    logger.propagate = False
    if not is_master():
        logger.setLevel("ERROR")
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            file_handler = logging.FileHandler(log_file, "w")
            file_handler.setFormatter(logging.Formatter(fmt))
            logger.addHandler(file_handler)
    _initialized_loggers.add(logger_name)
    return logger


class AvgTimer:
    """Windowed average timer for iter/data time (logger.py:10-42)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.current_time = 0.0
        self.total_time = 0.0
        self.count = 0
        self.avg_time = 0.0
        self.start()

    def start(self) -> None:
        self.start_time = self.tic = time.time()

    def record(self) -> None:
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self) -> float:
        return self.current_time

    def get_avg_time(self) -> float:
        return self.avg_time


class MessageLogger:
    """Format and emit periodic training log lines + TensorBoard scalars."""

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        self.interval = opt["logger"]["print_freq"]
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.use_tb_logger = opt["logger"].get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self) -> None:
        self.start_time = time.time()

    @master_only
    def __call__(self, log_vars: dict) -> None:
        epoch = log_vars.pop("epoch")
        current_iter = log_vars.pop("iter")
        lrs = log_vars.pop("lrs")

        message = (
            f"[{self.exp_name[:31]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:("
        )
        for v in lrs:
            message += f"{v:.3e},"
        message += ")] "

        if "time" in log_vars.keys():
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time")
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / (current_iter - self.start_iter + 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[eta: {eta_str}, "
            message += f"time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None:
                tag = k if k.startswith("l_") else f"other/{k}"
                if k.startswith("m_"):
                    tag = f"metrics/{k[2:]}"
                self.tb_logger.add_scalar(tag, v, current_iter)
        self.logger.info(message)


@master_only
def init_wandb_logger(opt: dict):
    """Sync the tensorboard stream to Weights & Biases (reference
    logger.py:125-143): resumable via ``logger.wandb.resume_id``. wandb is an
    optional dependency — absence degrades to a warning."""
    try:
        import wandb
    except ImportError:
        get_root_logger().warning(
            "wandb requested (logger.wandb.project set) but not installed; "
            "skipping wandb sync."
        )
        return None

    logger = get_root_logger()
    project = opt["logger"]["wandb"]["project"]
    resume_id = opt["logger"]["wandb"].get("resume_id")
    if resume_id:
        wandb_id, resume = resume_id, "allow"
        logger.warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id, resume = wandb.util.generate_id(), "never"
    wandb.init(
        id=wandb_id, resume=resume, name=opt["name"], config=opt,
        project=project, sync_tensorboard=True,
    )
    logger.info(f"Use wandb logger with id={wandb_id}; project={project}.")
    return wandb_id


@master_only
def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        get_root_logger().warning(
            "tensorboard unavailable; scalar logging falls back to text logs."
        )
        return None
    return SummaryWriter(log_dir=log_dir)


def get_env_info() -> str:
    import jax

    import savsr_tpu

    msg = (
        f"\nVersion Information: "
        f"\n\tsavsr_tpu: {savsr_tpu.__version__}"
        f"\n\tJAX: {jax.__version__}"
        f"\n\tBackend: {jax.default_backend()}"
        f"\n\tDevices: {[str(d) for d in jax.devices()]}"
        f"\n\tProcess: {jax.process_index()}/{jax.process_count()}"
    )
    return msg
