"""Data subsystem: registered datasets + loader builders.

Mirrors lbasicsr/data/__init__.py: datasets are registered plugins resolved
by name from YAML; ``build_dataloader`` wires phase-appropriate batching,
the process-strided sampler, and a dataset-provided ``as_collate_fn`` hook
(the arbitrary-scale batch degradation lives there).
"""

from __future__ import annotations

from copy import deepcopy

from ..utils.dist_util import get_dist_info
from ..utils.logger import get_root_logger
from ..utils.registry import DATASET_REGISTRY
from .loader import DataLoader, DevicePrefetcher, EnlargedSampler, SequentialSampler

# import dataset modules so their @register decorators run
from . import reds_dataset  # noqa: F401
from . import video_test_dataset  # noqa: F401
from . import vimeo90k_dataset  # noqa: F401

__all__ = [
    "build_dataset",
    "build_dataloader",
    "DataLoader",
    "DevicePrefetcher",
    "EnlargedSampler",
    "SequentialSampler",
]


def build_dataset(dataset_opt: dict):
    dataset_opt = deepcopy(dataset_opt)
    dataset = DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)
    get_root_logger().info(
        f"Dataset [{dataset.__class__.__name__}] - {dataset_opt.get('name')} is built."
    )
    return dataset


def build_dataloader(dataset, dataset_opt: dict, num_gpu: int = 1, dist: bool = False,
                     sampler=None, seed=None):
    """Phase-aware loader construction (reference data/__init__.py:26-103)."""
    phase = dataset_opt["phase"]
    rank, _ = get_dist_info()
    collate_fn = getattr(dataset, "as_collate_fn", None)

    if phase == "train":
        batch_size = dataset_opt["batch_size_per_gpu"]
        num_workers = dataset_opt.get("num_worker_per_gpu", 0)
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=sampler is None,
            sampler=sampler,
            drop_last=True,
            collate_fn=collate_fn,
            num_workers=num_workers,
            seed=seed,
            worker_mode=dataset_opt.get("worker_mode", "thread"),
        )
    elif phase in ("val", "test"):
        batch_size = dataset_opt.get("batch_size_per_gpu", 1)
        return DataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=False,
            collate_fn=collate_fn,
            num_workers=dataset_opt.get("num_worker_per_gpu", 0),
            worker_mode=dataset_opt.get("worker_mode", "thread"),
        )
    raise ValueError(f"Wrong dataset phase: {phase}.")
