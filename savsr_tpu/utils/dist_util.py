"""Multi-host / multi-device process utilities on top of ``jax.distributed``.

TPU-native replacement for the reference's torch.distributed/NCCL layer
(lbasicsr/utils/dist_util.py): instead of one process per GPU with NCCL
process groups, JAX runs one process per host, each owning all local TPU
chips, and XLA inserts ICI/DCN collectives from sharding annotations.

``rank``/``world_size`` here are therefore *process* (host) indices, used
only for host-side concerns: logging gates, checkpoint writes, and
host-strided data sharding. Device-level parallelism lives in
``savsr_tpu.parallel``.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax


_INITIALIZED = False


def init_dist(launcher: str = "jax", **kwargs) -> None:
    """Initialize cross-host coordination.

    Launchers:
      - ``jax``: ``jax.distributed.initialize()`` with auto-discovery (TPU
        pods) or from ``coordinator_address``/``num_processes``/``process_id``
        kwargs or the standard JAX env vars.
      - ``slurm``: derive process info from SLURM env vars (replaces the
        reference's scontrol-based discovery, dist_util.py:38-67).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if launcher == "slurm":
        proc_id = int(os.environ["SLURM_PROCID"])
        ntasks = int(os.environ["SLURM_NTASKS"])
        addr = kwargs.pop("coordinator_address", None)
        if addr is None:
            node_list = os.environ["SLURM_NODELIST"]
            head = node_list.split(",")[0].replace("[", "").split("-")[0]
            port = kwargs.pop("port", 29500)
            addr = f"{head}:{port}"
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=ntasks, process_id=proc_id
        )
    else:
        jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def get_dist_info() -> Tuple[int, int]:
    """Return (process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def master_only(func):
    """Run ``func`` only on process 0 (mirrors dist_util.py:84-92)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_master():
            return func(*args, **kwargs)
        return None

    return wrapper
