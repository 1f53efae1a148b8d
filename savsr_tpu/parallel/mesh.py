"""Device-mesh utilities: the TPU-native replacement for the reference's
DDP/NCCL layer (SURVEY.md §2.7).

SAVSR's parity requirement is data parallelism: a 1-D ``data`` mesh spanning
all chips (ICI within a slice, DCN across slices — JAX orders global devices
so a 1-D mesh keeps ICI-contiguous blocks together). Parameters are
replicated; batches are sharded on axis 0; XLA inserts the gradient
all-reduce from the shardings. No NCCL, no process groups, no DDP wrapper.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_data_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over (the first ``num_devices``) global devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard every array leaf along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_or_replicate_batch(tree: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Shard leaves whose batch axis divides the mesh; replicate the rest
    (lets bs=1 eval run on a multi-chip mesh without resharding errors).

    Multi-process: each host passes its LOCAL batch (batch_size_per_gpu rows
    from its process-strided sampler shard); the leaves are assembled into a
    GLOBAL array of local*num_processes rows via
    ``jax.make_array_from_process_local_data`` so the effective global batch
    matches train.py's ``batch_size_per_gpu * world_size`` accounting."""
    n = mesh.shape[axis_name]
    batch_sh = NamedSharding(mesh, P(axis_name))
    repl_sh = NamedSharding(mesh, P())
    multiprocess = jax.process_count() > 1

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1:
            if multiprocess:
                # local rows must divide the host's addressable slice of the mesh
                local_dev = len(batch_sh.addressable_devices)
                if local_dev and x.shape[0] % local_dev == 0:
                    return jax.make_array_from_process_local_data(batch_sh, np.asarray(x))
            elif x.shape[0] % n == 0:
                return jax.device_put(x, batch_sh)
        return jax.device_put(x, repl_sh)

    return jax.tree_util.tree_map(put, tree)
