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


def get_mesh_from_opt(opt: Optional[dict]) -> Mesh:
    """Mesh from the run config. ``opt['mesh']`` is an ordered
    {axis_name: size} dict (e.g. ``{data: 4, spatial: 2}``); a size of -1
    fills with the remaining devices. Default (no ``mesh`` key): the 1-D
    data mesh over all devices — the reference's DDP analogue."""
    spec = (opt or {}).get("mesh")
    if not spec:
        return get_data_mesh()
    names = list(spec.keys())
    sizes = [int(spec[n]) for n in names]
    n_dev = len(jax.devices())
    if -1 in sizes:
        fixed = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = max(1, n_dev // fixed)
    total = int(np.prod(sizes))
    if total > n_dev:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {n_dev}")
    devs = np.asarray(jax.devices()[:total]).reshape(sizes)
    return Mesh(devs, tuple(names))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf fully replicated on the mesh.

    Multi-process: assemble the global array from per-local-device copies
    instead of a multi-process device_put — the latter runs a best-effort
    cross-process value-equality collective that is flaky under load, and
    every caller here passes deterministically identical values (same seed,
    same checkpoint) on all processes."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        local_devs = list(sharding.addressable_devices)

        def put(x):
            if isinstance(x, jax.Array) and x.sharding == sharding:
                return x
            arr = np.asarray(x)
            shards = [jax.device_put(arr, d) for d in local_devs]
            return jax.make_array_from_single_device_arrays(
                arr.shape, sharding, shards
            )

        return jax.tree_util.tree_map(put, tree)
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
    n_sp = mesh.shape.get("spatial", 1)
    repl_sh = NamedSharding(mesh, P())
    multiprocess = jax.process_count() > 1

    # in multi-process runs each host passes its LOCAL batch rows, so the
    # batch axis must divide the host's addressable slice of the mesh
    n_batch = (len(NamedSharding(mesh, P(axis_name)).addressable_devices)
               if multiprocess else n)

    def pspec(x):
        """Batch axis over 'data'; on a 2-D data x spatial mesh also shard
        the frame HEIGHT (axis ndim-3 of [B,(T,)H,W,C] leaves) over
        'spatial' — XLA inserts the conv halo exchanges (exactness pinned
        by tests/test_spatial_sharding.py)."""
        axes = [None] * x.ndim
        if n_batch and x.shape[0] % n_batch == 0:
            axes[0] = axis_name
        if n_sp > 1 and x.ndim >= 4 and x.shape[x.ndim - 3] % n_sp == 0:
            axes[x.ndim - 3] = "spatial"
        if not any(axes):
            return None
        return P(*axes)

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1:
            spec = pspec(x)
            if spec is not None and (not multiprocess or spec[0] == axis_name):
                sh = NamedSharding(mesh, spec)
                if multiprocess:
                    return jax.make_array_from_process_local_data(sh, np.asarray(x))
                return jax.device_put(x, sh)
        if multiprocess:
            # per-local-device replication (see replicate(): multi-process
            # device_put's equality collective is flaky, and a non-shardable
            # leaf may legitimately differ across hosts)
            return replicate(x, mesh)
        return jax.device_put(x, repl_sh)

    return jax.tree_util.tree_map(put, tree)
