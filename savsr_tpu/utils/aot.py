"""Ahead-of-time persistence for compiled serving executables.

The pure-XLA training step participates in JAX's persistent compilation
cache, but programs containing Mosaic (Pallas) custom-call kernels are not
written to it — every fresh serving process paid the full remote compile
(~9.5 min for the CHW-engine serving program through the TPU relay). This
module closes that gap at the executable level: the compiled program is
pickled via ``jax.experimental.serialize_executable`` (PJRT executable
serialization — the Mosaic kernel payloads are embedded in the executable
and survive the round trip) and reloaded by fresh processes in
milliseconds.

Cache key = sha256 of the lowered StableHLO text + device kind + JAX
version: any change to the model code, shapes, dtypes, engine flags, or
environment re-keys the entry automatically, so a stale executable can
never be served. Entries live under ``<repo>/.savsr_aot/`` (gitignored).

Counterpart of the reference's load-checkpoint-and-serve intent
(lbasicsr/test.py:11-47): a fresh process reaches its first frame in
seconds instead of paying a compile.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import time
from typing import Any, Callable, Optional

import jax

from .logger import get_root_logger

AOT_DIR_ENV = "SAVSR_AOT_DIR"
# size cap enforced by the cache writer (LRU by mtime): a 42-scale eval
# sweep writes ~77 MB/entry and a training step ~357 MB — without a cap the
# cache grows silently by GBs per code iteration. Override per-run via env.
AOT_MAX_GB_ENV = "SAVSR_AOT_MAX_GB"
AOT_MAX_GB_DEFAULT = 20.0


def default_aot_dir() -> str:
    return os.environ.get(
        AOT_DIR_ENV,
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".savsr_aot"),
    )


def _entry_key(lowered: jax.stages.Lowered) -> str:
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(getattr(dev, "device_kind", dev.platform).encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:20]


def compile_cached(
    fn: Callable,
    args: tuple,
    tag: str = "serving",
    aot_dir: Optional[str] = None,
    static_argnames: tuple = (),
    donate_argnames: tuple = (),
) -> tuple[Any, dict]:
    """jit-compile ``fn(*args)`` with executable-level disk persistence.

    Returns ``(compiled, info)`` where compiled is a ``jax.stages.Compiled``
    callable and info records what happened: ``{"source": "aot-cache" |
    "compiled", "key": ..., "lower_s": ..., "load_s" | "compile_s": ...,
    "path": ...}``. On any load failure (version skew, corrupt file) the
    entry is recompiled and overwritten — the cache can only ever be a
    speedup, never a correctness hazard.
    """
    from jax.experimental import serialize_executable as se

    logger = get_root_logger()
    aot_dir = aot_dir or default_aot_dir()

    t0 = time.perf_counter()
    lowered = jax.jit(
        fn, static_argnames=static_argnames, donate_argnames=donate_argnames
    ).lower(*args)
    lower_s = time.perf_counter() - t0
    key = _entry_key(lowered)
    path = os.path.join(aot_dir, f"{tag}_{key}.jaxexe")
    info = {"key": key, "path": path, "lower_s": round(lower_s, 2)}

    if os.path.isfile(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as f:
                payload, in_tree, out_tree, dev_ids = pickle.load(f)
            by_id = {d.id: d for d in jax.devices()}
            exec_devices = [by_id[i] for i in dev_ids]
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=exec_devices
            )
            info.update(source="aot-cache",
                        load_s=round(time.perf_counter() - t0, 2))
            _touch(path)  # LRU recency for the prune policy
            return compiled, info
        except Exception as e:  # stale/corrupt/incompatible: recompile
            logger.warning(f"AOT entry {path} failed to load ({e}); recompiling.")

    t0 = time.perf_counter()
    compiled = lowered.compile()
    info.update(source="compiled", compile_s=round(time.perf_counter() - t0, 2))
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        # the devices the executable was compiled for: a deserializing
        # process must load onto the same device set (NOT all devices —
        # on a multi-device pool the default would mismatch shard counts)
        dev_ids = [d.id for d in compiled._executable.xla_executable.local_devices()]
        os.makedirs(aot_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, dev_ids), f)
        os.replace(tmp, path)
        info["saved_bytes"] = os.path.getsize(path)
        _write_sidecar(path, tag=tag, key=key, args=args,
                       compile_s=info.get("compile_s"))
        prune_cache(aot_dir, max_gb=_max_gb(), keep={path})
    except Exception as e:  # non-serializable backend: still return compiled
        logger.warning(f"AOT serialize failed ({e}); executable not persisted.")
    return compiled, info


# ---------------------------------------------------------------------------
# cache management: sidecar metadata, listing, LRU pruning
# (the writer enforces SAVSR_AOT_MAX_GB after every save; `python -m
# savsr_tpu.aot list|prune` is the user surface)
# ---------------------------------------------------------------------------


def _touch(path: str) -> None:
    try:
        os.utime(path, None)
    except OSError:
        pass


def _max_gb() -> float:
    try:
        return float(os.environ.get(AOT_MAX_GB_ENV, AOT_MAX_GB_DEFAULT))
    except ValueError:
        return AOT_MAX_GB_DEFAULT


def _describe_args(args: tuple) -> list:
    """Compact shape/dtype summary of the array leaves of the example args
    (param pytrees are summarised as a leaf count, not enumerated)."""
    out = []
    for a in args:
        leaves = jax.tree_util.tree_leaves(a)
        arrays = [x for x in leaves if hasattr(x, "shape")]
        if len(arrays) == 1 and len(leaves) == 1:
            x = arrays[0]
            out.append(f"{getattr(x, 'dtype', '?')}{list(x.shape)}")
        else:
            out.append(f"pytree({len(arrays)} arrays)")
    return out


def _write_sidecar(path: str, tag: str, key: str, args: tuple,
                   compile_s=None) -> None:
    try:
        meta = {
            "tag": tag,
            "key": key,
            "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "jax_version": jax.__version__,
            "device_kind": getattr(jax.devices()[0], "device_kind",
                                   jax.devices()[0].platform),
            "bytes": os.path.getsize(path),
            "args": _describe_args(args),
        }
        if compile_s is not None:
            meta["compile_s"] = compile_s
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=1)
    except Exception:
        pass  # metadata is best-effort; never fail the save


def list_entries(aot_dir: Optional[str] = None) -> list:
    """All cache entries, newest-used first: [{path, bytes, mtime, meta}]."""
    aot_dir = aot_dir or default_aot_dir()
    entries = []
    if not os.path.isdir(aot_dir):
        return entries
    for name in os.listdir(aot_dir):
        if not name.endswith(".jaxexe"):
            continue
        path = os.path.join(aot_dir, name)
        try:
            st = os.stat(path)
        except OSError:
            continue
        meta = {}
        if os.path.isfile(path + ".json"):
            try:
                with open(path + ".json") as f:
                    meta = json.load(f)
            except Exception:
                meta = {}
        entries.append({"path": path, "bytes": st.st_size,
                        "mtime": st.st_mtime, "meta": meta})
    entries.sort(key=lambda e: e["mtime"], reverse=True)
    return entries


def prune_cache(aot_dir: Optional[str] = None, max_gb: Optional[float] = None,
                keep: Optional[set] = None) -> list:
    """Delete least-recently-used entries until the cache fits ``max_gb``.
    Paths in ``keep`` are never deleted. Returns the deleted paths."""
    aot_dir = aot_dir or default_aot_dir()
    max_bytes = (max_gb if max_gb is not None else _max_gb()) * 1e9
    keep = keep or set()
    entries = list_entries(aot_dir)
    total = sum(e["bytes"] for e in entries)
    deleted = []
    for e in reversed(entries):  # oldest first
        if total <= max_bytes:
            break
        if e["path"] in keep:
            continue
        try:
            os.remove(e["path"])
            if os.path.isfile(e["path"] + ".json"):
                os.remove(e["path"] + ".json")
        except OSError:
            continue
        total -= e["bytes"]
        deleted.append(e["path"])
    if deleted:
        get_root_logger().info(
            f"AOT cache pruned {len(deleted)} entries (now {total / 1e9:.2f} GB)")
    return deleted
