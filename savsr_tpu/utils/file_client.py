"""Pluggable file-IO backends (disk / lmdb / memcached / memory).

Same role as lbasicsr/utils/file_client.py: datasets fetch bytes by key
through a FileClient so the storage backend is a config choice. The lmdb
and memcached backends are gated on their client packages being importable
(the reference behaves identically, file_client.py:26-39).
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod
from typing import Dict, Optional


class BaseStorageBackend(metaclass=ABCMeta):
    @abstractmethod
    def get(self, filepath: str) -> bytes: ...


class DiskBackend(BaseStorageBackend):
    def get(self, filepath: str) -> bytes:
        with open(str(filepath), "rb") as f:
            return f.read()


class MemoryBackend(BaseStorageBackend):
    """In-memory key->bytes store; used by tests and synthetic datasets."""

    def __init__(self, store: Optional[Dict[str, bytes]] = None):
        self.store = store if store is not None else {}

    def get(self, filepath: str) -> bytes:
        return self.store[str(filepath)]


class MemcachedBackend(BaseStorageBackend):
    """Memcached backend (reference file_client.py:26-39).

    Args:
        server_list_cfg: config file for the memcached server list.
        client_cfg: config file for the memcached client.
        sys_path: optional path prepended to sys.path to find ``mc``.
    """

    def __init__(self, server_list_cfg: str, client_cfg: str,
                 sys_path: Optional[str] = None):
        if sys_path is not None:
            import sys

            sys.path.append(sys_path)
        try:
            import mc
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError(
                "Please install memcached to enable MemcachedBackend."
            ) from e
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self._client = mc.MemcachedClient.GetInstance(server_list_cfg, client_cfg)
        self._mc_buffer = mc.pyvector()

    def get(self, filepath: str) -> bytes:
        import mc

        self._client.Get(str(filepath), self._mc_buffer)
        return mc.ConvertBuffer(self._mc_buffer)


class LmdbBackend(BaseStorageBackend):
    """LMDB backend with one environment per named client.

    Args:
        db_paths: path(s) of lmdb databases.
        client_keys: matching name(s); ``get`` takes the name to choose a db.
    """

    def __init__(self, db_paths, client_keys="default", readonly=True, lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover - environment dependent
            raise ImportError("lmdb is required for the lmdb IO backend") from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (list, tuple)):
            self.db_paths = [str(v) for v in db_paths]
        else:
            self.db_paths = [str(db_paths)]
        assert len(client_keys) == len(self.db_paths)
        self._client = {
            client: lmdb.open(path, readonly=readonly, lock=lock, readahead=readahead, **kwargs)
            for client, path in zip(client_keys, self.db_paths)
        }

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            value_buf = txn.get(str(filepath).encode("ascii"))
        return value_buf


class FileClient:
    """Facade dispatching to a configured backend."""

    _backends = {
        "disk": DiskBackend,
        "lmdb": LmdbBackend,
        "memcached": MemcachedBackend,
        "memory": MemoryBackend,
    }

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} not supported. Available: {list(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
