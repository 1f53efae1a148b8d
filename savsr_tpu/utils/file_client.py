"""Pluggable file-IO backends (disk / lmdb / memory).

Same role as lbasicsr/utils/file_client.py: datasets fetch bytes by key
through a FileClient so the storage backend is a config choice. The lmdb
backend is gated on the ``lmdb`` package being importable.
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
