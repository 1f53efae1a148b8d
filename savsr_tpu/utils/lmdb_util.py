"""LMDB dataset authoring (reference: lbasicsr/utils/lmdb_util.py).

Gated on the ``lmdb`` package; used by scripts/data_preparation/create_lmdb.py.
"""

from __future__ import annotations

import sys
from multiprocessing import Pool
from os import path as osp

import cv2


def make_lmdb_from_imgs(
    data_path: str,
    lmdb_path: str,
    img_path_list,
    keys,
    batch: int = 5000,
    compress_level: int = 1,
    multiprocessing_read: bool = False,
    n_thread: int = 40,
    map_size=None,
) -> None:
    """Build an lmdb of cv2-encoded PNGs + a meta_info.txt manifest.

    Contents: key -> png bytes; meta lines '<key>.png (h,w,c) <compress_level>'.
    """
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover
        raise ImportError("lmdb is required for make_lmdb_from_imgs") from e

    assert len(img_path_list) == len(keys), (
        f"img_path_list and keys should have the same length, "
        f"but got {len(img_path_list)} and {len(keys)}"
    )
    print(f"Create lmdb for {data_path}, save to {lmdb_path}...")
    if not lmdb_path.endswith(".lmdb"):
        raise ValueError("lmdb_path must end with '.lmdb'.")
    if osp.exists(lmdb_path):
        print(f"Folder {lmdb_path} already exists. Exit.")
        sys.exit(1)

    def _read_img_worker(path, key, compress_level):
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img.ndim == 2:
            h, w = img.shape
            c = 1
        else:
            h, w, c = img.shape
        _, img_byte = cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        return key, img_byte, (h, w, c)

    dataset = {}
    shapes = {}
    if multiprocessing_read:
        pool = Pool(n_thread)
        results = [
            pool.apply_async(_read_img_worker, (osp.join(data_path, p), k, compress_level))
            for p, k in zip(img_path_list, keys)
        ]
        pool.close()
        pool.join()
        for r in results:
            key, img_byte, shape = r.get()
            dataset[key] = img_byte
            shapes[key] = shape
        print(f"Finish reading {len(img_path_list)} images.")

    if map_size is None:
        img = cv2.imread(osp.join(data_path, img_path_list[0]), cv2.IMREAD_UNCHANGED)
        _, img_byte = cv2.imencode(".png", img, [cv2.IMWRITE_PNG_COMPRESSION, compress_level])
        map_size = img_byte.nbytes * len(img_path_list) * 10

    env = lmdb.open(lmdb_path, map_size=map_size)
    txn = env.begin(write=True)
    txt_file = open(osp.join(lmdb_path, "meta_info.txt"), "w")
    for idx, (path, key) in enumerate(zip(img_path_list, keys)):
        if idx % batch == 0 and idx > 0:
            txn.commit()
            txn = env.begin(write=True)
        key_byte = key.encode("ascii")
        if multiprocessing_read:
            img_byte = dataset[key]
            h, w, c = shapes[key]
        else:
            _, img_byte, (h, w, c) = _read_img_worker(
                osp.join(data_path, path), key, compress_level
            )
        txn.put(key_byte, img_byte)
        txt_file.write(f"{key}.png ({h},{w},{c}) {compress_level}\n")
    txn.commit()
    env.close()
    txt_file.close()
    print("Finish writing lmdb.")


class LmdbMaker:
    """Incremental lmdb writer (reference lmdb_util.py:159)."""

    def __init__(self, lmdb_path, map_size=1024**4, batch=5000, compress_level=1):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError("lmdb is required for LmdbMaker") from e
        if not lmdb_path.endswith(".lmdb"):
            raise ValueError("lmdb_path must end with '.lmdb'.")
        if osp.exists(lmdb_path):
            print(f"Folder {lmdb_path} already exists. Exit.")
            sys.exit(1)
        self.lmdb_path = lmdb_path
        self.batch = batch
        self.compress_level = compress_level
        self.env = lmdb.open(lmdb_path, map_size=map_size)
        self.txn = self.env.begin(write=True)
        self.txt_file = open(osp.join(lmdb_path, "meta_info.txt"), "w")
        self.counter = 0

    def put(self, img_byte, key, img_shape):
        self.counter += 1
        key_byte = key.encode("ascii")
        self.txn.put(key_byte, img_byte)
        h, w, c = img_shape
        self.txt_file.write(f"{key}.png ({h},{w},{c}) {self.compress_level}\n")
        if self.counter % self.batch == 0:
            self.txn.commit()
            self.txn = self.env.begin(write=True)

    def close(self):
        self.txn.commit()
        self.env.close()
        self.txt_file.close()
