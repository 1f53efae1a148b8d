"""Loader throughput vs worker count/mode (VERDICT r2 #8).

Synthetic Vimeo-like decode+crop+collate work at real sizes (7x 256x448
PNG decode + asBI downsample via the dataset path is approximated here by
cv2 imdecode + resize on random PNG bytes), measured for worker_mode
thread vs process at several worker counts. On a 1-core host the absolute
numbers are contention-bound; the thread-vs-process delta still shows the
Python/GIL share (the process path sidesteps it at an IPC-copy cost).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import cv2
import numpy as np

from savsr_tpu.data.loader import DataLoader, Dataset


class SynthClipDataset(Dataset):
    """Decode-heavy item: 7-frame PNG decode + crop + bicubic downsample."""

    def __init__(self, n=64, h=256, w=448):
        rng = np.random.default_rng(0)
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        self.png = buf.tobytes()
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        frames = []
        for t in range(7):
            img = cv2.imdecode(np.frombuffer(self.png, np.uint8), cv2.IMREAD_COLOR)
            img = img[: 240, : 240].astype(np.float32) / 255.0
            lq = cv2.resize(img, (60, 60), interpolation=cv2.INTER_CUBIC)
            frames.append(lq)
        return {"lq": np.stack(frames), "gt": img[:120, :120]}


def bench(mode, workers, batch=16, items=48):
    ds = SynthClipDataset(n=items)
    dl = DataLoader(ds, batch_size=batch, shuffle=False,
                    num_workers=workers, worker_mode=mode)
    # warm (forks the pool / spins threads)
    next(iter(dl))
    t0 = time.perf_counter()
    n = 0
    for b in dl:
        n += b["lq"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


if __name__ == "__main__":
    cores = os.cpu_count() or 1
    print(f"host cores: {cores}")
    for mode in ("thread", "process"):
        for w in (0, 1, 2, 4):
            if w > 0 and mode == "thread" and w > cores:
                pass  # loader clamps anyway; measure as requested
            r = bench(mode, w)
            print(f"{mode:8s} workers={w}: {r:7.1f} samples/s")
