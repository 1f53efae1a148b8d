"""Optical-flow file IO (role of lbasicsr/utils/flow_util.py):
Middlebury .flo read/write and quantized PNG-pair storage."""

from __future__ import annotations

import os

import cv2
import numpy as np

_FLO_MAGIC = 202021.25


def flowread(flow_path: str, quantize: bool = False, concat_axis: int = 0, *args, **kwargs):
    """Read a .flo file (or a quantized dx/dy image pair) -> [H, W, 2]."""
    if quantize:
        assert concat_axis in [0, 1]
        cat_flow = cv2.imread(flow_path, cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f"{flow_path} is not a valid quantized flow file.")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs)

    with open(flow_path, "rb") as f:
        try:
            header = f.read(4).decode("utf-8")
        except Exception:
            raise IOError(f"Invalid flow file: {flow_path}")
        if header != "PIEH":
            raise IOError(f"Invalid flow file: {flow_path}, header does not contain PIEH")
        w = np.fromfile(f, np.int32, 1).squeeze()
        h = np.fromfile(f, np.int32, 1).squeeze()
        flow = np.fromfile(f, np.float32, int(w) * int(h) * 2).reshape((int(h), int(w), 2))
    return flow.astype(np.float32)


def flowwrite(flow: np.ndarray, filename: str, quantize: bool = False,
              concat_axis: int = 0, *args, **kwargs) -> None:
    """Write [H, W, 2] flow as .flo (or quantized uint8 image)."""
    if not quantize:
        with open(filename, "wb") as f:
            f.write("PIEH".encode("utf-8"))
            np.array([flow.shape[1], flow.shape[0]], dtype=np.int32).tofile(f)
            flow = flow.astype(np.float32)
            flow.tofile(f)
            f.flush()
    else:
        assert concat_axis in [0, 1]
        dx, dy = quantize_flow(flow, *args, **kwargs)
        dxdy = np.concatenate((dx, dy), axis=concat_axis)
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        cv2.imwrite(filename, dxdy)


def quantize_flow(flow: np.ndarray, max_val: float = 0.02, norm: bool = True):
    """Quantize flow to [0, 255] uint8 (optionally normalized by image size)."""
    h, w, _ = flow.shape
    dx = flow[..., 0]
    dy = flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    flow_comps = [quantize(d, -max_val, max_val, 255, np.uint8) for d in [dx, dy]]
    return tuple(flow_comps)


def dequantize_flow(dx: np.ndarray, dy: np.ndarray, max_val: float = 0.02,
                    denorm: bool = True) -> np.ndarray:
    assert dx.shape == dy.shape
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in [dx, dy])
    if denorm:
        dx *= dx.shape[1]
        dy *= dx.shape[0]
    return np.stack((dx, dy), axis=-1)


def quantize(arr, min_val, max_val, levels, dtype=np.int64):
    """Uniform quantization of [min_val, max_val] into ``levels`` bins."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than max_val ({max_val})")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(np.floor(levels * arr / (max_val - min_val)).astype(dtype), levels - 1)


def dequantize(arr, min_val, max_val, levels, dtype=np.float64):
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be smaller than max_val ({max_val})")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val
