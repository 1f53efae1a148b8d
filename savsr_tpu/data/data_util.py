"""Dataset-side utilities: frame-window indexing, on-the-fly degradation,
image-sequence reading, LMDB/meta path helpers.

Covers the roles of lbasicsr/data/data_util.py. All image arrays are
channel-last numpy; video stacks are [T, H, W, C].
"""

from __future__ import annotations

import os
from os import path as osp
from typing import List, Tuple, Union

import numpy as np

from ..utils.img_util import imread
from ..utils.misc import scandir
from .resize import resize_np
from .transforms import as_mod_crop

Scale = Union[Tuple[float, float], float]


def generate_frame_indices(
    crt_idx: int, max_frame_num: int, num_frames: int, padding: str = "reflection"
) -> List[int]:
    """Indices of a temporal window centred at ``crt_idx``, padded at clip
    borders. Padding modes (reference data_util.py:63-112):
    'replicate' | 'reflection' | 'reflection_circle' | 'circle'.
    """
    assert num_frames % 2 == 1, "num_frames should be an odd number."
    assert padding in ("replicate", "reflection", "reflection_circle", "circle"), (
        f"Wrong padding mode: {padding}."
    )
    max_frame_num = max_frame_num - 1
    num_pad = num_frames // 2

    indices = []
    for i in range(crt_idx - num_pad, crt_idx + num_pad + 1):
        if i < 0:
            if padding == "replicate":
                pad_idx = 0
            elif padding == "reflection":
                pad_idx = -i
            elif padding == "reflection_circle":
                pad_idx = crt_idx + num_pad - i
            else:
                pad_idx = num_frames + i
        elif i > max_frame_num:
            if padding == "replicate":
                pad_idx = max_frame_num
            elif padding == "reflection":
                pad_idx = max_frame_num * 2 - i
            elif padding == "reflection_circle":
                pad_idx = (crt_idx - num_pad) - (i - max_frame_num)
            else:
                pad_idx = i - num_frames
        else:
            pad_idx = i
        indices.append(pad_idx)
    return indices


def generate_gaussian_kernel(kernel_size: int = 13, sigma: float = 1.6) -> np.ndarray:
    """2-D Gaussian kernel via separable 1-D weights (sums to 1)."""
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    g = np.exp(-(ax**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def duf_downsample(x: np.ndarray, kernel_size: int = 13, scale: int = 4) -> np.ndarray:
    """BD degradation: Gaussian blur (sigma 0.4*scale) + stride-``scale``
    subsampling, matching the DUF protocol (reference data_util.py:338-368).

    Args:
        x: [T, H, W, C] or [B, T, H, W, C] float array.
    """
    assert scale in (2, 3, 4), f"Only scale (2, 3, 4) supported, got {scale}."
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    b, t, h, w, c = x.shape
    pad = kernel_size // 2 + scale * 2
    flat = x.reshape(b * t, h, w, c)
    flat = np.pad(flat, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kernel = generate_gaussian_kernel(kernel_size, 0.4 * scale)
    kh = kernel.shape[0]
    # valid conv with stride `scale` via strided patch sum (host-side only)
    H_out = (flat.shape[1] - kh) // scale + 1
    W_out = (flat.shape[2] - kh) // scale + 1
    out = np.zeros((b * t, H_out, W_out, c), dtype=flat.dtype)
    for i in range(kh):
        for j in range(kh):
            out += kernel[i, j] * flat[:, i : i + H_out * scale : scale, j : j + W_out * scale : scale, :]
    out = out[:, 2:-2, 2:-2, :]
    out = out.reshape(b, t, out.shape[1], out.shape[2], c)
    return out[0] if squeeze else out


def arbitrary_scale_downsample(
    x: np.ndarray, scale: Scale, mode: str = "torch", degradation: str = "BI"
) -> np.ndarray:
    """asBI degradation: bicubic downsample by arbitrary (possibly asymmetric)
    scale. Output size = (round(h/sh), round(w/sw)).

    Args:
        x: [T, H, W, C] or [B, T, H, W, C] float array.
        mode: 'torch' (antialiased, the shipped default) or 'core' (MATLAB).
    """
    squeeze = x.ndim == 4
    if squeeze:
        x = x[None]
    if isinstance(scale, tuple):
        scale_h, scale_w = scale
    else:
        scale_h = scale_w = scale

    if degradation == "BI":
        h, w = x.shape[-3], x.shape[-2]
        size = (round(h / scale_h), round(w / scale_w))
        out = resize_np(x, size, mode=mode, antialias=True)
    elif degradation == "BD":
        out = duf_downsample(x, kernel_size=13, scale=int(scale_h))
    else:
        raise ValueError(f"Unknown degradation {degradation}")
    return out[0] if squeeze else out


def read_img_seq(
    paths: List[str],
    require_mod_crop: bool = False,
    scale: Scale = 1,
    require_as_mod_crop: bool = False,
    return_imgname: bool = False,
):
    """Read a frame sequence from disk into a [T, H, W, C] float32 RGB stack
    in [0, 1] (reference keeps BGR; we convert to RGB at read time since the
    device layout is RGB NHWC)."""
    from .transforms import mod_crop

    imgs = [imread(p, float32=True) for p in paths]
    if require_mod_crop:
        imgs = [mod_crop(img, int(scale)) for img in imgs]
    if require_as_mod_crop:
        imgs = [as_mod_crop(img, scale) for img in imgs]
    stack = np.stack([img[..., ::-1] for img in imgs], axis=0).astype(np.float32)
    if return_imgname:
        imgnames = [osp.splitext(osp.basename(p))[0] for p in paths]
        return stack, imgnames
    return stack


def paths_from_folder(folder: str, suffix=(".png", ".jpg", ".jpeg", ".bmp")) -> List[str]:
    return sorted(
        osp.join(folder, p) for p in scandir(folder) if p.lower().endswith(suffix)
    )


def paths_from_lmdb(folder: str) -> List[str]:
    """Keys listed in the lmdb's meta_info.txt."""
    if not folder.endswith(".lmdb"):
        raise ValueError(f"Folder {folder} should end with '.lmdb'")
    with open(osp.join(folder, "meta_info.txt")) as fin:
        return [line.split(".")[0] for line in fin]


def generate_meta_info_txt(folder: str, meta_info_path: str) -> None:
    """Write '<relpath> (h,w,c)' lines for all images under ``folder``."""
    lines = []
    for rel in sorted(scandir(folder, recursive=True)):
        img = imread(osp.join(folder, rel))
        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        lines.append(f"{rel} ({h},{w},{c})\n")
    os.makedirs(osp.dirname(meta_info_path) or ".", exist_ok=True)
    with open(meta_info_path, "w") as f:
        f.writelines(lines)


def paired_paths_from_meta_info_file(
    folders: List[str], keys: List[str], meta_info_file: str, filename_tmpl: str
) -> List[dict]:
    """Paired (lq, gt) paths resolved through a meta-info manifest."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    with open(meta_info_file, "r") as fin:
        gt_names = [line.strip().split(" ")[0] for line in fin]
    paths = []
    for gt_name in gt_names:
        basename, ext = osp.splitext(osp.basename(gt_name))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append(
            {
                f"{input_key}_path": osp.join(input_folder, input_name),
                f"{gt_key}_path": osp.join(gt_folder, gt_name),
            }
        )
    return paths


def paired_paths_from_folder(
    folders: List[str], keys: List[str], filename_tmpl: str
) -> List[dict]:
    """Paired (lq, gt) paths from two parallel folders."""
    assert len(folders) == 2 and len(keys) == 2
    input_folder, gt_folder = folders
    input_key, gt_key = keys
    input_paths = list(scandir(input_folder))
    gt_paths = list(scandir(gt_folder))
    assert len(input_paths) == len(gt_paths), (
        f"{input_key} and {gt_key} datasets have different number of images: "
        f"{len(input_paths)}, {len(gt_paths)}."
    )
    paths = []
    for gt_path in sorted(gt_paths):
        basename, ext = osp.splitext(osp.basename(gt_path))
        input_name = f"{filename_tmpl.format(basename)}{ext}"
        paths.append(
            {
                f"{input_key}_path": osp.join(input_folder, input_name),
                f"{gt_key}_path": osp.join(gt_folder, gt_path),
            }
        )
    return paths
