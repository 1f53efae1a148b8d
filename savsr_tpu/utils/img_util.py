"""Image IO and host<->device layout conversion.

Conventions (TPU-first, differing deliberately from the torch reference):
  - Disk/cv2 images: numpy HWC **BGR**, uint8 or float32 [0,1].
  - Device arrays: **NHWC RGB** float (channel-last for TPU convs).

``img2array``/``array2img`` replace the reference's img2tensor/tensor2img
(lbasicsr/utils/img_util.py:9-96) including the round-to-uint8 semantics that
the PSNR/SSIM evaluation depends on.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import cv2
import numpy as np


def imfrombytes(content: bytes, flag: str = "color", float32: bool = False) -> np.ndarray:
    """Decode an image from bytes (HWC BGR)."""
    img_np = np.frombuffer(content, np.uint8)
    imread_flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }
    img = cv2.imdecode(img_np, imread_flags[flag])
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imread(path: str, flag: str = "color", float32: bool = False) -> np.ndarray:
    with open(path, "rb") as f:
        return imfrombytes(f.read(), flag=flag, float32=float32)


def imwrite(img: np.ndarray, file_path: str, params=None, auto_mkdir: bool = True) -> None:
    if auto_mkdir:
        dir_name = os.path.abspath(os.path.dirname(file_path))
        os.makedirs(dir_name, exist_ok=True)
    ok = cv2.imwrite(file_path, img, params)
    if not ok:
        raise IOError(f"Failed writing image to {file_path}")


def img2array(
    imgs: Union[np.ndarray, Sequence[np.ndarray]], bgr2rgb: bool = True, float32: bool = True
):
    """HWC BGR (cv2) image(s) -> HWC RGB float32 arrays (device layout)."""

    def _convert(img: np.ndarray) -> np.ndarray:
        if img.ndim == 3 and img.shape[2] == 3 and bgr2rgb:
            img = img[..., ::-1]
        img = np.ascontiguousarray(img)
        if float32:
            img = img.astype(np.float32)
        return img

    if isinstance(imgs, (list, tuple)):
        return [_convert(img) for img in imgs]
    return _convert(imgs)


def array2img(
    arr, rgb2bgr: bool = True, out_type=np.uint8, min_max=(0, 1)
) -> Union[np.ndarray, List[np.ndarray]]:
    """Device array(s) -> displayable numpy image(s).

    Accepts HW, HWC, or NHWC (N squeezed if 1). Clamps to ``min_max``,
    rescales to [0,1], and for uint8 rounds (matching tensor2img so metric
    inputs are bit-identical).
    """
    single = not isinstance(arr, (list, tuple))
    arrs = [arr] if single else list(arr)
    result = []
    for a in arrs:
        a = np.asarray(a, dtype=np.float32)
        if a.ndim == 4:
            if a.shape[0] != 1:
                raise ValueError("array2img expects batch size 1 for 4D input")
            a = a[0]
        a = np.clip(a, min_max[0], min_max[1])
        a = (a - min_max[0]) / (min_max[1] - min_max[0])
        if a.ndim == 3:
            if a.shape[2] == 1:
                a = a[..., 0]
            elif rgb2bgr:
                a = a[..., ::-1]
        if out_type == np.uint8:
            a = (a * 255.0).round()
        result.append(np.ascontiguousarray(a.astype(out_type)))
    return result[0] if single else result


def crop_border(imgs, crop_border: int):
    """Crop ``crop_border`` pixels from each edge of HWC image(s)."""
    if crop_border == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[crop_border:-crop_border, crop_border:-crop_border, ...] for v in imgs]
    return imgs[crop_border:-crop_border, crop_border:-crop_border, ...]
