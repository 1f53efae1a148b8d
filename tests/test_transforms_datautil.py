"""Transforms and frame-index semantics."""

import numpy as np
import pytest

from savsr_tpu.data.data_util import (
    arbitrary_scale_downsample,
    generate_frame_indices,
)
from savsr_tpu.data.transforms import as_mod_crop, augment, cal_step, mod_crop, single_random_crop


def test_cal_step():
    assert cal_step(2.0) == 1
    assert cal_step(1.5) == 2
    assert cal_step(3.2) == 5
    assert cal_step(1.1) == 10
    assert cal_step(3.05) == 20
    assert cal_step(1.02) == 50


@pytest.mark.parametrize(
    "scale,hw,expected",
    [
        ((4, 4), (180, 320), (180, 320)),
        ((1.5, 4), (181, 322), (180, 320)),
        ((3.05, 3.05), (144, 180), (122, 122)),
    ],
)
def test_as_mod_crop_makes_lr_exact(scale, hw, expected):
    img = np.zeros((*hw, 3), dtype=np.float32)
    out = as_mod_crop(img, scale)
    assert out.shape[:2] == expected
    # LR size must be integral
    h, w = out.shape[:2]
    assert abs(h / scale[0] - round(h / scale[0])) < 1e-6
    assert abs(w / scale[1] - round(w / scale[1])) < 1e-6


def test_mod_crop():
    img = np.zeros((37, 53, 3))
    out = mod_crop(img, 4)
    assert out.shape[:2] == (36, 52)


def test_generate_frame_indices():
    assert generate_frame_indices(0, 30, 5, "replicate") == [0, 0, 0, 1, 2]
    assert generate_frame_indices(0, 30, 5, "reflection") == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 30, 5, "reflection_circle") == [4, 3, 0, 1, 2]
    assert generate_frame_indices(0, 30, 5, "circle") == [3, 4, 0, 1, 2]
    assert generate_frame_indices(29, 30, 5, "reflection") == [27, 28, 29, 28, 27]
    assert generate_frame_indices(15, 30, 7, "reflection") == [12, 13, 14, 15, 16, 17, 18]


def test_single_random_crop_consistent():
    rng = np.random.default_rng(0)
    a = rng.random((64, 80, 3))
    b = a.copy()
    ca, cb = single_random_crop([a, b], (32, 40))
    assert ca.shape == (32, 40, 3)
    np.testing.assert_array_equal(ca, cb)


def test_augment_shapes():
    img = np.random.rand(8, 12, 3).astype(np.float32)
    out, status = augment([img], True, True, return_status=True)
    hflip, vflip, rot90 = status
    expected = (12, 8, 3) if rot90 else (8, 12, 3)
    assert out[0].shape == expected


def test_arbitrary_scale_downsample_shapes():
    x = np.random.rand(7, 66, 90, 3).astype(np.float32)
    out = arbitrary_scale_downsample(x, (1.1, 1.5), mode="torch")
    assert out.shape == (7, 60, 60, 3)
    x5 = np.random.rand(2, 7, 64, 64, 3).astype(np.float32)
    out5 = arbitrary_scale_downsample(x5, (2.0, 2.0), mode="torch")
    assert out5.shape == (2, 7, 32, 32, 3)
