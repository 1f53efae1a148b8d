"""Bicubic resize parity vs the PyTorch oracle (torch CPU is an allowed
test-only dependency; the framework itself never imports it)."""

import numpy as np
import pytest

from savsr_tpu.data.resize import bicubic_weight_matrix, imresize, resize_jax, resize_np

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_resize(img_hwc, size, antialias):
    t = torch.from_numpy(np.ascontiguousarray(img_hwc.transpose(2, 0, 1)))[None]
    out = F.interpolate(
        t, size=size, mode="bicubic", antialias=antialias, align_corners=False
    )
    return out[0].numpy().transpose(1, 2, 0)


@pytest.mark.parametrize("hw", [(256, 448), (63, 97)])
@pytest.mark.parametrize("scale", [1.1, 2.0, 2.7, 3.05, 4.0])
def test_torch_aa_downsample_parity(hw, scale):
    h, w = hw
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3), dtype=np.float32)
    size = (round(h / scale), round(w / scale))
    mine = resize_np(img, size, mode="torch", antialias=True)
    ref = _torch_resize(img, size, antialias=True)
    assert np.abs(mine - ref).max() < 5e-5


def test_torch_aa_upsample_parity():
    rng = np.random.default_rng(1)
    img = rng.random((40, 56, 3), dtype=np.float32)
    mine = resize_np(img, (64, 80), mode="torch", antialias=True)
    ref = _torch_resize(img, (64, 80), antialias=True)
    assert np.abs(mine - ref).max() < 5e-5


def test_torch_nonaa_parity():
    rng = np.random.default_rng(2)
    img = rng.random((64, 80, 3), dtype=np.float32)
    for size in [(128, 160), (100, 123), (37, 55)]:
        mine = resize_np(img, size, mode="torch", antialias=False)
        ref = _torch_resize(img, size, antialias=False)
        assert np.abs(mine - ref).max() < 5e-5, size


def test_matlab_core_parity_golden():
    """MATLAB-convention resize vs goldens generated from the reference
    core.imresize (tools/gen_goldens.py)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", "core_resize.npz")
    if not os.path.isfile(path):
        pytest.skip("goldens not generated")
    data = np.load(path)
    img = data["img"]
    for key in data.files:
        if not key.startswith("out_"):
            continue
        _, hs, ws = key.split("_")
        ref = data[key]
        mine = imresize(img, sizes=(int(hs), int(ws)))
        assert np.abs(mine - ref).max() < 5e-5, key


def test_weight_matrix_rows_sum_to_one():
    for mode in ["torch", "core"]:
        m = bicubic_weight_matrix(100, 40, mode=mode, scale=0.4, dtype=np.float64)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-10)


def test_resize_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    img = rng.random((2, 48, 64, 3), dtype=np.float32)
    size = (round(48 / 1.5), round(64 / 1.5))
    out_np = resize_np(img, size, mode="torch")
    out_jax = np.asarray(resize_jax(jnp.asarray(img), size, mode="torch"))
    assert np.abs(out_np - out_jax).max() < 1e-4
