"""scripts/quick_test.py scorer + offline downsampler smoke."""

import importlib.util
import os

import numpy as np
import pytest


def _load_quick_test():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "quick_test.py")
    spec = importlib.util.spec_from_file_location("quick_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_quick_test_score_and_downsample(tmp_path):
    import cv2

    qt = _load_quick_test()
    rng = np.random.default_rng(0)

    gt_root = tmp_path / "GT"
    sr_root = tmp_path / "SR"
    for folder in ["clipA"]:
        (gt_root / folder).mkdir(parents=True)
        (sr_root / folder).mkdir(parents=True)
        for i in range(3):
            img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(gt_root / folder / f"{i:03d}.png"), img)
            noisy = np.clip(img.astype(int) + rng.integers(-6, 6, img.shape), 0, 255)
            cv2.imwrite(str(sr_root / folder / f"{i:03d}.png"), noisy.astype(np.uint8))

    results = qt.score(str(sr_root), str(gt_root), scale=(2.0, 2.0))
    assert "clipA" in results
    psnr, ssim = results["clipA"]
    assert 25 < psnr < 50
    assert 0 < ssim <= 1

    out_root = tmp_path / "LR"
    qt.downsample(str(gt_root), str(out_root), scale=(2.0, 2.0))
    lr = cv2.imread(str(out_root / "clipA" / "000.png"))
    assert lr.shape == (12, 16, 3)
