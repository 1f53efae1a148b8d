"""REDS dataset family + LMDB backend coverage.

Synthetic 100-frame REDS-style clips (the REDS layout is <clip>/<frame>.png
with 100 frames per clip, reference reds_dataset.py); the lmdb round-trip
is skip-marked where the lmdb package is absent.
"""

import os

import numpy as np
import pytest

from savsr_tpu.data import build_dataset


@pytest.fixture(scope="module")
def reds_world(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("reds")
    rng = np.random.default_rng(5)
    clips = ["000", "001", "002"]
    for clip in clips:
        dgt = root / "GT" / clip
        dlq = root / "LQ" / clip
        dgt.mkdir(parents=True)
        dlq.mkdir(parents=True)
        base = (rng.random((32, 36, 3)) * 255).astype(np.uint8)
        for i in range(100):
            g = np.roll(base, i % 7, axis=1)
            cv2.imwrite(str(dgt / f"{i:08d}.png"), g)
            cv2.imwrite(str(dlq / f"{i:08d}.png"), g[::2, ::2])
    meta = root / "meta.txt"
    meta.write_text("".join(f"{c} 100 (32,36,3)\n" for c in clips))
    return root


def _base_opt(reds_world, **extra):
    opt = {
        "name": "reds", "dataroot_gt": str(reds_world / "GT"),
        "dataroot_lq": str(reds_world / "LQ"),
        "meta_info_file": str(reds_world / "meta.txt"),
        "io_backend": {"type": "disk"},
        "num_frame": 5, "gt_size": 16, "scale": 2,
        "use_hflip": False, "use_rot": False,
        "interval_list": [1], "random_reverse": False,
        "val_partition": "REDS4",
    }
    opt.update(extra)
    return opt


def test_reds_dataset_windowed(reds_world):
    opt = _base_opt(reds_world, type="REDSDataset")
    ds = build_dataset(opt)
    # clip 000 is in the REDS4 val partition -> excluded
    assert len(ds) == 200
    assert all(not k.startswith("000/") for k in ds.keys)
    item = ds[42]
    assert item["lq"].shape == (5, 8, 8, 3)
    assert item["gt"].shape == (16, 16, 3)
    # GT matches the center-frame LQ upsampled grid (authored as gt[::2, ::2])
    assert np.abs(item["gt"][::2, ::2] - item["lq"][2]).max() < 1e-6


def test_reds_dataset_official_partition(reds_world):
    opt = _base_opt(reds_world, type="REDSDataset", val_partition="official")
    ds = build_dataset(opt)
    assert len(ds) == 300  # 240-269 excluded; our clips are 000-002
    with pytest.raises(ValueError):
        build_dataset(_base_opt(reds_world, type="REDSDataset", val_partition="nope"))


def test_reds_recurrent_dataset(reds_world):
    opt = _base_opt(reds_world, type="REDSRecurrentDataset", num_frame=6)
    ds = build_dataset(opt)
    item = ds[7]
    assert item["lq"].shape == (6, 8, 8, 3)
    assert item["gt"].shape == (6, 16, 16, 3)
    assert np.abs(item["gt"][:, ::2, ::2] - item["lq"]).max() < 1e-6


def test_asreds_dataset_collate(reds_world):
    opt = _base_opt(
        reds_world, type="ASREDSDataset", lq_size=4, max_scale=4,
        single_scale_ft=True, scale=(2, 2), downsample_mode="torch",
    )
    ds = build_dataset(opt)
    item = ds[0]
    assert item["gt"].shape == (5, 16, 16, 3)
    batch = ds.as_collate_fn([ds[0], ds[1]])
    assert batch["scale"] == (2, 2)
    assert batch["gt"].shape == (2, 8, 8, 3)        # center frame only
    assert batch["lq"].shape == (2, 5, 4, 4, 3)


def test_asreds_recurrent_collate(reds_world):
    opt = _base_opt(
        reds_world, type="ASREDSRecurrentDataset", num_frame=4, lq_size=4,
        max_scale=4, single_scale_ft=True, scale=(2, 2),
        downsample_mode="torch", flip_sequence=True,
    )
    ds = build_dataset(opt)
    batch = ds.as_collate_fn([ds[0], ds[1]])
    assert batch["gt"].shape == (2, 8, 8, 8, 3)     # 4 -> 8 frames (flipped)
    assert batch["lq"].shape == (2, 8, 4, 4, 3)
    np.testing.assert_allclose(batch["gt"][:, :4][:, ::-1], batch["gt"][:, 4:])


def test_lmdb_roundtrip(reds_world, tmp_path):
    """Author an LMDB from PNGs and read it back through FileClient + the
    REDS dataset lmdb path."""
    lmdb = pytest.importorskip("lmdb")  # noqa: F841  (absent in this env)
    import cv2

    from savsr_tpu.utils.file_client import FileClient
    from savsr_tpu.utils.lmdb_util import make_lmdb_from_imgs

    gt_dir = str(reds_world / "GT" / "001")
    img_paths = [f"{i:08d}.png" for i in range(4)]
    keys = [f"001/{i:08d}" for i in range(4)]
    db_path = str(tmp_path / "gt.lmdb")
    make_lmdb_from_imgs(gt_dir, db_path, img_paths, keys)

    client = FileClient("lmdb", db_paths=[db_path], client_keys=["gt"])
    buf = client.get("001/00000001", "gt")
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    ref = cv2.imread(os.path.join(gt_dir, "00000001.png"))
    np.testing.assert_array_equal(img, ref)
