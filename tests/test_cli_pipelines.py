"""CLI-shape tests: drive train_pipeline / test_pipeline through YAML
configs exactly as a user would (tiny synthetic data, debug-scale runs)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # tiny end-to-end train+eval pipeline compiles: heavy tier


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    """Synthetic Vid4-style eval clips + Vimeo-style training septuplets."""
    import cv2

    root = tmp_path_factory.mktemp("world")
    gt = root / "Vid4" / "GT"
    rng = np.random.default_rng(0)
    for clip in ["calendar", "city"]:
        d = gt / clip
        d.mkdir(parents=True)
        img = (rng.random((36, 44, 3)) * 255).astype(np.uint8)
        for i in range(8):
            cv2.imwrite(str(d / f"{i:08d}.png"), np.roll(img, i, axis=1))

    vimeo = root / "vimeo" / "sequences"
    keys = ["00001/0001", "00001/0002"]
    for key in keys:
        d = vimeo / key
        d.mkdir(parents=True)
        img = (rng.random((52, 52, 3)) * 255).astype(np.uint8)
        for i in range(1, 8):
            cv2.imwrite(str(d / f"im{i}.png"), np.roll(img, i, axis=0))
    meta = root / "meta.txt"
    meta.write_text("".join(f"{k} 7 (52,52,3)\n" for k in keys))
    return root


NET_TINY = """
network_g:
  type: SAVSR
  num_in_ch: 3
  num_feat: 16
  num_frame: 7
  slid_win: 3
  fusion_win: 5
  interval: 0
  w1_num_block: 2
  w2_num_block: 1
  n_resgroups: 1
  n_resblocks: 2
  center_frame_idx: ~
"""


def test_test_pipeline_cli(tiny_world, tmp_path, monkeypatch):
    from savsr_tpu.test import test_pipeline

    yml = f"""
name: test_tiny_cli
model_type: ASVSRModel
num_gpu: 1
manual_seed: 0

datasets:
  test_01:
    name: Vid4_x2
    type: ASVideoTestDataset
    dataroot_gt: {tiny_world}/Vid4/GT
    dataroot_lq: {tiny_world}/Vid4/GT
    io_backend:
      type: disk
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [2, 2]
    downsampling_mode: torch
{NET_TINY}
path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

val:
  save_img: true
  suffix: ~
  metrics:
    psnr_y:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: true
"""
    cfg = tmp_path / "test_cfg.yml"
    cfg.write_text(yml)
    monkeypatch.setattr(
        "sys.argv", ["test.py", "-opt", str(cfg)]
    )
    results = test_pipeline(str(tmp_path))
    assert "Vid4_x2" in results
    assert 10 < results["Vid4_x2"]["psnr_y"] < 60
    # saved SR images exist
    vis = tmp_path / "results" / "test_tiny_cli" / "visualization" / "Vid4_x2"
    assert any(vis.rglob("*.png"))


def test_train_pipeline_cli(tiny_world, tmp_path, monkeypatch):
    from savsr_tpu.train import train_pipeline

    yml = f"""
name: train_tiny_cli
model_type: ASVSRModel
num_gpu: 1
manual_seed: 7

datasets:
  train:
    name: Vimeo90K_tiny
    type: ASVimeo90KDataset
    dataroot_gt: {tiny_world}/vimeo/sequences
    dataroot_lq: {tiny_world}/vimeo/sequences
    meta_info_file: {tiny_world}/meta.txt
    io_backend:
      type: disk
    num_frame: 7
    lq_size: 12
    max_scale: 4
    downsample_mode: torch
    init_int_scale: false
    single_scale_ft: true
    random_reverse: false
    use_hflip: true
    use_rot: true
    num_worker_per_gpu: 0
    batch_size_per_gpu: 1
    dataset_enlarge_ratio: 1
{NET_TINY}
path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~
  experiments_root: {tmp_path}/experiments

scale: !!python/tuple [2, 2]

train:
  ema_decay: 0.999
  optim_g:
    type: Adam
    lr: !!float 1e-4
    weight_decay: 0
    betas: [0.9, 0.999]
  scheduler:
    type: CosineAnnealingRestartLR
    periods: [100]
    restart_weights: [1]
    eta_min: !!float 1e-7
  total_iter: 2
  warmup_iter: -1
  pixel_opt:
    type: CharbonnierLoss
    loss_weight: 1.0
    reduction: mean

logger:
  print_freq: 1
  save_checkpoint_freq: 2
  use_tb_logger: false
  wandb:
    project: ~
    resume_id: ~
"""
    cfg = tmp_path / "train_cfg.yml"
    cfg.write_text(yml)
    monkeypatch.setattr("sys.argv", ["train.py", "-opt", str(cfg)])
    train_pipeline(str(tmp_path))
    exp = tmp_path / "experiments" / "train_tiny_cli"
    assert (exp / "models" / "net_g_2.npz").is_file()
    assert (exp / "models" / "net_g_latest.npz").is_file()
    assert (exp / "training_states" / "2.state").is_file()
    # config copy with provenance header
    copied = exp / "train_cfg.yml"
    assert copied.is_file() and copied.read_text().startswith("# GENERATE TIME")

    # --auto_resume picks up 2.state and continues to total_iter=4
    cfg4 = tmp_path / "train_cfg4.yml"
    cfg4.write_text(yml.replace("total_iter: 2", "total_iter: 4"))
    monkeypatch.setattr("sys.argv", ["train.py", "-opt", str(cfg4), "--auto_resume"])
    train_pipeline(str(tmp_path))
    assert (exp / "models" / "net_g_4.npz").is_file()
    assert (exp / "training_states" / "4.state").is_file()


def test_test_pipeline_auto_bucketed(tiny_world, tmp_path, monkeypatch):
    """Two-scale sweep with ``val: bucket_auto``: the pipeline pre-scans the
    datasets, plans buckets, and the bucketed results match the exact path
    (the x2/x4 HR canvases must not be forced into one bucket when the
    compile cost is low)."""
    from savsr_tpu.test import test_pipeline

    def yml(bucket_block):
        return f"""
name: test_autobucket_cli
model_type: ASVSRModel
num_gpu: 1
manual_seed: 0

datasets:
  test_01:
    name: Vid4_x2
    type: ASVideoTestDataset
    dataroot_gt: {tiny_world}/Vid4/GT
    dataroot_lq: {tiny_world}/Vid4/GT
    io_backend:
      type: disk
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [2, 2]
    downsampling_mode: torch
  test_02:
    name: Vid4_x4
    type: ASVideoTestDataset
    dataroot_gt: {tiny_world}/Vid4/GT
    dataroot_lq: {tiny_world}/Vid4/GT
    io_backend:
      type: disk
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [4, 4]
    downsampling_mode: torch
{NET_TINY}
path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

val:
  save_img: false
  suffix: ~
{bucket_block}
  metrics:
    psnr_y:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: true
"""

    # exact (non-bucketed) reference numbers
    cfg = tmp_path / "exact.yml"
    cfg.write_text(yml(""))
    monkeypatch.setattr("sys.argv", ["test.py", "-opt", str(cfg)])
    exact = test_pipeline(str(tmp_path))

    bucket_block = (
        "  bucket_eval: true\n"
        "  bucket_auto: true\n"
        "  bucket_compile_cost: 0.001\n"
    )
    cfg2 = tmp_path / "auto.yml"
    cfg2.write_text(yml(bucket_block))
    monkeypatch.setattr("sys.argv", ["test.py", "-opt", str(cfg2)])
    auto = test_pipeline(str(tmp_path))

    for ds in ("Vid4_x2", "Vid4_x4"):
        assert abs(auto[ds]["psnr_y"] - exact[ds]["psnr_y"]) < 0.01, ds
