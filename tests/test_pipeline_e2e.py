"""End-to-end pipeline tests on synthetic data: eval loop, train loop,
checkpoint save/resume. Uses a tiny SAVSR so XLA CPU compiles stay fast."""

import os
import pickle

import numpy as np
import pytest

TINY_NET = dict(
    type="SAVSR", num_in_ch=3, num_feat=16, num_frame=7, slid_win=3,
    fusion_win=5, interval=0, w1_num_block=2, w2_num_block=1,
    n_resgroups=1, n_resblocks=2, center_frame_idx=None,
)


def _write_clip(root, folder, n_frames, h, w, seed):
    import cv2

    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    os.makedirs(os.path.join(root, folder), exist_ok=True)
    for i in range(n_frames):
        img = np.roll(base, shift=i, axis=1)  # simple panning video
        img = cv2.GaussianBlur(img, (5, 5), 1.0)
        cv2.imwrite(os.path.join(root, folder, f"{i:08d}.png"), img)


@pytest.fixture(scope="module")
def vid_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vid4") / "GT")
    _write_clip(root, "clipA", 8, 36, 44, 0)
    _write_clip(root, "clipB", 8, 36, 44, 1)
    return root


@pytest.fixture(scope="module")
def vimeo_root(tmp_path_factory):
    import cv2

    base = tmp_path_factory.mktemp("vimeo")
    gt_root = str(base / "sequences")
    meta = str(base / "meta_info.txt")
    rng = np.random.default_rng(2)
    keys = ["00001/0001", "00001/0002", "00002/0001"]
    for key in keys:
        d = os.path.join(gt_root, key)
        os.makedirs(d, exist_ok=True)
        img = (rng.random((52, 52, 3)) * 255).astype(np.uint8)
        for i in range(1, 8):
            cv2.imwrite(os.path.join(d, f"im{i}.png"), np.roll(img, i, axis=0))
    with open(meta, "w") as f:
        for key in keys:
            f.write(f"{key} 7 (52,52,3)\n")
    return gt_root, meta


def _eval_opt(vid_root, tmp_path, scale=(2.0, 2.0)):
    return {
        "name": "test_tiny",
        "model_type": "ASVSRModel",
        "num_gpu": 1,
        "is_train": False,
        "dist": False,
        "rank": 0,
        "world_size": 1,
        "manual_seed": 0,
        "network_g": dict(TINY_NET),
        "path": {
            "pretrain_network_g": None,
            "strict_load_g": True,
            "results_root": str(tmp_path),
            "log": str(tmp_path),
            "visualization": str(tmp_path / "vis"),
        },
        "val": {
            "save_img": False,
            "suffix": None,
            "metrics": {
                "psnr_y": {"type": "calculate_psnr", "crop_border": 0, "test_y_channel": True},
                "ssim_y": {"type": "calculate_ssim", "crop_border": 0, "test_y_channel": True},
            },
        },
        "datasets": {},
        "scale": scale,
    }


@pytest.mark.heavy
def test_eval_pipeline(vid_root, tmp_path):
    from savsr_tpu.data import build_dataloader, build_dataset
    from savsr_tpu.models import build_model

    ds_opt = {
        "name": "Vid4_tiny_x2",
        "type": "ASVideoTestDataset",
        "dataroot_gt": vid_root,
        "dataroot_lq": vid_root,
        "io_backend": {"type": "disk"},
        "cache_data": False,
        "num_frame": 7,
        "padding": "reflection",
        "use_arbitrary_scale_downsampling": True,
        "downsampling_scale": (2.0, 2.0),
        "downsampling_mode": "torch",
        "phase": "test",
    }
    dataset = build_dataset(ds_opt)
    assert len(dataset) == 16
    item = dataset[0]
    assert item["lq"].shape == (7, 18, 22, 3)
    assert item["gt"].shape == (36, 44, 3)

    loader = build_dataloader(dataset, ds_opt)
    opt = _eval_opt(vid_root, tmp_path)
    model = build_model(opt)
    model.validation(loader, current_iter=1, tb_logger=None, save_img=False)
    res = model.last_metric_results
    # untrained net ~= bilinear upscale via the global skip: PSNR is finite
    # and clearly better than noise
    assert 10 < res["psnr_y"] < 60
    assert 0 < res["ssim_y"] <= 1


@pytest.mark.heavy
def test_train_pipeline_smoke(vimeo_root, tmp_path):
    from savsr_tpu.data import build_dataloader, build_dataset
    from savsr_tpu.models import build_model

    gt_root, meta = vimeo_root
    ds_opt = {
        "name": "Vimeo90K_tiny",
        "type": "ASVimeo90KDataset",
        "dataroot_gt": gt_root,
        "dataroot_lq": gt_root,
        "meta_info_file": meta,
        "io_backend": {"type": "disk"},
        "num_frame": 7,
        "lq_size": 12,
        "max_scale": 4,
        "downsample_mode": "torch",
        "init_int_scale": True,
        "single_scale_ft": False,
        "CL_train_set": None,
        "random_reverse": False,
        "use_hflip": True,
        "use_rot": True,
        "num_worker_per_gpu": 0,
        "batch_size_per_gpu": 2,
        "dataset_enlarge_ratio": 1,
        "phase": "train",
        "scale": (2.0, 2.0),
    }
    dataset = build_dataset(ds_opt)
    loader = build_dataloader(dataset, ds_opt, sampler=None, seed=0)
    loader.set_epoch(1)  # epoch 1: random scale draws from the full pool

    opt = _eval_opt(gt_root, tmp_path)
    opt["is_train"] = True
    opt["path"]["experiments_root"] = str(tmp_path / "exp")
    opt["path"]["models"] = str(tmp_path / "exp" / "models")
    opt["path"]["training_states"] = str(tmp_path / "exp" / "training_states")
    os.makedirs(opt["path"]["models"], exist_ok=True)
    os.makedirs(opt["path"]["training_states"], exist_ok=True)
    opt["train"] = {
        "ema_decay": 0.999,
        "optim_g": {"type": "Adam", "lr": 2e-4, "weight_decay": 0, "betas": [0.9, 0.999]},
        "scheduler": {
            "type": "CosineAnnealingRestartLR",
            "periods": [10, 10],
            "restart_weights": [1, 0.5],
            "eta_min": 1e-7,
        },
        "total_iter": 20,
        "warmup_iter": -1,
        "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0, "reduction": "mean"},
    }
    model = build_model(opt)

    # force a fixed scale so both steps hit one compiled executable
    dataset.single_scale_ft = True
    dataset.init_int_scale = False
    losses = []
    for step in range(2):
        batch = next(iter(loader))
        assert batch["lq"].shape == (2, 7, 12, 12, 3)
        assert batch["gt"].shape == (2, 24, 24, 3)
        model.update_learning_rate(step + 1)
        model.feed_data(batch)
        model.optimize_parameters(step + 1)
        losses.append(model.log_dict["l_pix"])
    assert all(np.isfinite(losses))

    # save / resume roundtrip
    model.save(epoch=0, current_iter=2)
    ckpt = os.path.join(opt["path"]["models"], "net_g_2.npz")
    assert os.path.isfile(ckpt)
    state_file = os.path.join(opt["path"]["training_states"], "2.state")
    assert os.path.isfile(state_file)

    loaded = model.load_network(ckpt, "params")
    assert set(loaded.keys()) == set(model.params.keys())
    ema = model.load_network(ckpt, "params_ema")
    assert set(ema.keys()) == set(model.params.keys())
    with open(state_file, "rb") as f:
        state = pickle.load(f)
    assert state["iter"] == 2
    model.resume_training(state)


@pytest.mark.heavy
def test_eval_device_metrics_close_to_host(vid_root, tmp_path):
    """On-device validation metrics track the canonical host metrics."""
    from savsr_tpu.data import build_dataloader, build_dataset
    from savsr_tpu.models import build_model

    ds_opt = {
        "name": "Vid4_tiny_x2_dev",
        "type": "ASVideoTestDataset",
        "dataroot_gt": vid_root,
        "dataroot_lq": vid_root,
        "io_backend": {"type": "disk"},
        "cache_data": True,
        "num_frame": 7,
        "padding": "reflection",
        "use_arbitrary_scale_downsampling": True,
        "downsampling_scale": (2.0, 2.0),
        "downsampling_mode": "torch",
        "phase": "test",
    }
    dataset = build_dataset(ds_opt)
    loader = build_dataloader(dataset, ds_opt)
    opt = _eval_opt(vid_root, tmp_path)
    model = build_model(opt)
    model.validation(loader, current_iter=1, tb_logger=None, save_img=False)
    host = dict(model.last_metric_results)
    model.opt["val"]["metrics_device"] = True
    model.validation(loader, current_iter=2, tb_logger=None, save_img=False)
    dev = dict(model.last_metric_results)
    assert abs(host["psnr_y"] - dev["psnr_y"]) < 0.1
    assert abs(host["ssim_y"] - dev["ssim_y"]) < 0.01


@pytest.mark.heavy
def test_train_bf16_device_degrade(vimeo_root, tmp_path):
    """AMP-analog bf16 compute + on-device asBI degradation path."""
    from savsr_tpu.data import build_dataloader, build_dataset
    from savsr_tpu.models import build_model

    gt_root, meta = vimeo_root
    ds_opt = {
        "name": "Vimeo90K_tiny_dd",
        "type": "ASVimeo90KDataset",
        "dataroot_gt": gt_root,
        "dataroot_lq": gt_root,
        "meta_info_file": meta,
        "io_backend": {"type": "disk"},
        "num_frame": 7,
        "lq_size": 12,
        "max_scale": 4,
        "downsample_mode": "torch",
        "degrade_on_device": True,
        "single_scale_ft": True,
        "random_reverse": False,
        "use_hflip": False,
        "use_rot": False,
        "batch_size_per_gpu": 1,
        "phase": "train",
        "scale": (2.0, 2.0),
    }
    dataset = build_dataset(ds_opt)
    loader = build_dataloader(dataset, ds_opt, sampler=None, seed=0)

    opt = _eval_opt(gt_root, tmp_path)
    opt["is_train"] = True
    opt["path"]["experiments_root"] = str(tmp_path / "exp2")
    opt["path"]["models"] = str(tmp_path / "exp2" / "models")
    opt["path"]["training_states"] = str(tmp_path / "exp2" / "training_states")
    opt["train"] = {
        "ema_decay": 0,
        "bf16": True,
        "degrade_on_device": True,
        "downsample_mode": "torch",
        "optim_g": {"type": "Adam", "lr": 1e-4, "weight_decay": 0, "betas": [0.9, 0.999]},
        "scheduler": {"type": "constant"},
        "total_iter": 4,
        "warmup_iter": -1,
        "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0, "reduction": "mean"},
    }
    model = build_model(opt)
    batch = next(iter(loader))
    assert batch["lq"].shape == (1, 7, 24, 24, 3)  # GT window, not yet degraded
    model.update_learning_rate(1)
    model.feed_data(batch)
    model.optimize_parameters(1)
    assert np.isfinite(model.log_dict["l_pix"])


def test_scheduler_values():
    from savsr_tpu.models.lr_scheduler import cosine_annealing_restart_lr

    sched = cosine_annealing_restart_lr(
        2e-4, periods=[300000] * 4, restart_weights=[1, 0.5, 0.5, 0.5], eta_min=1e-7
    )
    assert abs(sched(0) - 2e-4) < 1e-9
    assert sched(150000) == pytest.approx(1e-7 + 0.5 * (2e-4 - 1e-7), rel=1e-6)
    assert sched(300000) == pytest.approx(1e-7 + 0.25 * (2e-4 - 1e-7) * 2, rel=1e-6)
    assert sched(299999) < 2e-6


def test_enlarged_sampler():
    from savsr_tpu.data.loader import EnlargedSampler

    s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=2)
    s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=2)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 10
    assert all(0 <= i < 10 for i in i0 + i1)
    s0.set_epoch(4)
    assert list(s0) != i0  # reshuffled per epoch
