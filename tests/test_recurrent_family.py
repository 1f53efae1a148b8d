"""End-to-end coverage of the recurrent model family: a toy 5-D-output
recurrent arch drives ASVSRRecurrentModel (sub_frame output trimming,
reference asvsr_model.py:93,104), the recurrent Vimeo90K datasets (full
paired GT sequences, reference vimeo90k_dataset.py:455-476) and flip_seq /
center_frame_only eval (video_recurrent_model.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from savsr_tpu.utils.registry import ARCH_REGISTRY


def _register_toy():
    if "ToyRecurrentVSR" in ARCH_REGISTRY:
        return ARCH_REGISTRY.get("ToyRecurrentVSR")

    class ToyRecurrentVSR:
        """Minimal recurrent VSR: bilinear upsample + conv residual with a
        scanned hidden state; 5-D output [B, T', H*sh, W*sw, C]. Supports the
        ``sub_frame`` convention: the network itself trims the first/last
        ``sub_frame`` frames from its output (reference asvsr_model.py:93)."""

        def __init__(self, num_feat=8, **kwargs):
            self.num_feat = num_feat

        def init(self, key):
            k1, k2 = jax.random.split(key)
            f = self.num_feat
            return {
                "enc.weight": jax.random.normal(k1, (3, 3, 3 + f, f)) * 0.05,
                "dec.weight": jax.random.normal(k2, (1, 1, f, 3)) * 0.05,
            }

        def apply(self, params, x, scale, train=False, sub_frame=None):
            b, t, h, w, c = x.shape
            H, W = round(h * scale[0]), round(w * scale[1])
            f = self.num_feat

            def step(hidden, frame):
                inp = jnp.concatenate([frame, hidden], axis=-1)
                hidden = jax.nn.relu(
                    jax.lax.conv_general_dilated(
                        inp, params["enc.weight"].astype(inp.dtype), (1, 1),
                        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
                res = jax.lax.conv_general_dilated(
                    hidden, params["dec.weight"].astype(inp.dtype), (1, 1),
                    ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return hidden, res

            h0 = jnp.zeros((b, h, w, f), x.dtype)
            _, res = jax.lax.scan(step, h0, jnp.moveaxis(x, 0, 1))
            res = jnp.moveaxis(res, 0, 1)  # [B,T,h,w,3]
            base = x + res
            out = jax.image.resize(base, (b, t, H, W, c), method="bilinear")
            if sub_frame:
                out = out[:, sub_frame : t - sub_frame]
            return out, {}

    ARCH_REGISTRY.register(ToyRecurrentVSR)
    return ToyRecurrentVSR


@pytest.fixture(scope="module")
def recurrent_world(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("recworld")
    rng = np.random.default_rng(3)
    keys = ["00001/0001", "00001/0002"]
    for key in keys:
        dgt = root / "gt" / key
        dlq = root / "lq" / key
        dgt.mkdir(parents=True)
        dlq.mkdir(parents=True)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        for i in range(1, 8):
            g = np.roll(img, i, axis=0)
            cv2.imwrite(str(dgt / f"im{i}.png"), g)
            cv2.imwrite(str(dlq / f"im{i}.png"), g[::2, ::2])
    (root / "meta.txt").write_text("".join(f"{k} 7 (32,32,3)\n" for k in keys))
    return root


def test_vimeo90k_recurrent_dataset_protocol(recurrent_world):
    """Full paired sequences, not center-frame GT; flip_sequence doubles T."""
    from savsr_tpu.data import build_dataset

    opt = {
        "name": "rec", "type": "Vimeo90KRecurrentDataset",
        "dataroot_gt": str(recurrent_world / "gt"),
        "dataroot_lq": str(recurrent_world / "lq"),
        "meta_info_file": str(recurrent_world / "meta.txt"),
        "io_backend": {"type": "disk"},
        "num_frame": 7, "gt_size": 24, "scale": 2,
        "use_hflip": False, "use_rot": False, "random_reverse": False,
        "flip_sequence": False,
    }
    ds = build_dataset(opt)
    item = ds[0]
    assert item["lq"].shape == (7, 12, 12, 3)
    assert item["gt"].shape == (7, 24, 24, 3)
    # paired: gt frame i is the full-res crop of lq frame i (same subsampling
    # used to author the toy LQ), so gt[::2, ::2] == lq exactly
    assert np.abs(item["gt"][:, ::2, ::2] - item["lq"]).max() < 1e-6

    opt2 = dict(opt, flip_sequence=True)
    ds2 = build_dataset(opt2)
    item2 = ds2[0]
    assert item2["lq"].shape == (14, 12, 12, 3)
    assert item2["gt"].shape == (14, 24, 24, 3)
    np.testing.assert_allclose(item2["gt"][:7][::-1], item2["gt"][7:])


def test_asvsr_recurrent_train_and_eval(recurrent_world, tmp_path, monkeypatch):
    """Recurrent trainer e2e: ASVimeo90KRecurrentDataset -> 5-D outputs with
    sub_frame trimming -> loss + guard; then flip_seq eval."""
    _register_toy()
    from savsr_tpu.train import train_pipeline

    yml = f"""
name: rec_tiny_cli
model_type: ASVSRRecurrentModel
num_gpu: 1
manual_seed: 3

datasets:
  train:
    name: VimeoRec
    type: ASVimeo90KRecurrentDataset
    dataroot_gt: {recurrent_world}/gt
    dataroot_lq: {recurrent_world}/gt
    meta_info_file: {recurrent_world}/meta.txt
    io_backend:
      type: disk
    num_frame: 7
    lq_size: 6
    max_scale: 4
    downsample_mode: torch
    single_scale_ft: true
    random_reverse: false
    use_hflip: false
    use_rot: false
    flip_sequence: false
    num_worker_per_gpu: 0
    batch_size_per_gpu: 1
    dataset_enlarge_ratio: 1

network_g:
  type: ToyRecurrentVSR
  num_feat: 8

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~
  experiments_root: {tmp_path}/experiments

scale: !!python/tuple [2, 2]

train:
  ema_decay: 0
  sub_frame: 1
  alpha: 0
  optim_g:
    type: Adam
    lr: !!float 1e-4
    weight_decay: 0
    betas: [0.9, 0.999]
  scheduler:
    type: MultiStepLR
    milestones: [100]
    gamma: 0.5
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
"""
    cfg = tmp_path / "rec_cfg.yml"
    cfg.write_text(yml)
    monkeypatch.setattr("sys.argv", ["train.py", "-opt", str(cfg)])
    train_pipeline(str(tmp_path))
    exp = tmp_path / "experiments" / "rec_tiny_cli"
    assert (exp / "models" / "net_g_2.npz").is_file()

    # --- eval path: flip_seq temporal self-ensemble + center_frame_only ---
    from savsr_tpu.models import build_model
    from savsr_tpu.utils.options import yaml_load

    opt = yaml_load(yml)
    opt.update({
        "is_train": False, "dist": False, "rank": 0, "world_size": 1,
        "val": {"flip_seq": True, "center_frame_only": False, "metrics": None},
    })
    opt["path"]["pretrain_network_g"] = str(exp / "models" / "net_g_2.npz")
    opt["scale"] = (2, 2)
    model = build_model(opt)

    lq = np.random.default_rng(0).random((1, 7, 8, 8, 3)).astype(np.float32)
    model.feed_data({"lq": lq, "scale": (2, 2)})
    model.test()
    out = np.asarray(model.output)
    assert out.shape == (1, 7, 16, 16, 3)
    assert np.isfinite(out).all()

    # flip_seq must average the forward and reversed passes: a symmetric
    # input sequence gives a temporally symmetric output
    model.opt["val"]["center_frame_only"] = True
    model.feed_data({"lq": lq, "scale": (2, 2)})
    model.test()
    assert np.asarray(model.output).shape == (1, 16, 16, 3)


def test_sub_frame_output_trimming():
    """The network-side sub_frame trim and the model-side gt slice agree."""
    _register_toy()
    net = ARCH_REGISTRY.get("ToyRecurrentVSR")(num_feat=4)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).random((1, 5, 6, 6, 3)), jnp.float32)
    full, _ = net.apply(params, x, (2.0, 2.0))
    trimmed, _ = net.apply(params, x, (2.0, 2.0), sub_frame=1)
    assert full.shape[1] == 5 and trimmed.shape[1] == 3
    np.testing.assert_allclose(np.asarray(full[:, 1:4]), np.asarray(trimmed), rtol=1e-6)
