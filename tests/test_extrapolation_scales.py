"""Beyond-training-range extrapolation scales (x6-x12).

The reference's Vid4 protocol carries six extrapolation blocks past the
[1.1, 4] training pool (reference options/test/SAVSR/test_SAVSR_Vid4_asBI
.yml:727-825: x6, x7, x7.5, x8, x9.5, x12). These tests pin that the
whole eval machinery — cal_step/as_mod_crop geometry, the asBI
downsampler, the SAVSR forward (STAU band logic at extreme HR/LR
ratios), and the real test_pipeline — handles those scales.
"""

import numpy as np
import pytest

EXTRAP_SCALES = [(6.0, 6.0), (7.0, 7.0), (7.5, 7.5), (8.0, 8.0),
                 (9.5, 9.5), (12.0, 12.0)]


def test_geometry_at_extrapolation_scales():
    """cal_step / as_mod_crop produce exact integral LR sizes at x6-x12."""
    from savsr_tpu.data.transforms import as_mod_crop, cal_step

    rng = np.random.default_rng(0)
    img = rng.random((480, 720, 3)).astype(np.float32)
    for sh, sw in EXTRAP_SCALES:
        step_h, step_w = cal_step(sh), cal_step(sw)
        out = as_mod_crop(img, (sh, sw))
        h, w = out.shape[:2]
        assert h > 0 and w > 0
        # the contract: H/s and W/s are integral (so the LR size is exact)
        assert abs(h / sh - round(h / sh)) < 1e-9, (sh, h)
        assert abs(w / sw - round(w / sw)) < 1e-9, (sw, w)
        assert round(h / sh) % 1 == 0 and (round(h / sh) // step_h) * step_h * sh == h


def test_downsample_at_extrapolation_scales():
    """asBI downsampling yields round(h/s) x round(w/s) LR at x6-x12."""
    from savsr_tpu.data.data_util import arbitrary_scale_downsample
    from savsr_tpu.data.transforms import as_mod_crop

    rng = np.random.default_rng(1)
    gt = rng.random((7, 480, 720, 3)).astype(np.float32)
    for s in EXTRAP_SCALES:
        cropped = np.stack([as_mod_crop(f, s) for f in gt])
        lq = arbitrary_scale_downsample(cropped, s, mode="torch")
        h, w = cropped.shape[1:3]
        assert lq.shape == (7, round(h / s[0]), round(w / s[1]), 3)
        assert np.isfinite(lq).all()


@pytest.mark.heavy
def test_forward_at_extrapolation_scales():
    """Tiny SAVSR forward at x7.5 and x12: exact output size, finite."""
    import jax
    import jax.numpy as jnp

    from savsr_tpu.archs.savsr_arch import SAVSR

    model = SAVSR(num_in_ch=3, num_feat=16, num_frame=7, slid_win=3,
                  fusion_win=5, interval=0, w1_num_block=2, w2_num_block=1,
                  n_resgroups=1, n_resblocks=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 7, 8, 10, 3)), jnp.float32)
    for s in [(7.5, 7.5), (12.0, 12.0)]:
        sr, _ = model.apply(params, x, s, train=False)
        assert sr.shape[1:3] == (round(8 * s[0]), round(10 * s[1]))
        assert bool(jnp.isfinite(sr).all())


@pytest.mark.heavy
def test_eval_pipeline_extrapolation_block(tmp_path, monkeypatch):
    """The real test_pipeline runs an x6 extrapolation block end-to-end
    (synthetic Vid4-style clip, tiny net) — the CLI-surface smoke the
    48-block protocol needs."""
    import cv2

    from savsr_tpu.test import test_pipeline

    gt = tmp_path / "Vid4" / "GT" / "calendar"
    gt.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = (rng.random((36, 48, 3)) * 255).astype(np.uint8)
    for i in range(8):
        cv2.imwrite(str(gt / f"{i:08d}.png"), np.roll(img, i, axis=1))

    yml = f"""
name: test_extrap_cli
model_type: ASVSRModel
num_gpu: 1
manual_seed: 0

datasets:
  test_01:
    name: Vid4_x6
    type: ASVideoTestDataset
    dataroot_gt: {tmp_path}/Vid4/GT
    dataroot_lq: {tmp_path}/Vid4/GT
    io_backend:
      type: disk
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [6, 6]
    downsampling_mode: torch

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
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(yml)
    monkeypatch.setattr("sys.argv", ["test.py", "-opt", str(cfg)])
    results = test_pipeline(str(tmp_path))
    assert "Vid4_x6" in results
    assert np.isfinite(results["Vid4_x6"]["psnr_y"])
    vis = tmp_path / "results" / "test_extrap_cli" / "visualization" / "Vid4_x6"
    srs = list(vis.rglob("*.png"))
    assert srs
    # x6 of the 36x48 GT: LR 6x8 -> SR back at 36x48
    im = cv2.imread(str(srs[0]))
    assert im.shape == (36, 48, 3)
