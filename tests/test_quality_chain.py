"""Composed quality-parity chain: the COMPLETE reference eval pipeline
(torch) vs the COMPLETE savsr_tpu eval pipeline on the same data + weights.

This covers every seam the per-link parity tests cannot: as_mod_crop ->
asBI degrade -> forward -> BI post-process -> uint8 rounding -> Y-channel
metric (reference sr_model.py:291-304, img_util.py:38, psnr_ssim.py:12,85).
Gate: final logged PSNR within 0.01 dB, SSIM within 1e-4, at three scales
including an asymmetric one.

Recipe for the real numbers (needs network egress for savsr_best.pth +
Vid4): convert the checkpoint per README "import reference weights", then
  python -m savsr_tpu.test -opt options/test/SAVSR/test_SAVSR_Vid4_asBI.yml
and compare against BASELINE.md.
"""

import os

import numpy as np
import pytest

from savsr_tpu.utils.convert import convert_state_dict

from ref_pipeline import load_reference_pipeline, reference_eval_chain

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

SCALES = [(2.0, 2.0), (1.5, 3.5), (3.05, 3.05)]


@pytest.fixture(scope="module")
def chain_world(tmp_path_factory):
    """Mini-Vid4: 2 clips with different sizes, structured content."""
    import cv2

    root = tmp_path_factory.mktemp("chain")
    gt = root / "GT"
    rng = np.random.default_rng(11)
    # >= 61 px so as_mod_crop survives the x3.05 fractional scale
    # (step 20 -> GT must hold a 61-px multiple)
    specs = {"calendar": (75, 70, 5), "city": (68, 66, 4)}
    for clip, (h, w, n) in specs.items():
        d = gt / clip
        d.mkdir(parents=True)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (
            120
            + 80 * np.sin(yy / 7.0)[..., None] * np.cos(xx / 9.0)[..., None]
            + 40 * rng.random((h, w, 3))
        ).clip(0, 255).astype(np.uint8)
        for i in range(n):
            cv2.imwrite(str(d / f"{i:08d}.png"), np.roll(base, 2 * i, axis=1))
    return root


@pytest.fixture(scope="module")
def small_state():
    path = os.path.join(GOLDEN_DIR, "savsr_small_state.npz")
    if not os.path.isfile(path):
        pytest.skip("savsr_small_state.npz golden not generated")
    return dict(np.load(path))


def _run_ours(tmp_path, gt_root, scale, state, monkeypatch):
    """Drive the real savsr_tpu.test CLI pipeline."""
    from savsr_tpu.test import test_pipeline

    ckpt = tmp_path / "net_g_chain.npz"
    jx = convert_state_dict(state)
    np.savez(ckpt, **{f"params/{k}": np.asarray(v) for k, v in jx.items()})

    yml = f"""
name: chain_{scale[0]}_{scale[1]}
model_type: ASVSRModel
num_gpu: 1
manual_seed: 0

datasets:
  test_01:
    name: MiniVid4
    type: ASVideoTestDataset
    dataroot_gt: {gt_root}
    dataroot_lq: {gt_root}
    io_backend:
      type: disk
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [{scale[0]}, {scale[1]}]
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
  pretrain_network_g: {ckpt}
  param_key_g: params
  strict_load_g: true
  resume_state: ~

val:
  save_img: false
  suffix: ~
  metrics:
    psnr_y:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: true
    ssim_y:
      type: calculate_ssim
      crop_border: 0
      test_y_channel: true
"""
    cfg = tmp_path / f"chain_{scale[0]}_{scale[1]}.yml"
    cfg.write_text(yml)
    monkeypatch.setattr("sys.argv", ["test.py", "-opt", str(cfg)])
    results = test_pipeline(str(tmp_path))
    return results["MiniVid4"]


@pytest.mark.parametrize("scale", SCALES)
def test_quality_chain_end_to_end(chain_world, small_state, tmp_path, monkeypatch, scale):
    ns = load_reference_pipeline()
    if ns is None:
        pytest.skip("reference tree unavailable")

    ref_psnr, ref_ssim, ref_folders = reference_eval_chain(
        ns, str(chain_world / "GT"), scale, small_state
    )
    ours = _run_ours(tmp_path, chain_world / "GT", scale, small_state, monkeypatch)

    assert abs(ours["psnr_y"] - ref_psnr) < 0.01, (
        f"PSNR chain mismatch at {scale}: ours {ours['psnr_y']:.4f} vs "
        f"reference {ref_psnr:.4f} (folders {ref_folders})"
    )
    assert abs(ours["ssim_y"] - ref_ssim) < 1e-4, (
        f"SSIM chain mismatch at {scale}: ours {ours['ssim_y']:.6f} vs "
        f"reference {ref_ssim:.6f}"
    )
