"""Eval-precision tier decision sweep (strict f32 vs fast-parity).

Runs the shipped 42-block Vid4 multi-scale eval protocol
(options/test/SAVSR/test_SAVSR_Vid4_asBI.yml — all 42 downsampling_scale
blocks, Y-channel PSNR, crop_border 0, reference protocol
test_SAVSR_Vid4_asBI.yml:856-864) twice on synthetic natural-ish clips
with the golden flagship weights:

  strict       network_g: matmul_precision: float32  (shipped default)
  fast-parity  network_g: matmul_precision: default  (bf16 MXU multiplies
               on f32 carries — measured 12.97 vs 5.16 fps at x4 720p)

and reports the composed per-block Y-PSNR delta. Decision gate (VERDICT
r3 #4): if the delta is <=0.01 dB on every block, the shipped eval YAMLs
can flip to fast-parity for a ~2.5x faster sweep.

Uses bucketed eval (val: bucket_eval + bucket_auto) so the 42 blocks
share a few compiled programs; bucketing parity vs the exact path is
pinned separately (<5e-5 worst-pixel, tests/test_bucketed_eval.py), so
deltas measured here transfer to the exact path.

Usage: python scripts/eval_tier_sweep.py [--frames 6] [--size 288 352]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache"))

import numpy as np  # noqa: E402


def make_world(root: str, n_clips: int, frames: int, h: int, w: int) -> None:
    import cv2

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for c in range(n_clips):
        base = (
            120
            + 70 * np.sin(yy / (17 + 4 * c)) * np.cos(xx / (23 + 3 * c))
            + 40 * (((xx + yy) // 40) % 2)
        )
        tex = cv2.GaussianBlur(rng.normal(size=(h, w)).astype(np.float32), (0, 0), 1.4) * 35
        d = os.path.join(root, "Vid4", "GT", f"clip{c}")
        os.makedirs(d, exist_ok=True)
        for t in range(frames):
            frame = np.stack(
                [np.roll(base + tex, t * 2 + k, axis=1) for k in range(3)], axis=-1
            ).clip(0, 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{t:08d}.png"), frame)


def scales_from_shipped_yml() -> list:
    path = os.path.join(_repo, "options", "test", "SAVSR", "test_SAVSR_Vid4_asBI.yml")
    scales = []
    for m in re.finditer(r"downsampling_scale: !!python/tuple \[([\d.]+), ([\d.]+)\]",
                         open(path).read()):
        scales.append((float(m.group(1)), float(m.group(2))))
    return scales


# tier name -> (matmul_precision, conv_precision)
TIERS = {
    "strict": ("float32", "native"),
    "fast": ("default", "native"),
    "split": ("float32", "split"),  # bf16x3 convs on f32 carries
}


def build_yml(root: str, scales, precision: str, weights: str,
              conv_precision: str = "native") -> str:
    blocks = []
    for i, (sh, sw) in enumerate(scales, 1):
        blocks.append(f"""
  test_{i:02d}:
    name: Vid4_x{sh}_{sw}
    type: ASVideoTestDataset
    dataroot_gt: {root}/Vid4/GT
    dataroot_lq: {root}/Vid4/GT
    io_backend:
      type: disk
    cache_data: true
    num_frame: 7
    padding: reflection
    use_arbitrary_scale_downsampling: true
    downsampling_scale: !!python/tuple [{sh}, {sw}]
    downsampling_mode: torch""")
    return f"""
name: tier_sweep_{precision}
model_type: ASVSRModel
num_gpu: 1
manual_seed: 0

datasets:{''.join(blocks)}

network_g:
  type: SAVSR
  num_in_ch: 3
  num_feat: 64
  num_frame: 7
  slid_win: 3
  fusion_win: 5
  interval: 0
  w1_num_block: 4
  w2_num_block: 2
  n_resgroups: 4
  n_resblocks: 8
  center_frame_idx: ~
  conv_engine: chw
  matmul_precision: {precision}
  conv_precision: {conv_precision}

path:
  pretrain_network_g: {weights}
  strict_load_g: true
  resume_state: ~

val:
  save_img: false
  bucket_eval: true
  bucket_auto: true
  aot_cache: true
  suffix: ~
  metrics:
    psnr_y:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: true
"""


def run_tier(workdir: str, yml_text: str, tag: str) -> dict:
    from savsr_tpu.test import test_pipeline

    cfg = os.path.join(workdir, f"tier_{tag}.yml")
    with open(cfg, "w") as f:
        f.write(yml_text)
    argv_save = sys.argv
    sys.argv = ["test.py", "-opt", cfg]
    try:
        t0 = time.perf_counter()
        results = test_pipeline(workdir)
        wall = time.perf_counter() - t0
    finally:
        sys.argv = argv_save
    return {"results": results, "wall_s": wall}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--clips", type=int, default=1)
    ap.add_argument("--size", type=int, nargs=2, default=(288, 352))
    ap.add_argument("--workdir", default="/tmp/tier_sweep")
    ap.add_argument("--limit", type=int, default=0,
                    help="limit to first N scale blocks (0 = all 42)")
    ap.add_argument("--tiers", default="strict,fast",
                    help="comma list from strict|fast|split; first is baseline")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    make_world(args.workdir, args.clips, args.frames, *args.size)

    # golden flagship weights (tests/goldens/savsr_state_dict.npz, torch
    # layout) -> converted pretrain npz
    from savsr_tpu.utils.convert import convert_state_dict

    sd = convert_state_dict(dict(np.load(
        os.path.join(_repo, "tests", "goldens", "savsr_state_dict.npz"))))
    weights = os.path.join(args.workdir, "golden_flagship.npz")
    np.savez(weights, **{f"params/{k}": v for k, v in sd.items()})

    scales = scales_from_shipped_yml()
    if args.limit:
        scales = scales[: args.limit]
    print(f"sweeping {len(scales)} scale blocks at {args.size}, "
          f"{args.clips} clip(s) x {args.frames} frames", flush=True)

    tiers = [t.strip() for t in args.tiers.split(",")]
    assert tiers[0] == "strict", "first tier is the baseline"
    out = {}
    for tier in tiers:
        precision, conv_precision = TIERS[tier]
        r = run_tier(
            args.workdir,
            build_yml(args.workdir, scales, precision, weights,
                      conv_precision=conv_precision),
            tier)
        out[tier] = r
        print(f"{tier}: wall {r['wall_s']:.1f}s", flush=True)

    strict = out[tiers[0]]["results"]
    summary = {"blocks": len(strict),
               f"{tiers[0]}_wall_s": round(out[tiers[0]]["wall_s"], 1)}
    for tier in tiers[1:]:
        other = out[tier]["results"]
        rows, worst = [], (0.0, None)
        for name in strict:
            p_s = strict[name]["psnr_y"]
            p_f = other[name]["psnr_y"]
            d = abs(p_f - p_s)
            rows.append((name, p_s, p_f, d))
            if d > worst[0]:
                worst = (d, name)
        print(f"\n{'block':24s} {'strict':>9s} {tier:>9s} {'|delta|':>9s}")
        for name, p_s, p_f, d in rows:
            print(f"{name:24s} {p_s:9.4f} {p_f:9.4f} {d:9.5f}")
        print(f"\n{tier}: worst |delta| {worst[0]:.5f} dB on {worst[1]}; "
              f"wall strict {out[tiers[0]]['wall_s']:.1f}s vs "
              f"{tier} {out[tier]['wall_s']:.1f}s")
        summary[f"{tier}_worst_delta_db"] = worst[0]
        summary[f"{tier}_worst_block"] = worst[1]
        summary[f"{tier}_wall_s"] = round(out[tier]["wall_s"], 1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
