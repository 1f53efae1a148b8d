"""On-chip measurement of the REAL multi-scale training recipe.

The shipped recipe (options/train/SAVSR/train_SAVSR_Vimeo90K_asBI.yml)
draws one scale per batch from the 60-entry pool (reference
lbasicsr/data/vimeo90k_dataset.py:266-309) — on XLA that means one
compiled training program per drawn scale. This script runs a
few-hundred-iter segment of that recipe at the CLI surface
(`python -m savsr_tpu.train`) on a flagship-size synthetic corpus and
reports, parsed from the run's own log:

  - distinct scales drawn / training programs built
  - compile/AOT amortization wall (time spent before each new program's
    first step, split compiled vs AOT-loaded)
  - steady-state samples/s over the trailing segment where no new
    program appeared (vs the scale-pinned rate in PERF.md)

Variants:
  --bucket        run with train: bucket_train: true / bucket_mult 64
                  (the 60-entry pool collapses to ~9 HR canvases)
  --curriculum    epoch-0 init_int_scale (x2/x3/x4 only) as shipped
  --iters N       segment length (default 300)

Usage:
  python scripts/multiscale_bench.py --root /tmp/msbench --iters 300
  python scripts/multiscale_bench.py --root /tmp/msbench --bucket
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def write_yml(root: str, iters: int, bucket: bool, curriculum: bool,
              batch: int, accum: int, name: str, pool: int = 0) -> str:
    bucket_block = ""
    if bucket:
        bucket_block = "  bucket_train: true\n  bucket_mult: 64\n"
    pool_block = ""
    if pool:
        # evenly-strided subsample of the 60-entry pool (keeps the sym/asym
        # mix): the exact variant's cold compile wall is n_programs x
        # per-compile, so a stated reduced pool measures the same
        # per-program amortization at bounded wall-clock — PERF.md reports
        # the extrapolation to the full pool explicitly
        from savsr_tpu.data.vimeo90k_dataset import SCALE_H_LIST, SCALE_W_LIST

        idx = [round(i * (len(SCALE_H_LIST) - 1) / (pool - 1))
               for i in range(pool)] if pool > 1 else [0]
        sh = [SCALE_H_LIST[i] for i in idx]
        sw = [SCALE_W_LIST[i] for i in idx]
        pool_block = (f"    scale_h_list: {sh}\n"
                      f"    scale_w_list: {sw}\n")
    yml = f"""
name: {name}
model_type: ASVSRModel
num_gpu: 1
manual_seed: 114514

datasets:
  train:
    name: SynthVimeo
    type: ASVimeo90KDataset
    dataroot_gt: {root}/data/train/sequences
    dataroot_lq: {root}/data/train/sequences
    meta_info_file: {root}/data/train/meta_info.txt
    io_backend:
      type: disk

    num_frame: 7
    lq_size: 60
    downsample_mode: torch
    init_int_scale: {str(curriculum).lower()}
    single_scale_ft: false
{pool_block}    gt_size: 256
    interval_list: [1]
    random_reverse: true
    use_hflip: true
    use_rot: true
    flip_sequence: false

    num_worker_per_gpu: 4
    batch_size_per_gpu: {batch}
    dataset_enlarge_ratio: 100
    prefetch_mode: ~

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
  osconv_impl: taps
  remat_train: false

path:
  pretrain_network_g: ~
  strict_load_g: true
  resume_state: ~

train:
  ema_decay: 0.999
  bf16: true
  accum_steps: {accum}
{bucket_block}  aot_cache: true
  optim_g:
    type: Adam
    lr: !!float 2e-4
    weight_decay: 0
    betas: [ 0.9, 0.999 ]

  scheduler:
    type: CosineAnnealingRestartLR
    periods: [ {iters} ]
    restart_weights: [ 1 ]
    eta_min: !!float 1e-7

  total_iter: {iters}
  warmup_iter: -1

  pixel_opt:
    type: CharbonnierLoss
    loss_weight: 1.0
    reduction: mean

val:
  val_freq: !!float 1e9
  save_img: false
  metrics:
    psnr_y:
      type: calculate_psnr
      crop_border: 0
      test_y_channel: true

logger:
  print_freq: 1
  save_checkpoint_freq: !!float 1e9
  use_tb_logger: false
  wandb:
    project: ~
    resume_id: ~

dist_params:
  port: 29500
"""
    path = os.path.join(root, f"{name}.yml")
    with open(path, "w") as f:
        f.write(yml)
    return path


TS = re.compile(r"^(\d{4}-\d\d-\d\d \d\d:\d\d:\d\d),(\d\d\d)")
ITER = re.compile(r"iter:\s*([\d,]+),")
# `eval AOT executable: {'source': 'compiled', ..., 'lower_s': X,
#  'compile_s': Y}` / `{'source': 'aot-cache', ..., 'load_s': Z}`
COMPILED = re.compile(r"'source': 'compiled'.*?'compile_s': ([\d.]+)")
LOADED = re.compile(r"'source': 'aot-cache'.*?'load_s': ([\d.]+)")
LOWER = re.compile(r"'lower_s': ([\d.]+)")


def _ts(line):
    m = TS.match(line)
    if not m:
        return None
    import datetime as dt

    t = dt.datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S")
    return t.timestamp() + int(m.group(2)) / 1e3


def parse_log(log_path: str, batch: int) -> dict:
    """Programs built, amortization wall, steady-state samples/s."""
    iters = []  # (wall_ts, iter_number)
    compiles, loads, lowers = [], [], []
    with open(log_path) as f:
        for line in f:
            if "AOT executable" not in line:
                m = ITER.search(line)
                ts = _ts(line)
                if m and ts is not None:
                    iters.append((ts, int(m.group(1).replace(",", ""))))
                continue
            ts = _ts(line)
            m = COMPILED.search(line)
            if m:
                compiles.append((ts, float(m.group(1))))
            m = LOADED.search(line)
            if m:
                loads.append((ts, float(m.group(1))))
            m = LOWER.search(line)
            if m:
                lowers.append(float(m.group(1)))

    out = {
        "programs_compiled": len(compiles),
        "programs_aot_loaded": len(loads),
        "compile_wall_s": round(sum(c for _, c in compiles), 1),
        "aot_load_wall_s": round(sum(c for _, c in loads), 1),
        "trace_lower_wall_s": round(sum(lowers), 1),
    }
    if iters:
        out["iters_logged"] = iters[-1][1]
        out["total_wall_s"] = round(iters[-1][0] - iters[0][0], 1)
        # steady state: trailing window after the LAST new program appeared
        last_new = max([t for t, _ in compiles + loads if t is not None],
                       default=None)
        tail = [(t, i) for t, i in iters
                if last_new is None or t > last_new]
        if len(tail) >= 10:
            dt_w = tail[-1][0] - tail[0][0]
            di = tail[-1][1] - tail[0][1]
            if dt_w > 0 and di > 0:
                out["steady_samples_per_s"] = round(di * batch / dt_w, 2)
                out["steady_iters"] = di
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--bucket", action="store_true")
    ap.add_argument("--curriculum", action="store_true")
    ap.add_argument("--n_train", type=int, default=60)
    ap.add_argument("--pool", type=int, default=0, metavar="N",
                    help="evenly-strided N-entry subsample of the 60-entry "
                         "scale pool (0 = full pool); bounds the exact "
                         "variant's cold-compile wall")
    ap.add_argument("--parse_only", default=None,
                    help="skip the run; parse this existing train log")
    args = ap.parse_args()

    root = os.path.abspath(args.root)
    os.makedirs(root, exist_ok=True)
    name = "msbench_" + ("bucket" if args.bucket else "exact") + (
        "_cl" if args.curriculum else "") + (
        f"_p{args.pool}" if args.pool else "")

    if args.parse_only:
        stats = parse_log(args.parse_only, args.batch)
        print(json.dumps({"variant": name, **stats}, indent=1))
        return 0

    meta = os.path.join(root, "data/train/meta_info.txt")
    if not os.path.exists(meta):
        from scripts.data_preparation.synthetic_corpus import write_train_corpus

        print("generating flagship-patch corpus ...", flush=True)
        # lq 60 x max_scale 4 = 240 patch -> 256x288 GT frames
        write_train_corpus(os.path.join(root, "data/train"),
                           args.n_train, h=256, w=288)

    yml = write_yml(root, args.iters, args.bucket, args.curriculum,
                    args.batch, args.accum, name, pool=args.pool)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    print(f"running {args.iters}-iter segment ({name}) ...", flush=True)
    subprocess.run([sys.executable, "-m", "savsr_tpu.train", "-opt", yml],
                   cwd=root, env=env, check=True)

    log_dir = os.path.join(root, "experiments", name)
    logs = sorted(
        (os.path.join(log_dir, f) for f in os.listdir(log_dir)
         if f.startswith("train_") and f.endswith(".log")),
        key=os.path.getmtime)
    stats = parse_log(logs[-1], args.batch)
    print(json.dumps({"variant": name, **stats}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
