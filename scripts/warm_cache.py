"""Pre-compile the eval programs for a test config (compile-cache warming).

On this environment TPU compiles go through a remote compiler (~40-60s per
(input shape, scale) program); a full 42-scale Vid4 sweep touches up to
~170 programs. This tool compiles them ahead of time into the persistent
JAX compilation cache (set JAX_COMPILATION_CACHE_DIR) so the actual eval
run is compute-bound.

Usage:
    python scripts/warm_cache.py -opt options/test/SAVSR/test_SAVSR_Vid4_asBI.yml \
        [--shapes 120x180 100x170 ...]

Without --shapes, the GT folders referenced by the config are scanned and
the as_mod_cropped LR shapes are derived per (clip, scale).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.abspath(osp.join(__file__, "..", "..")))

import jax
import jax.numpy as jnp
import numpy as np

from savsr_tpu.archs import build_network
from savsr_tpu.data.transforms import as_mod_crop
from savsr_tpu.utils.img_util import imread
from savsr_tpu.utils.misc import scandir
from savsr_tpu.utils.options import yaml_load


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--shapes", nargs="*", default=None,
                        help="explicit LR shapes HxW (skip folder scanning)")
    parser.add_argument("--num-frame", type=int, default=7)
    parser.add_argument("--workers", type=int, default=4,
                        help="concurrent compiles (XLA/remote compilation "
                             "releases the GIL, so threads overlap)")
    args = parser.parse_args()

    opt = yaml_load(args.opt)
    net = build_network(opt["network_g"])
    params = net.init(jax.random.PRNGKey(0))

    jobs = []  # (lr_h, lr_w, scale)
    if args.shapes:
        for ds in opt["datasets"].values():
            scale = ds.get("downsampling_scale", (4, 4))
            for s in args.shapes:
                h, w = map(int, s.split("x"))
                jobs.append((h, w, tuple(scale)))
    else:
        shape_cache = {}
        for ds in opt["datasets"].values():
            scale = tuple(ds.get("downsampling_scale", (4, 4)))
            gt_root = ds["dataroot_gt"]
            if not osp.isdir(gt_root):
                print(f"skip {ds['name']}: {gt_root} missing")
                continue
            import os

            for folder in sorted(os.listdir(gt_root)):
                fdir = osp.join(gt_root, folder)
                if not osp.isdir(fdir):
                    continue
                if fdir not in shape_cache:
                    first = sorted(scandir(fdir, full_path=True))[0]
                    shape_cache[fdir] = imread(first).shape[:2]
                h, w = shape_cache[fdir]
                cropped = as_mod_crop(np.zeros((h, w, 3), np.uint8), scale).shape[:2]
                jobs.append((round(cropped[0] / scale[0]), round(cropped[1] / scale[1]), scale))

    jobs = sorted(set(jobs))
    print(f"{len(jobs)} unique (shape, scale) programs to compile "
          f"({args.workers} workers)")
    t_all = time.time()

    def compile_one(job):
        i, (h, w, scale) = job
        x = jax.ShapeDtypeStruct((1, args.num_frame, h, w, 3), jnp.float32)

        @jax.jit
        def fwd(p, x, scale=scale):
            return net.apply(p, x, scale, train=False)[0]

        t0 = time.time()
        # AOT compile only (lower+compile populates the persistent cache;
        # no device execution, so workers don't contend for the chip)
        fwd.lower(params, x).compile()
        print(f"[{i + 1}/{len(jobs)}] ({h}x{w}, x{scale}) compiled in {time.time() - t0:.0f}s")

    if args.workers <= 1:
        for job in enumerate(jobs):
            compile_one(job)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.workers) as ex:
            list(ex.map(compile_one, enumerate(jobs)))
    print(f"total wall-clock {time.time() - t_all:.0f}s")


if __name__ == "__main__":
    main()
