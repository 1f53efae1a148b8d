"""Synthetic video corpus for in-environment training/eval experiments.

Zero-egress stand-in for Vimeo90K/Vid4: procedurally generated scenes with
the statistics super-resolution training needs — sharp antialiased edges
(shapes drawn at 4x then area-reduced), smooth gradients, high-frequency
texture — moving with smooth subpixel global motion across frames. Random
noise would be unlearnable (no structure to restore); these sequences give
a model a real advantage over bicubic upsampling to demonstrate.

Used by scripts/quality_proof.py (the trained-vs-bicubic PSNR gate,
eval protocol mirroring reference lbasicsr/test.py:11-47) and
tests/test_quality_proof.py.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _draw_scene(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """One structured RGB scene in [0,1], float32 [h, w, 3].

    Drawn at 4x resolution and area-reduced so edges are sharp but
    antialiased (box-filtered), like photographic edges.
    """
    import cv2

    ss = 4  # supersampling factor
    hh, ww = h * ss, w * ss

    # smooth low-frequency background: mix of 2-D sinusoidal gradients
    yy, xx = np.mgrid[0:hh, 0:ww].astype(np.float32)
    img = np.zeros((hh, ww, 3), np.float32)
    for c in range(3):
        fy, fx = rng.uniform(0.5, 2.0, 2)
        ph_y, ph_x = rng.uniform(0, 2 * np.pi, 2)
        img[..., c] = 0.45 + 0.25 * np.sin(2 * np.pi * fy * yy / hh + ph_y) \
            * np.cos(2 * np.pi * fx * xx / ww + ph_x)

    # opaque shapes with sharp edges: rectangles, circles, lines
    n_shapes = int(rng.integers(8, 16))
    for _ in range(n_shapes):
        color = tuple(float(v) for v in rng.uniform(0.05, 0.95, 3))
        kind = rng.integers(0, 3)
        if kind == 0:
            x0, y0 = int(rng.integers(0, ww)), int(rng.integers(0, hh))
            x1 = x0 + int(rng.integers(ss * 4, ww // 2))
            y1 = y0 + int(rng.integers(ss * 4, hh // 2))
            cv2.rectangle(img, (x0, y0), (x1, y1), color, -1)
        elif kind == 1:
            c0 = (int(rng.integers(0, ww)), int(rng.integers(0, hh)))
            cv2.circle(img, c0, int(rng.integers(ss * 3, hh // 4)), color, -1)
        else:
            p0 = (int(rng.integers(0, ww)), int(rng.integers(0, hh)))
            p1 = (int(rng.integers(0, ww)), int(rng.integers(0, hh)))
            cv2.line(img, p0, p1, color, int(rng.integers(ss, 3 * ss)))

    # high-frequency texture regions (what bicubic destroys first).
    # Natural video is broadband — bicubic x4 on photographic content sits
    # at ~23-28 dB, and a learned model's advantage (multi-frame subpixel
    # fusion + structure priors) lives in exactly this band. A corpus of
    # mostly-smooth scenes gives bicubic 31-35 dB and nothing to win back,
    # so several oriented plaid/grating patches cover a large fraction of
    # the frame; frames shift subpixel, keeping the detail recoverable.
    n_tex = int(rng.integers(3, 6))
    for _ in range(n_tex):
        th = int(rng.integers(hh // 4, hh // 2))
        tw = int(rng.integers(ww // 4, ww // 2))
        ty = int(rng.integers(0, hh - th))
        tx = int(rng.integers(0, ww - tw))
        fy, fx = rng.uniform(0.03, 0.14, 2)  # cycles/supersampled-px
        ang = rng.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        py, px = np.mgrid[0:th, 0:tw].astype(np.float32)
        u = ca * py + sa * px
        v = -sa * py + ca * px
        tex = 0.5 + 0.45 * np.sin(2 * np.pi * fy * u) * np.sin(2 * np.pi * fx * v)
        a = rng.uniform(0.45, 0.7)
        img[ty:ty + th, tx:tx + tw] = (
            (1 - a) * img[ty:ty + th, tx:tx + tw] + a * tex[..., None])
    # one set of concentric rings (all orientations/frequencies at once —
    # the classic SR zone-plate probe)
    cy, cx = int(rng.integers(0, hh)), int(rng.integers(0, ww))
    rr = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    fr = rng.uniform(0.02, 0.06)
    rings = 0.5 + 0.45 * np.sin(2 * np.pi * fr * rr)
    mask = (rr < hh // 3).astype(np.float32) * 0.5
    img = img * (1 - mask[..., None]) + rings[..., None] * mask[..., None]

    img = np.clip(img, 0.0, 1.0)
    # area reduction: 4x supersampled -> target (antialiased sharp edges)
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)


def make_sequence(rng: np.random.Generator, h: int, w: int, t: int) -> np.ndarray:
    """[t, h, w, 3] float32 sequence: one scene under smooth subpixel
    global translation (cv2.warpAffine, bicubic resampling)."""
    import cv2

    pad = 16
    base = _draw_scene(rng, h + 2 * pad, w + 2 * pad)
    dy, dx = rng.uniform(-1.5, 1.5, 2)  # px/frame, subpixel
    frames = []
    for i in range(t):
        m = np.float32([[1, 0, -pad - dx * (i - t // 2)],
                        [0, 1, -pad - dy * (i - t // 2)]])
        f = cv2.warpAffine(base, m, (w, h), flags=cv2.INTER_CUBIC,
                           borderMode=cv2.BORDER_REFLECT_101)
        frames.append(np.clip(f, 0.0, 1.0))
    return np.stack(frames)


def write_train_corpus(root: str, n_seq: int, h: int = 160, w: int = 192,
                       t: int = 7, seed: int = 0) -> str:
    """Vimeo-style layout: root/sequences/00001/NNNN/im1..im{t}.png +
    meta_info txt. Returns the meta file path."""
    import cv2

    rng = np.random.default_rng(seed)
    seq_root = os.path.join(root, "sequences")
    keys = []
    for i in range(n_seq):
        key = f"00001/{i + 1:04d}"
        d = os.path.join(seq_root, key)
        os.makedirs(d, exist_ok=True)
        seq = make_sequence(rng, h, w, t)
        for j in range(t):
            bgr = (seq[j, :, :, ::-1] * 255.0).round().astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"im{j + 1}.png"), bgr)
        keys.append(key)
    meta = os.path.join(root, "meta_info.txt")
    with open(meta, "w") as f:
        f.write("".join(f"{k} {t} ({h},{w},3)\n" for k in keys))
    return meta


def write_eval_clips(root: str, n_clips: int, n_frames: int = 8,
                     h: int = 144, w: int = 180, seed: int = 100) -> str:
    """Vid4-style layout: root/GT/<clip>/000000NN.png. Held-out seed."""
    import cv2

    rng = np.random.default_rng(seed)
    gt_root = os.path.join(root, "GT")
    for i in range(n_clips):
        d = os.path.join(gt_root, f"clip{i:02d}")
        os.makedirs(d, exist_ok=True)
        seq = make_sequence(rng, h, w, n_frames)
        for j in range(n_frames):
            bgr = (seq[j, :, :, ::-1] * 255.0).round().astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{j:08d}.png"), bgr)
    return gt_root


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=200)
    ap.add_argument("--n_eval", type=int, default=3)
    ap.add_argument("--train_hw", type=int, nargs=2, default=(160, 192))
    ap.add_argument("--eval_hw", type=int, nargs=2, default=(144, 180))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    meta = write_train_corpus(
        os.path.join(args.root, "train"), args.n_train,
        h=args.train_hw[0], w=args.train_hw[1], seed=args.seed)
    gt = write_eval_clips(
        os.path.join(args.root, "eval"), args.n_eval,
        h=args.eval_hw[0], w=args.eval_hw[1], seed=args.seed + 100)
    print(f"train meta: {meta}\neval GT: {gt}")


if __name__ == "__main__":
    main()
