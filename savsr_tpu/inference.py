"""One-command SAVSR video upscaler: LR frames in -> SR frames out.

The missing user surface between the eval pipeline (``savsr_tpu.test``,
which needs GT for metrics) and the serving bench: point it at a folder
of frames (or a folder of clip subfolders), pick a scale — integer,
fractional, or asymmetric — and it writes upscaled PNGs. Counterpart of
the load-checkpoint-and-serve intent of the reference's test pipeline
(/root/reference/lbasicsr/test.py:11-47) without requiring GT or YAML.

Serving stack: CHW Pallas conv engine, frame-invariant STAU statics
computed once per (shape, scale), executable-level AOT disk cache
(utils/aot.py — a fresh process reaches its first frame in seconds), and
bench-grade dispatch: N frames per device round trip (lax.scan inside one
compiled program, ``--windows``), device-side uint8/BGR conversion,
transfer overlapped with compute, PNG encode on writer threads.
Precision tiers:

  bf16   (default) bf16 params/activations — the bench serving config,
         ~57 dB vs the f32 reference output on golden weights
  fast   f32 carries, native-bf16 MXU multiplies (~0.17 dB worst-case
         composed delta vs strict on the 42-block sweep; preview tier)
  split  convs as 3-pass bf16 hi/lo contractions with bf16 pair carries
         between convs (~2^-16 conv error — f32-grade quality at ~1.8x
         strict's speed; STAU head/samplers stay float32-precision)
  strict f32 with float32 matmul precision — reference-parity outputs

Usage:
  python -m savsr_tpu.inference -i lr_frames/ -o out/ -s 4 -w savsr.npz
  python -m savsr_tpu.inference -i clips_root/ -o out/ -s 1.5 3.5 \
      -w savsr_best.pth --tier strict
"""

from __future__ import annotations

import argparse
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .archs.savsr_arch import SAVSR
from .data.data_util import generate_frame_indices, paths_from_folder, read_img_seq
from .utils.img_util import imwrite
from .utils.logger import get_root_logger


def flagship_net_kwargs() -> dict:
    """The published SAVSR configuration (reference
    options/train/SAVSR/train_SAVSR_Vimeo90K_asBI.yml:98-110)."""
    return dict(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4,
        n_resblocks=8,
    )


def build_serving_model(tier: str, net_kwargs: dict | None = None) -> SAVSR:
    kwargs = flagship_net_kwargs()
    kwargs.update(net_kwargs or {})
    kwargs.setdefault("conv_engine", "chw")
    kwargs["matmul_precision"] = (
        "float32" if tier in ("strict", "split") else "default")
    # split: convs as 3-pass bf16 hi/lo contractions with pair carries
    # (~2^-16 conv error vs strict — chw_engine pair_split/_pair_out);
    # head/samplers stay f32
    kwargs["conv_precision"] = "split" if tier == "split" else "native"
    return SAVSR(**kwargs)


def load_params(model: SAVSR, path: str, tier: str, param_key: str = "params"):
    """Checkpoint (.npz native / .pth torch, via the importer) -> device
    params at the tier's dtype, with strict key checking."""
    import jax.numpy as jnp

    from .models.base_model import BaseModel

    loaded = BaseModel.load_network(None, path, param_key=param_key)
    init = model.init(__import__("jax").random.PRNGKey(0))
    missing = set(init) - set(loaded)
    extra = set(loaded) - set(init)
    if missing or extra:
        raise KeyError(
            f"checkpoint keys do not match the network: missing {sorted(missing)[:5]}"
            f"{'...' if len(missing) > 5 else ''}, extra {sorted(extra)[:5]}"
            f"{'...' if len(extra) > 5 else ''}"
        )
    dtype = jnp.bfloat16 if tier == "bf16" else jnp.float32
    params = {}
    for k, v in loaded.items():
        arr = jnp.asarray(v)
        params[k] = arr.astype(dtype) if arr.dtype == jnp.float32 else arr
    return params


def upscale_clip(model, params, frames: np.ndarray, scale, tier: str,
                 num_frame: int, padding: str, aot: bool, tag: str,
                 chunk: int = 8):
    """frames [T, H, W, C] float32 RGB in [0,1] -> yields [Hs, Ws, C] SR
    frames as uint8 BGR (cv2 layout), in order.

    Serving-grade dispatch: frames are processed ``chunk`` windows at a
    time inside ONE compiled program (a lax.scan — the same protocol the
    bench measures; each separate dispatch pays a host round trip), the
    float->uint8 quantization and RGB->BGR flip run on device (4x less
    device->host traffic than f32 frames), and the next chunk is
    dispatched before the previous chunk's pixels are fetched so transfer
    overlaps compute. One compiled program per (clip shape, scale, chunk).
    """
    import jax
    import jax.numpy as jnp

    from .utils.aot import compile_cached

    logger = get_root_logger()
    t_total, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    dtype = jnp.bfloat16 if tier == "bf16" else jnp.float32
    chunk = max(1, min(chunk, t_total))

    statics = jax.jit(
        model.stau_statics, static_argnames=("lq_hw", "scale", "dtype")
    )(params, lq_hw=(h, w), scale=scale, dtype=dtype)

    def fwd_chunk(params, statics, windows):
        # windows [chunk, 1, T, h, w, C] -> `chunk` separate [1, Hs, Ws, C]
        # uint8 BGR buffers. Separate outputs matter on relay/tunneled
        # deployments: device->host bandwidth there is per-stream limited
        # (measured ~12-22 MB/s single-stream vs ~30 MB/s with 4 parallel
        # streams on the axon tunnel), so the fetch pool below pulls the
        # frames concurrently. On a real TPU VM PCIe does ~GB/s and the
        # split costs nothing.
        def body(carry, window):
            sr, _ = model.apply(params, window, scale, train=False,
                                stau_statics=statics)
            # device-side equivalent of utils.img_util.array2img: clamp to
            # [0,1], *255, round-half-even, uint8; then RGB->BGR for cv2
            sr8 = jnp.round(
                jnp.clip(sr.astype(jnp.float32), 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
            return carry, sr8[..., ::-1]

        _, out = jax.lax.scan(body, jnp.int32(0), windows)
        return tuple(out[i] for i in range(out.shape[0]))

    windows0 = jnp.zeros((chunk, 1, num_frame, h, w, 3), dtype)
    if aot:
        fwd_c, info = compile_cached(fwd_chunk, (params, statics, windows0),
                                     tag=f"infer_{tag}_n{chunk}")
        logger.info(f"serving executable: {info['source']} "
                    f"({info.get('load_s', info.get('compile_s', 0))} s)")
    else:
        fwd_c = jax.jit(fwd_chunk)

    frames_dev = jnp.asarray(frames, dtype)
    indices = [
        generate_frame_indices(i, t_total, num_frame, padding=padding)
        for i in range(t_total)
    ]

    fetch_streams = max(1, int(os.environ.get("SAVSR_FETCH_STREAMS", 4)))
    fetch_pool = ThreadPoolExecutor(max_workers=fetch_streams,
                                    thread_name_prefix="savsr-fetch")

    def dispatch(c0):
        sel = indices[c0 : c0 + chunk]
        n_valid = len(sel)
        sel = sel + [sel[-1]] * (chunk - n_valid)  # pad; extras discarded
        windows = frames_dev[jnp.asarray(sel)][:, None]
        outs = fwd_c(params, statics, windows)
        for o in outs[:n_valid]:  # d2h starts as soon as compute finishes,
            if hasattr(o, "copy_to_host_async"):  # overlapping next chunk
                o.copy_to_host_async()
        return outs, n_valid

    t_dispatch = t_fetch = 0.0
    fetched_bytes = 0
    t_loop0 = time.perf_counter()  # post-compile: steady serving rate

    def materialize(pending):
        nonlocal t_fetch, fetched_bytes
        outs, n = pending
        t0 = time.perf_counter()
        # parallel streams: per-stream-limited links (relay tunnels) top
        # out ~2x higher with 4 concurrent fetches; PCIe doesn't care
        hosts = list(fetch_pool.map(np.asarray, outs[:n]))
        t_fetch += time.perf_counter() - t0
        fetched_bytes += sum(h.nbytes for h in hosts)
        return [h[0] for h in hosts]

    pending = None
    for c0 in range(0, t_total, chunk):
        t0 = time.perf_counter()
        nxt = dispatch(c0)  # async: device starts before we fetch `pending`
        t_dispatch += time.perf_counter() - t0
        if pending is not None:
            yield from materialize(pending)
        pending = nxt
    last = materialize(pending)
    fetch_pool.shutdown(wait=False)
    # log before the final yields: the consumer (zip) never resumes the
    # generator past its last item, so code after `yield` would be dead
    t_loop = time.perf_counter() - t_loop0
    logger.info(
        f"clip device loop: {t_total} frames in {t_loop:.2f} s "
        f"({t_total / max(t_loop, 1e-9):.2f} fps excl. startup); dispatch "
        f"{t_dispatch:.2f} s, fetch {t_fetch:.2f} s "
        f"({fetched_bytes / max(t_fetch, 1e-9) / 1e6:.0f} MB/s device->host), "
        f"{fetched_bytes / 1e6:.0f} MB fetched")
    yield from last


def discover_clips(input_dir: str) -> dict:
    """{clip_name: [frame paths]} — subfolders are clips; a flat folder of
    frames is one clip named after the folder."""
    subdirs = sorted(
        d for d in os.listdir(input_dir)
        if os.path.isdir(os.path.join(input_dir, d))
    )
    if subdirs:
        return {d: paths_from_folder(os.path.join(input_dir, d)) for d in subdirs}
    name = os.path.basename(os.path.normpath(input_dir)) or "clip"
    return {name: paths_from_folder(input_dir)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("-i", "--input", required=True,
                    help="folder of LR frames, or folder of clip subfolders")
    ap.add_argument("-o", "--output", required=True, help="output folder")
    ap.add_argument("-s", "--scale", type=float, nargs="+", required=True,
                    metavar="S", help="upscale factor: one value or H W")
    ap.add_argument("-w", "--weights", required=True,
                    help="checkpoint (.npz native or .pth torch)")
    ap.add_argument("--param_key", default="params",
                    help="checkpoint key (params | params_ema)")
    ap.add_argument("--tier", choices=("bf16", "fast", "split", "strict"),
                    default="bf16")
    ap.add_argument("--num_frame", type=int, default=7)
    ap.add_argument("--padding", default="reflection",
                    choices=("replicate", "reflection", "reflection_circle", "circle"))
    ap.add_argument("--no_aot", action="store_true",
                    help="skip the executable disk cache")
    ap.add_argument("--windows", type=int, default=8, metavar="N",
                    help="frames per device dispatch (scan-of-N inside one "
                         "compiled program; clamped to the clip length)")
    ap.add_argument("--ext", default="png", choices=("png", "bmp", "jpg"),
                    help="output image format (PNG encode costs ~70 ms per "
                         "720p frame per CPU core — on few-core hosts bmp "
                         "keeps disk IO off the critical path)")
    ap.add_argument("--opt", default=None,
                    help="options YAML whose network_g block overrides the "
                         "flagship architecture (type/strict-load keys ignored)")
    args = ap.parse_args(argv)

    if len(args.scale) > 2:
        ap.error("--scale takes one value or two (H W)")
    scale = (args.scale[0], args.scale[-1])

    net_kwargs = {}
    if args.opt:
        from .utils.options import yaml_load

        opt = yaml_load(args.opt)
        net_kwargs = {
            k: v for k, v in (opt.get("network_g") or {}).items()
            if k not in ("type", "strict_load_g") and v is not None
        }

    logger = get_root_logger()
    model = build_serving_model(args.tier, net_kwargs)
    params = load_params(model, args.weights, args.tier, args.param_key)

    clips = discover_clips(args.input)
    n_frames = sum(len(v) for v in clips.values())
    logger.info(f"{len(clips)} clip(s), {n_frames} frames -> x{scale[0]}x{scale[1]} "
                f"[tier={args.tier}]")

    t0 = time.perf_counter()
    done = 0
    # PNG encode runs off the dispatch thread: encoding a 720p frame costs
    # tens of ms on one core — serialized with the device loop it would cap
    # the CLI well below the device rate
    with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1),
                            thread_name_prefix="savsr-write") as writer:
        futures = []
        for clip, paths in clips.items():
            if not paths:
                logger.warning(f"{clip}: no frames found, skipping")
                continue
            frames = read_img_seq(paths)
            out_dir = (os.path.join(args.output, clip) if len(clips) > 1
                       else args.output)
            n_clip = 0
            for p, sr in zip(paths, upscale_clip(
                model, params, frames, scale, args.tier, args.num_frame,
                args.padding, aot=not args.no_aot,
                tag=f"{args.tier}_x{scale[0]}_{scale[1]}",
                chunk=args.windows,
            )):
                name = os.path.splitext(os.path.basename(p))[0]
                futures.append(writer.submit(
                    imwrite, sr, os.path.join(out_dir, f"{name}.{args.ext}")))
                n_clip += 1
            done += n_clip
            logger.info(f"{clip}: {n_clip} frames -> {out_dir}")
        for f in futures:
            f.result()  # surface write errors; also joins all IO
    wall = time.perf_counter() - t0
    logger.info(f"done: {done} frames in {wall:.1f} s ({done / max(wall, 1e-9):.2f} fps "
                f"incl. IO)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
