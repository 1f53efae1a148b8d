"""Inference CLI (savsr_tpu.inference): LR frames -> SR frames with no GT,
through the real argparse surface."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # compiles a (tiny) serving graph


@pytest.fixture(scope="module")
def clip_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("infer_world")
    d = root / "clipA"
    d.mkdir()
    rng = np.random.default_rng(0)
    img = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
    for i in range(5):
        cv2.imwrite(str(d / f"{i:08d}.png"), np.roll(img, i, axis=1))
    return root


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax

    from savsr_tpu.inference import build_serving_model

    tiny = dict(num_feat=16, w1_num_block=2, w2_num_block=1,
                n_resgroups=1, n_resblocks=2)
    model = build_serving_model("strict", tiny)
    params = model.init(jax.random.PRNGKey(3))
    path = tmp_path_factory.mktemp("ckpt") / "net_g.npz"
    np.savez(path, **{f"params/{k}": np.asarray(v) for k, v in params.items()})
    return str(path), tiny


def _tiny_yml(tmp_path, tiny):
    cfg = tmp_path / "net.yml"
    lines = "\n".join(f"  {k}: {v}" for k, v in tiny.items())
    cfg.write_text(f"network_g:\n  type: SAVSR\n{lines}\n")
    return str(cfg)


def test_inference_cli_writes_sr_frames(clip_dir, tiny_ckpt, tmp_path):
    import cv2

    from savsr_tpu.inference import main

    ckpt, tiny = tiny_ckpt
    out = tmp_path / "out"
    rc = main([
        "-i", str(clip_dir / "clipA"), "-o", str(out), "-s", "2",
        "-w", ckpt, "--opt", _tiny_yml(tmp_path, tiny),
        "--tier", "strict", "--no_aot",
    ])
    assert rc == 0
    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 5
    sr = cv2.imread(str(pngs[0]))
    assert sr.shape == (40, 48, 3)  # x2 of 20x24


def test_inference_cli_multi_clip_asymmetric(clip_dir, tiny_ckpt, tmp_path):
    import cv2

    from savsr_tpu.inference import main

    ckpt, tiny = tiny_ckpt
    out = tmp_path / "out_multi"
    # input root contains clip subfolders -> per-clip output dirs; an
    # asymmetric fractional scale exercises get_HW rounding
    rc = main([
        "-i", str(clip_dir), "-o", str(out), "-s", "1.5", "2.5",
        "-w", ckpt, "--opt", _tiny_yml(tmp_path, tiny),
        "--tier", "strict", "--no_aot",
    ])
    assert rc == 0
    pngs = sorted((out).glob("*.png"))  # single clip -> flat output
    assert len(pngs) == 5
    sr = cv2.imread(str(pngs[0]))
    assert sr.shape == (30, 60, 3)  # round(20*1.5), round(24*2.5)


def test_inference_cli_chunked_dispatch_parity(clip_dir, tiny_ckpt, tmp_path):
    """The pipelined scan-of-N dispatch (with remainder padding and
    device-side uint8/BGR conversion) must write bit-identical PNGs to
    per-frame dispatch (--windows 1)."""
    from savsr_tpu.inference import main

    ckpt, tiny = tiny_ckpt
    outs = {}
    for n in (1, 2):  # 5 frames at N=2 exercises the padded last chunk
        out = tmp_path / f"out_n{n}"
        rc = main([
            "-i", str(clip_dir / "clipA"), "-o", str(out), "-s", "2",
            "-w", ckpt, "--opt", _tiny_yml(tmp_path, tiny),
            "--tier", "strict", "--no_aot", "--windows", str(n),
        ])
        assert rc == 0
        outs[n] = {p.name: p.read_bytes() for p in out.glob("*.png")}
    assert len(outs[1]) == 5
    assert outs[1] == outs[2]


def test_inference_cli_rejects_mismatched_checkpoint(clip_dir, tiny_ckpt, tmp_path):
    from savsr_tpu.inference import main

    ckpt, tiny = tiny_ckpt
    # flagship net vs tiny checkpoint: strict key check must fail loudly
    with pytest.raises(KeyError):
        main([
            "-i", str(clip_dir / "clipA"), "-o", str(tmp_path / "x"),
            "-s", "2", "-w", ckpt, "--tier", "strict", "--no_aot",
        ])
