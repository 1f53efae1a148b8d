"""Generate golden test fixtures from the reference PyTorch implementation.

Run once in an environment where /root/reference and torch are available:

    python tools/gen_goldens.py

The reference code is used strictly as a *numerical oracle* — its outputs on
random inputs are stored as .npz fixtures that the JAX implementation is
tested against. No reference code is copied into this repository.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REF = os.environ.get("SAVSR_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "..", "tests", "goldens")
os.makedirs(GOLDEN_DIR, exist_ok=True)


def _load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _install_lbasicsr_stubs():
    """Install the minimal module stubs savsr_arch.py imports, so the arch
    file can be loaded standalone (the full lbasicsr package needs
    torchvision, which this image does not ship)."""
    import torch.nn as nn

    def make_layer(basic_block, num_basic_block, **kwarg):
        return nn.Sequential(*[basic_block(**kwarg) for _ in range(num_basic_block)])

    class _Reg:
        def register(self, obj=None, suffix=None):
            if obj is None:
                return lambda o: o
            return obj

    mods = {}
    for name in [
        "lbasicsr",
        "lbasicsr.archs",
        "lbasicsr.archs.arch_util",
        "lbasicsr.metrics",
        "lbasicsr.metrics.runtime",
        "lbasicsr.utils",
        "lbasicsr.utils.registry",
    ]:
        m = types.ModuleType(name)
        m.__path__ = []
        mods[name] = m
    mods["lbasicsr.archs.arch_util"].make_layer = make_layer
    mods["lbasicsr.metrics.runtime"].VSR_runtime_test = lambda *a, **k: None
    reg = _Reg()
    for attr in ["ARCH_REGISTRY", "MODEL_REGISTRY", "DATASET_REGISTRY", "LOSS_REGISTRY", "METRIC_REGISTRY"]:
        setattr(mods["lbasicsr.utils.registry"], attr, reg)
    sys.modules.update(mods)


def gen_core_resize():
    import torch

    refcore = _load_module(os.path.join(REF, "lbasicsr/data/core.py"), "refcore")
    rng = np.random.default_rng(0)
    img = rng.random((100, 140, 3)).astype(np.float32)
    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    out = {"img": img}
    for size in [(50, 70), (40, 56), (26, 37), (150, 210)]:
        res = refcore.imresize(t, sizes=size)[0].numpy().transpose(1, 2, 0)
        out[f"out_{size[0]}_{size[1]}"] = res
    np.savez_compressed(os.path.join(GOLDEN_DIR, "core_resize.npz"), **out)
    print("core_resize.npz written")


def gen_metrics():
    sys.path.insert(0, os.path.join(HERE, ".."))
    # reference psnr_ssim imports the package; reimplement its callsites via
    # direct module load with stubs for registry/color deps
    import cv2  # noqa: F401

    _install_lbasicsr_stubs()
    color = _load_module(os.path.join(REF, "lbasicsr/utils/color_util.py"), "ref_color")
    sys.modules["lbasicsr.utils"].bgr2ycbcr = color.bgr2ycbcr
    sys.modules["lbasicsr.utils.color_util"] = color
    metric_util = _load_module(os.path.join(REF, "lbasicsr/metrics/metric_util.py"), "ref_metric_util")
    sys.modules["lbasicsr.metrics.metric_util"] = metric_util
    ref_ps = _load_module(os.path.join(REF, "lbasicsr/metrics/psnr_ssim.py"), "ref_psnr_ssim")

    rng = np.random.default_rng(7)
    img = (rng.random((96, 128, 3)) * 255).round().astype(np.uint8).astype(np.float64)
    noise = rng.normal(0, 8, img.shape)
    img2 = np.clip(img + noise, 0, 255).round().astype(np.float64)
    out = {
        "img": img,
        "img2": img2,
        "psnr": ref_ps.calculate_psnr(img, img2, crop_border=0),
        "psnr_y": ref_ps.calculate_psnr(img, img2, crop_border=0, test_y_channel=True),
        "ssim": ref_ps.calculate_ssim(img, img2, crop_border=0),
        "ssim_y": ref_ps.calculate_ssim(img, img2, crop_border=0, test_y_channel=True),
        "psnr_cb4": ref_ps.calculate_psnr(img, img2, crop_border=4),
    }
    np.savez_compressed(os.path.join(GOLDEN_DIR, "metrics.npz"), **out)
    print("metrics.npz written:", {k: v for k, v in out.items() if np.isscalar(v)})


def gen_savsr_forward():
    """Reference SAVSR forward on random weights/input at several scales,
    plus the state_dict, for end-to-end arch parity tests."""
    import torch

    _install_lbasicsr_stubs()
    ref_arch = _load_module(os.path.join(REF, "lbasicsr/archs/savsr_arch.py"), "ref_savsr")

    torch.manual_seed(1234)
    model = ref_arch.SAVSR(
        num_in_ch=3, num_feat=64, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=4, w2_num_block=2, n_resgroups=4, n_resblocks=8,
    )
    model.eval()

    rng = np.random.default_rng(42)
    x = rng.random((1, 7, 3, 18, 24)).astype(np.float32)
    xt = torch.from_numpy(x)

    out = {"x": x}
    for scale in [(2.0, 2.0), (4.0, 4.0), (1.5, 3.5), (3.05, 3.05)]:
        model.set_scale(scale)
        with torch.no_grad():
            y = model(xt).numpy()
        out[f"y_{scale[0]}_{scale[1]}"] = y
    np.savez_compressed(os.path.join(GOLDEN_DIR, "savsr_forward.npz"), **out)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(os.path.join(GOLDEN_DIR, "savsr_state_dict.npz"), **sd)
    print("savsr_forward.npz / savsr_state_dict.npz written,",
          len(sd), "state entries")


def gen_small_savsr():
    """A reduced SAVSR (16 feat, 2/1 blocks, 1 group) whose full forward
    compiles quickly on CPU — the fast end-to-end parity fixture."""
    import torch

    _install_lbasicsr_stubs()
    ref_arch = _load_module(os.path.join(REF, "lbasicsr/archs/savsr_arch.py"), "ref_savsr")

    torch.manual_seed(77)
    model = ref_arch.SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
    )
    model.eval()
    rng = np.random.default_rng(5)
    x = rng.random((2, 7, 3, 11, 14)).astype(np.float32)  # odd sizes: pad path
    xt = torch.from_numpy(x)
    out = {"x": x}
    for scale in [(2.0, 2.0), (1.5, 3.5)]:
        model.set_scale(scale)
        with torch.no_grad():
            out[f"y_{scale[0]}_{scale[1]}"] = model(xt).numpy()
    np.savez_compressed(os.path.join(GOLDEN_DIR, "savsr_small_forward.npz"), **out)
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "savsr_small_state.npz"),
        **{k: v.numpy() for k, v in model.state_dict().items()},
    )
    print("savsr_small goldens written")


def gen_module_goldens():
    """Per-module oracle outputs (OSConv2d, ScaleAttention, STAUpsample,
    WindowUnit_l1) with their state_dicts, for unit-level parity."""
    import torch

    _install_lbasicsr_stubs()
    ref_arch = _load_module(os.path.join(REF, "lbasicsr/archs/savsr_arch.py"), "ref_savsr")
    rng = np.random.default_rng(3)
    out = {}

    torch.manual_seed(7)
    osconv = ref_arch.OSConv2d(16, 24, kernel_size=3, stride=1, padding=1)
    osconv.eval()
    x = rng.random((2, 16, 12, 14)).astype(np.float32)
    with torch.no_grad():
        y = osconv(torch.from_numpy(x), (2.7, 1.3)).numpy()
    out["osconv_x"] = x
    out["osconv_y"] = y
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "osconv_state.npz"),
        **{k: v.numpy() for k, v in osconv.state_dict().items()},
    )

    torch.manual_seed(8)
    stau = ref_arch.STAUpsample(32)
    stau.eval()
    xs = rng.random((2, 32, 10, 12)).astype(np.float32)
    st = rng.random((2, 32, 10, 12)).astype(np.float32)
    with torch.no_grad():
        ys = stau(torch.from_numpy(xs), (2.5, 1.7), torch.from_numpy(st)).numpy()
    out["stau_x"] = xs
    out["stau_st"] = st
    out["stau_y"] = ys
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "stau_state.npz"),
        **{k: v.numpy() for k, v in stau.state_dict().items()},
    )

    torch.manual_seed(9)
    w1 = ref_arch.WindowUnit_l1(3, 32, win_size=3, num_block=2)
    w1.eval()
    xw = rng.random((2, 3, 3, 12, 14)).astype(np.float32)
    hp = rng.random((2, 32, 12, 14)).astype(np.float32)
    with torch.no_grad():
        yw = w1(torch.from_numpy(xw), torch.from_numpy(hp), (1.9, 3.1)).numpy()
    out["w1_x"] = xw
    out["w1_h"] = hp
    out["w1_y"] = yw
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "w1_state.npz"),
        **{k: v.numpy() for k, v in w1.state_dict().items()},
    )

    np.savez_compressed(os.path.join(GOLDEN_DIR, "module_io.npz"), **out)
    print("module goldens written")


def gen_gradient_golden():
    """Charbonnier-loss gradients of the small reference SAVSR on a fixed
    batch — the training-parity gate (SURVEY.md §7 step 5)."""
    import torch

    _install_lbasicsr_stubs()
    ref_arch = _load_module(os.path.join(REF, "lbasicsr/archs/savsr_arch.py"), "ref_savsr")

    torch.manual_seed(77)
    model = ref_arch.SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
    )
    model.train()

    rng = np.random.default_rng(11)
    lq = rng.random((2, 7, 3, 12, 12)).astype(np.float32)
    gt = rng.random((2, 3, 24, 24)).astype(np.float32)
    model.set_scale((2.0, 2.0))

    out = model(torch.from_numpy(lq))
    loss = torch.sqrt((out - torch.from_numpy(gt)) ** 2 + 1e-12).mean()
    loss.backward()

    grads = {
        name: p.grad.numpy() for name, p in model.named_parameters() if p.grad is not None
    }
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "savsr_small_grads.npz"),
        lq=lq, gt=gt, loss=loss.item(), **{f"g/{k}": v for k, v in grads.items()},
    )
    print(f"gradient golden written: loss={loss.item():.6f}, {len(grads)} grads")


def gen_trajectory_golden(steps: int = 6):
    """Multi-step lockstep training trajectory of the reference trainer on
    fixed batches: Adam (lr 2e-4, betas (0.9, 0.999)) + EMA(0.999) + BN
    running-stat updates, exactly the reference optimize_parameters order
    (sr_model.py:101-128 — zero_grad, forward, Charbonnier, backward, step,
    model_ema; base_model.py:75-82 EMA over named_parameters only).

    Golden layout (savsr_small_trajectory.npz):
      lq[steps,...], gt[steps,...]         fixed NTCHW batches
      loss[steps]                          per-step Charbonnier loss
      t{t}/p/<key>, t{t}/e/<key>           tracked params / EMA per step
      t{t}/b/<key>                         ALL buffers (BN stats) per step
      final/p/<key>, final/e/<key>         FULL state after the last step
    """
    import torch

    _install_lbasicsr_stubs()
    ref_arch = _load_module(os.path.join(REF, "lbasicsr/archs/savsr_arch.py"), "ref_savsr")

    torch.manual_seed(77)
    model = ref_arch.SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
    )
    model.train()
    model.set_scale((2.0, 2.0))

    opt = torch.optim.Adam(model.parameters(), lr=2e-4, betas=(0.9, 0.999),
                           weight_decay=0, eps=1e-8)
    ema = {k: p.detach().clone() for k, p in model.named_parameters()}

    rng = np.random.default_rng(21)
    lq = rng.random((steps, 2, 7, 3, 12, 12)).astype(np.float32)
    gt = rng.random((steps, 2, 3, 24, 24)).astype(np.float32)

    # track a spread of parameter tensors (every 12th name) — enough to
    # catch per-step drift; the final step stores everything
    pnames = [k for k, _ in model.named_parameters()]
    tracked = pnames[::12]

    out = {"lq": lq, "gt": gt}
    losses = []
    for t in range(steps):
        opt.zero_grad()
        sr = model(torch.from_numpy(lq[t]))
        loss = torch.sqrt((sr - torch.from_numpy(gt[t])) ** 2 + 1e-12).mean()
        loss.backward()
        opt.step()
        with torch.no_grad():
            for k, p in model.named_parameters():
                ema[k].mul_(0.999).add_(p.detach(), alpha=1 - 0.999)
        losses.append(loss.item())
        pd = dict(model.named_parameters())
        for k in tracked:
            out[f"t{t}/p/{k}"] = pd[k].detach().numpy().copy()
            out[f"t{t}/e/{k}"] = ema[k].numpy().copy()
        for k, b in model.named_buffers():
            out[f"t{t}/b/{k}"] = b.detach().numpy().copy()
    out["loss"] = np.asarray(losses, np.float32)
    for k, v in model.state_dict().items():
        out[f"final/p/{k}"] = v.numpy().copy()
    for k, v in ema.items():
        out[f"final/e/{k}"] = v.numpy().copy()
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "savsr_small_trajectory.npz"), **out)
    print(f"trajectory golden written: {steps} steps, losses={losses}")


if __name__ == "__main__":
    gen_core_resize()
    gen_metrics()
    gen_module_goldens()
    gen_small_savsr()
    gen_gradient_golden()
    gen_trajectory_golden()
    gen_savsr_forward()
