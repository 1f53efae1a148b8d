"""Load the reference (torch) eval pipeline as a numerical oracle.

Mirrors tools/gen_goldens.py's stub approach: individual reference modules
are loaded from /root/reference with the missing torchvision surface stubbed
(T.Resize(BICUBIC, antialias=True) on float tensors delegates to
F.interpolate, which is exactly what torchvision does for tensor inputs).
No reference code is copied — it is *executed* to produce expected values.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import torch
import torch.nn.functional as F

REF = os.environ.get("SAVSR_REFERENCE", "/root/reference")


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _Resize:
    """torchvision.transforms.Resize stand-in for float tensors: bicubic +
    antialias via F.interpolate (torchvision's own tensor path)."""

    def __init__(self, size, interpolation=None, antialias=True):
        self.size = size
        self.antialias = bool(antialias)

    def __call__(self, x):
        return F.interpolate(
            x, size=tuple(self.size), mode="bicubic",
            antialias=self.antialias, align_corners=False,
        )


def load_reference_pipeline():
    """Returns a namespace with the reference modules needed to run the
    ASVideoTestDataset -> ASVSRModel eval chain: savsr_arch, data_util,
    transforms, img_util, psnr_ssim."""
    if not os.path.isdir(os.path.join(REF, "lbasicsr")):
        return None

    import torch.nn as nn

    saved_modules = dict(sys.modules)

    def make_layer(basic_block, num_basic_block, **kwarg):
        return nn.Sequential(*[basic_block(**kwarg) for _ in range(num_basic_block)])

    class _Reg:
        def register(self, obj=None, suffix=None):
            return obj if obj is not None else (lambda o: o)

    # torchvision surface used by the chain
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv_t.Resize = _Resize
    tv_t.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    tv_u = types.ModuleType("torchvision.utils")
    tv_u.make_grid = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("make_grid not available in the oracle harness")
    )
    tv.transforms = tv_t
    tv.utils = tv_u
    sys.modules.update({
        "torchvision": tv,
        "torchvision.transforms": tv_t,
        "torchvision.utils": tv_u,
    })

    # lbasicsr package skeleton
    mods = {}
    for name in [
        "lbasicsr", "lbasicsr.archs", "lbasicsr.archs.arch_util",
        "lbasicsr.data", "lbasicsr.metrics", "lbasicsr.metrics.runtime",
        "lbasicsr.utils", "lbasicsr.utils.registry",
    ]:
        m = types.ModuleType(name)
        m.__path__ = []
        mods[name] = m
    mods["lbasicsr.archs.arch_util"].make_layer = make_layer
    mods["lbasicsr.metrics.runtime"].VSR_runtime_test = lambda *a, **k: None
    reg = _Reg()
    for attr in ["ARCH_REGISTRY", "MODEL_REGISTRY", "DATASET_REGISTRY",
                 "LOSS_REGISTRY", "METRIC_REGISTRY"]:
        setattr(mods["lbasicsr.utils.registry"], attr, reg)
    sys.modules.update(mods)

    lb = os.path.join(REF, "lbasicsr")
    color = _load_module(os.path.join(lb, "utils/color_util.py"), "lbasicsr.utils.color_util")
    img_util = _load_module(os.path.join(lb, "utils/img_util.py"), "lbasicsr.utils.img_util")
    u = sys.modules["lbasicsr.utils"]
    u.bgr2ycbcr = color.bgr2ycbcr
    u.img2tensor = img_util.img2tensor
    u.tensor2img = img_util.tensor2img
    u.imwrite = img_util.imwrite
    u.scandir = lambda *a, **k: iter(())
    u.get_root_logger = lambda *a, **k: types.SimpleNamespace(
        info=lambda *aa, **kk: None, warning=lambda *aa, **kk: None
    )

    metric_util = _load_module(os.path.join(lb, "metrics/metric_util.py"), "lbasicsr.metrics.metric_util")
    psnr_ssim = _load_module(os.path.join(lb, "metrics/psnr_ssim.py"), "lbasicsr.metrics.psnr_ssim")
    sys.modules["lbasicsr.metrics"].psnr_ssim = psnr_ssim
    transforms = _load_module(os.path.join(lb, "data/transforms.py"), "lbasicsr.data.transforms")
    core = _load_module(os.path.join(lb, "data/core.py"), "lbasicsr.data.core")
    data_util = _load_module(os.path.join(lb, "data/data_util.py"), "lbasicsr.data.data_util")
    arch = _load_module(os.path.join(lb, "archs/savsr_arch.py"), "ref_savsr_arch_chain")

    ns = types.SimpleNamespace(
        arch=arch, data_util=data_util, transforms=transforms,
        img_util=img_util, psnr_ssim=psnr_ssim, core=core, Resize=_Resize,
    )

    # restore the module table so the oracle can't leak into savsr_tpu
    for k in list(sys.modules):
        if k not in saved_modules:
            del sys.modules[k]
    sys.modules.update(saved_modules)
    return ns


def reference_eval_chain(ns, gt_root, scale, state_dict, num_frame=7,
                         padding="reflection", metric_util=None):
    """Run the reference eval pipeline exactly as test.py does for the
    Vid4 asBI configs (cache_data=True):

    per folder (video_test_dataset.py:98-105): read GT frames with
    as_mod_crop; per center frame (ASVideoTestDataset.__getitem__:304-310):
    window indices -> asBI downsample (mode='torch') -> model forward
    (asvsr_model.py:54-60) -> BI post-process when shapes differ
    (sr_model.py:291-304) -> tensor2img uint8 (img_util.py:38) -> Y-channel
    PSNR/SSIM with crop_border=0 (psnr_ssim.py) -> per-folder mean, then mean
    over folders (video_base_model.py:150-170).
    """
    import cv2
    import numpy as np

    model = ns.arch.SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
    )
    model.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()})
    model.eval()
    model.set_scale(scale)

    folder_means = {}
    for folder in sorted(os.listdir(gt_root)):
        fdir = os.path.join(gt_root, folder)
        paths = sorted(
            os.path.join(fdir, p) for p in os.listdir(fdir) if p.endswith(".png")
        )
        gts = ns.data_util.read_img_seq(paths, require_as_mod_crop=True, scale=scale)
        n = gts.shape[0]
        psnrs, ssims = [], []
        for idx in range(n):
            sel = ns.data_util.generate_frame_indices(idx, n, num_frame, padding=padding)
            lq = ns.data_util.arbitrary_scale_downsample(
                gts.index_select(0, torch.LongTensor(sel)), scale=scale, mode="torch"
            )
            gt = gts[idx]
            with torch.no_grad():
                out = model(lq.unsqueeze(0))
            if out.shape[-2:] != gt.shape[-2:]:
                out = ns.Resize(size=gt.shape[-2:], antialias=True)(out)
            sr_img = ns.img_util.tensor2img([out])
            gt_img = ns.img_util.tensor2img([gt])
            psnrs.append(ns.psnr_ssim.calculate_psnr(
                sr_img, gt_img, crop_border=0, test_y_channel=True))
            ssims.append(ns.psnr_ssim.calculate_ssim(
                sr_img, gt_img, crop_border=0, test_y_channel=True))
        folder_means[folder] = (float(np.mean(psnrs)), float(np.mean(ssims)))

    import numpy as np
    psnr = float(np.mean([v[0] for v in folder_means.values()]))
    ssim = float(np.mean([v[1] for v in folder_means.values()]))
    return psnr, ssim, folder_means
