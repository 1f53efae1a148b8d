"""NIQE: vectorized-rewrite parity against the reference implementation
(synthetic pristine parameters — the trained asset is not shipped by either
repo, so the MVG inputs are generated)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from savsr_tpu.metrics.niqe import calculate_niqe, fit_aggd, niqe_core

REFERENCE = "/root/reference"


def _load_reference_niqe():
    """Load the reference niqe module as a numerical oracle, stubbing its
    package-level imports (the reference package pulls torchvision, which is
    absent here)."""
    path = os.path.join(REFERENCE, "lbasicsr", "metrics", "niqe.py")
    if not os.path.isfile(path):
        pytest.skip("reference niqe.py unavailable")

    def load(name, relpath, pre_stubs=()):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REFERENCE, "lbasicsr", relpath)
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    class _Reg:
        def register(self, obj=None, **kw):
            return obj if obj is not None else (lambda f: f)

    saved = dict(sys.modules)
    try:
        utils_pkg = types.ModuleType("lbasicsr.utils")
        from savsr_tpu.utils.color_util import bgr2ycbcr

        utils_pkg.bgr2ycbcr = bgr2ycbcr
        sys.modules["lbasicsr"] = types.ModuleType("lbasicsr")
        sys.modules["lbasicsr.utils"] = utils_pkg
        reg = types.ModuleType("lbasicsr.utils.registry")
        reg.METRIC_REGISTRY = _Reg()
        sys.modules["lbasicsr.utils.registry"] = reg
        load("lbasicsr.utils.matlab_functions", "utils/matlab_functions.py")
        sys.modules["lbasicsr.metrics"] = types.ModuleType("lbasicsr.metrics")
        load("lbasicsr.metrics.metric_util", "metrics/metric_util.py")
        return load("lbasicsr.metrics.niqe", "metrics/niqe.py")
    finally:
        for k in list(sys.modules):
            if k.startswith("lbasicsr") and k not in saved:
                del sys.modules[k]


def _synthetic_pris(rng):
    """Plausible pristine MVG + the standard 7x7 Gaussian window."""
    mu = rng.normal(1.0, 0.3, size=36)
    a = rng.normal(size=(36, 36)) * 0.05
    cov = a @ a.T + np.eye(36) * 0.1
    x = np.arange(-3, 4, dtype=np.float64)
    g = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / (2 * (7 / 6) ** 2))
    return mu, cov, g / g.sum()


def test_fit_aggd_matches_reference_scalar_fit():
    estimate_aggd_param = _load_reference_niqe().estimate_aggd_param

    rng = np.random.default_rng(0)
    blocks = [
        rng.standard_t(df=4, size=(24, 24)) * 0.8,          # heavy-tailed
        rng.normal(size=(24, 24)),                           # gaussian
        np.abs(rng.normal(size=(24, 24))),                   # one-sided
        rng.normal(size=(24, 24)) * 0.01 - 0.5,              # shifted
    ]
    flat = np.stack([b.reshape(-1) for b in blocks])
    a_v, bl_v, br_v = fit_aggd(flat)
    for i, b in enumerate(blocks):
        a_r, bl_r, br_r = estimate_aggd_param(b)
        assert abs(a_v[i] - a_r) < 1e-3 + 1e-6, (i, a_v[i], a_r)
        np.testing.assert_allclose(bl_v[i], bl_r, rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(br_v[i], br_r, rtol=1e-6, atol=1e-12)


def test_niqe_core_matches_reference(tmp_path):
    reference_niqe = _load_reference_niqe().niqe

    rng = np.random.default_rng(1)
    mu, cov, window = _synthetic_pris(rng)
    # natural-ish image: smooth base + texture + edges, 2x2 blocks of 96
    yy, xx = np.mgrid[0:192, 0:192]
    img = (
        96 + 64 * np.sin(yy / 23.0) * np.cos(xx / 17.0)
        + 24 * rng.normal(size=(192, 192))
        + 32 * (xx > 96)
    ).clip(0, 255).round()

    ours = niqe_core(img.astype(np.float64), mu, cov, window)
    theirs = float(reference_niqe(img.astype(np.float64), mu, cov, window))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_calculate_niqe_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    mu, cov, window = _synthetic_pris(rng)
    path = tmp_path / "pris.npz"
    np.savez(
        path, mu_pris_param=mu, cov_pris_param=cov, gaussian_window=window
    )
    img = (rng.random((128, 128, 3)) * 255).astype(np.float32)
    v = calculate_niqe(img, crop_border=8, pris_params_path=str(path))
    assert np.isfinite(v) and v >= 0

    with pytest.raises(FileNotFoundError):
        calculate_niqe(img, crop_border=0, pris_params_path=str(tmp_path / "nope.npz"))
