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


def _natural_image(rng, h=192, w=192, seed_phase=0.0):
    """Smooth structure + texture + edges — a stand-in 'natural' image."""
    import cv2

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = (
        110
        + 60 * np.sin(yy / 19.0 + seed_phase) * np.cos(xx / 29.0)
        + 30 * (((xx + yy) // 48) % 2)
    )
    texture = cv2.GaussianBlur(rng.normal(size=(h, w)), (0, 0), 1.2) * 40
    return (base + texture).clip(0, 255)


def test_fit_pris_params_synthetic_corpus(tmp_path):
    """scripts/fit_niqe_pris_params.py path: fit the pristine MVG from a
    synthetic corpus, then verify the fitted asset (a) plugs into
    calculate_niqe, and (b) orders quality correctly — a heavily degraded
    image scores farther from the pristine model than a corpus-like one."""
    from savsr_tpu.metrics.niqe import fit_pris_params, niqe_core

    rng = np.random.default_rng(7)
    corpus = [_natural_image(rng, seed_phase=i * 0.7) for i in range(6)]
    pris = fit_pris_params(corpus)
    assert pris["mu_pris_param"].shape == (36,)
    assert pris["cov_pris_param"].shape == (36, 36)
    assert np.isfinite(pris["mu_pris_param"]).all()
    # covariance must be symmetric PSD-ish (fit over real feature rows)
    np.testing.assert_allclose(
        pris["cov_pris_param"], pris["cov_pris_param"].T, atol=1e-10
    )

    clean = _natural_image(rng, seed_phase=9.9)
    import cv2

    degraded = cv2.GaussianBlur(clean, (0, 0), 4.0) + rng.normal(
        scale=30.0, size=clean.shape
    )
    degraded = degraded.clip(0, 255)

    d_clean = niqe_core(clean.round(), pris["mu_pris_param"],
                        pris["cov_pris_param"], pris["gaussian_window"])
    d_bad = niqe_core(degraded.round(), pris["mu_pris_param"],
                      pris["cov_pris_param"], pris["gaussian_window"])
    assert np.isfinite(d_clean) and np.isfinite(d_bad)
    assert d_bad > d_clean, (d_clean, d_bad)

    # the npz round-trips through the calculate_niqe asset path
    path = tmp_path / "fitted_pris.npz"
    np.savez(path, **pris)
    img_bgr = np.repeat(clean[..., None], 3, axis=2).astype(np.float32)
    v = calculate_niqe(img_bgr, crop_border=0, pris_params_path=str(path))
    assert np.isfinite(v)


def test_fit_niqe_cli(tmp_path):
    """The fitting script end-to-end on a folder of PNGs."""
    import subprocess
    import sys as _sys

    import cv2

    rng = np.random.default_rng(11)
    src = tmp_path / "pristine"
    src.mkdir()
    for i in range(3):
        img = _natural_image(rng, seed_phase=i * 1.3)
        cv2.imwrite(str(src / f"im{i}.png"),
                    np.repeat(img[..., None], 3, axis=2).astype(np.uint8))
    out = tmp_path / "pris.npz"
    ret = subprocess.run(
        [_sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "fit_niqe_pris_params.py"),
         "--input", str(src), "--output", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert ret.returncode == 0, ret.stderr + ret.stdout
    pris = np.load(out)
    assert pris["mu_pris_param"].shape == (36,)
    assert pris["gaussian_window"].shape == (7, 7)


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
