"""Loss-function parity vs the reference executed as a torch oracle:
LDL artifact map (lbasicsr/losses/loss_util.py:99-145) and StyleGAN2
path-length regularization (lbasicsr/losses/gan_loss.py:160-169)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = os.environ.get("SAVSR_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lbasicsr")),
    reason="reference checkout not available",
)


def _load(path, name, stubs=None):
    saved = dict(sys.modules)
    try:
        for modname, mod in (stubs or {}).items():
            sys.modules[modname] = mod
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.modules.clear()
        sys.modules.update(saved)


def _gan_loss_stubs():
    """lbasicsr.utils.registry stand-in: gan_loss only needs a decorator."""

    class _Reg:
        def register(self, *a, **k):
            return lambda obj: obj

    pkg = types.ModuleType("lbasicsr")
    utils = types.ModuleType("lbasicsr.utils")
    registry = types.ModuleType("lbasicsr.utils.registry")
    registry.LOSS_REGISTRY = _Reg()
    return {
        "lbasicsr": pkg,
        "lbasicsr.utils": utils,
        "lbasicsr.utils.registry": registry,
    }


def test_ldl_artifact_map_matches_reference():
    import torch

    from savsr_tpu.losses.loss_util import get_refined_artifact_map

    ref = _load(os.path.join(REF, "lbasicsr", "losses", "loss_util.py"),
                "ref_loss_util")

    rng = np.random.default_rng(0)
    gt = rng.random((2, 3, 24, 20), dtype=np.float32)
    out = (gt + 0.1 * rng.standard_normal(gt.shape)).astype(np.float32)
    ema = (gt + 0.1 * rng.standard_normal(gt.shape)).astype(np.float32)

    expected = ref.get_refined_artifact_map(
        torch.from_numpy(gt), torch.from_numpy(out), torch.from_numpy(ema), 7
    ).numpy()  # [B, 1, H, W]

    got = np.asarray(get_refined_artifact_map(
        gt.transpose(0, 2, 3, 1), out.transpose(0, 2, 3, 1),
        ema.transpose(0, 2, 3, 1), ksize=7,
    ))  # [B, H, W, 1]

    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), expected, rtol=1e-5, atol=1e-6
    )
    # the beats-EMA zero mask is load-bearing: some but not all pixels
    assert 0 < (got == 0).sum() < got.size


def test_g_path_regularize_matches_torch():
    import torch

    import jax.numpy as jnp
    from savsr_tpu.losses.gan_loss import g_path_regularize

    ref = _load(os.path.join(REF, "lbasicsr", "losses", "gan_loss.py"),
                "ref_gan_loss", stubs=_gan_loss_stubs())

    rng = np.random.default_rng(1)
    b, n_latent, d, c, h, w = 3, 2, 16, 3, 8, 10
    w1 = rng.standard_normal((n_latent * d, c * h * w)).astype(np.float32) * 0.3
    latents = rng.standard_normal((b, n_latent, d)).astype(np.float32)
    raw_noise = rng.standard_normal((b, c, h, w)).astype(np.float32)
    mean_path = 0.7

    # torch oracle: nonlinear generator, reference g_path_regularize with
    # the same noise (patch torch.randn_like for determinism)
    lat_t = torch.from_numpy(latents).requires_grad_(True)
    fake_t = torch.tanh(lat_t.reshape(b, -1) @ torch.from_numpy(w1)).reshape(b, c, h, w)
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda x: torch.from_numpy(raw_noise)
    try:
        pen_t, lens_t, mean_t = ref.g_path_regularize(fake_t, lat_t, mean_path)
    finally:
        torch.randn_like = orig_randn_like

    def gen_fn(lat):
        return jnp.tanh(lat.reshape(b, -1) @ jnp.asarray(w1)).reshape(b, c, h, w)

    pen_j, lens_j, mean_j = g_path_regularize(
        gen_fn, jnp.asarray(latents), mean_path, noise=jnp.asarray(raw_noise)
    )

    np.testing.assert_allclose(float(pen_j), float(pen_t), rtol=1e-5)
    np.testing.assert_allclose(float(lens_j), float(lens_t), rtol=1e-5)
    np.testing.assert_allclose(float(mean_j), float(mean_t), rtol=1e-5)


def test_g_path_regularize_differentiable():
    """The penalty must admit gradients w.r.t. generator params (the
    second-order use in the StyleGAN2 generator update)."""
    import jax
    import jax.numpy as jnp

    from savsr_tpu.losses.gan_loss import g_path_regularize

    rng = np.random.default_rng(2)
    b, n_latent, d, c, h, w = 2, 2, 8, 3, 6, 6
    w1 = jnp.asarray(rng.standard_normal((n_latent * d, c * h * w)),
                     dtype=jnp.float32) * 0.3
    latents = jnp.asarray(rng.standard_normal((b, n_latent, d)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((b, c, h, w)), jnp.float32)

    def loss(params):
        def gen_fn(lat):
            return jnp.tanh(lat.reshape(b, -1) @ params).reshape(b, c, h, w)

        pen, _, _ = g_path_regularize(gen_fn, latents, 0.0, noise=noise)
        return pen

    g = jax.grad(loss)(w1)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
