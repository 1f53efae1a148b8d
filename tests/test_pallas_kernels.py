"""Pallas kernel semantics, validated in TPU-interpret mode on CPU.

Real-hardware validation runs in bench/eval on the TPU chip; these tests
pin the kernel math against the XLA reference formulation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _inputs(B=2, H=20, W=24, CIN=64, COUT=48, K=8, kk=3, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.random((B, H, W, CIN), dtype=np.float32)),
        jnp.asarray(rng.random((K, kk, kk, CIN, COUT), dtype=np.float32) * 0.05),
        jnp.asarray(rng.random((B, CIN), dtype=np.float32)),
        jnp.asarray(rng.random((B, COUT), dtype=np.float32)),
        jnp.asarray(rng.random((B, kk, kk), dtype=np.float32)),
        jnp.asarray(rng.random((B, K), dtype=np.float32)),
    )


def test_osconv_fused_matches_reference():
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused

    args = _inputs()
    with pltpu.force_tpu_interpret_mode():
        y = osconv_fused(*args, 1)
    ref = _reference_math(*args, 1)
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4


def test_osconv_fused_nonsquare_odd_sizes():
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused

    args = _inputs(B=1, H=11, W=17, CIN=16, COUT=16, K=4)
    with pltpu.force_tpu_interpret_mode():
        y = osconv_fused(*args, 1)
    ref = _reference_math(*args, 1)
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4


def test_osconv_fused_gradients():
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused

    x, w, ca, fa, sa, ka = _inputs(B=1, H=8, W=10, CIN=16, COUT=16, K=2)

    def loss_fused(x, w):
        return osconv_fused(x, w, ca, fa, sa, ka, 1).sum()

    def loss_ref(x, w):
        return _reference_math(x, w, ca, fa, sa, ka, 1).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4
