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


def test_osconv_agg_train_forward_and_gradients():
    """The trainable fused path (Pallas fwd + Pallas bwd: transpose-conv dx
    through the forward kernel, slab-streaming dagg kernel) must match the
    einsum engine's value and gradients at the per-sample-weight level."""
    from savsr_tpu.ops.osconv import osconv_apply_einsum
    from savsr_tpu.ops.pallas.osconv_kernel import osconv_agg_train

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 13, 10, 48), dtype=np.float32))
    agg = jnp.asarray(rng.random((2, 3, 3, 48, 32), dtype=np.float32) * 0.1)
    cot = jnp.asarray(rng.random((2, 13, 10, 32), dtype=np.float32))

    def loss_fused(x, agg):
        return (osconv_agg_train(x, agg, 1) * cot).sum()

    def loss_ref(x, agg):
        return (osconv_apply_einsum(x, agg, 1, 1) * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        y = osconv_agg_train(x, agg, 1)
        l1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, agg)
    ref = osconv_apply_einsum(x, agg, 1, 1)
    l2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, agg)
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-4
    assert abs(float(l1) - float(l2)) < 1e-2 * max(1.0, abs(float(l2)))
    for a, b in zip(g1, g2):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4 * scale


def test_osconv_agg_train_padding0_gradients():
    """padding=0 drives the transpose-conv dx at pad'=kh-1 (full correlation)
    through the generalized forward kernel."""
    from savsr_tpu.ops.osconv import osconv_apply_einsum
    from savsr_tpu.ops.pallas.osconv_kernel import osconv_agg_train

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1, 10, 12, 16), dtype=np.float32))
    agg = jnp.asarray(rng.random((1, 3, 3, 16, 8), dtype=np.float32) * 0.1)

    def loss_fused(x, agg):
        return osconv_agg_train(x, agg, 0).sum()

    def loss_ref(x, agg):
        return osconv_apply_einsum(x, agg, 1, 0).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=(0, 1))(x, agg)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, agg)
    for a, b in zip(g1, g2):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4 * scale


def test_osconv_fused_train_all_gradients():
    """osconv_fused_train: gradients through the attention fold (weight bank
    + all four attentions) and the activations match the reference math."""
    from savsr_tpu.ops.pallas.osconv_kernel import _reference_math, osconv_fused_train

    args = _inputs(B=1, H=9, W=11, CIN=16, COUT=16, K=2, seed=5)

    def loss_fused(*a):
        return osconv_fused_train(*a, 1).sum()

    def loss_ref(*a):
        return _reference_math(*a, 1).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a, b in zip(g1, g2):
        scale = max(np.abs(np.asarray(b)).max(), 1.0)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 2e-4 * scale
