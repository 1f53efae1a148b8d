"""Training-gradient parity vs the reference (SURVEY.md §7 gate 5):
Charbonnier loss + backward through the small SAVSR on a fixed batch must
produce the same loss value and per-parameter gradients."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from savsr_tpu.archs.savsr_arch import SAVSR
from savsr_tpu.models.base_model import split_params
from savsr_tpu.utils.convert import convert_state_dict

pytestmark = pytest.mark.heavy  # training-graph compiles / multiprocess: heavy tier

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

SMALL_CFG = dict(
    num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
    interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
)


@pytest.mark.parametrize("remat", [False, True])
def test_gradient_parity(remat):
    grad_path = os.path.join(GOLDEN_DIR, "savsr_small_grads.npz")
    state_path = os.path.join(GOLDEN_DIR, "savsr_small_state.npz")
    if not (os.path.isfile(grad_path) and os.path.isfile(state_path)):
        pytest.skip("gradient goldens not generated")

    golden = np.load(grad_path)
    params = {
        k: jnp.asarray(v)
        for k, v in convert_state_dict(dict(np.load(state_path))).items()
    }
    lq = jnp.asarray(golden["lq"].transpose(0, 1, 3, 4, 2))  # NTCHW -> NTHWC
    gt = jnp.asarray(golden["gt"].transpose(0, 2, 3, 1))

    model = SAVSR(**SMALL_CFG, remat_train=remat)
    trainable, stats = split_params(params)

    def loss_fn(tr):
        sr, _ = model.apply({**tr, **stats}, lq, (2.0, 2.0), train=True)
        return jnp.sqrt((sr - gt) ** 2 + 1e-12).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(trainable)
    assert abs(float(loss) - float(golden["loss"])) < 1e-5

    ref_grads = convert_state_dict(
        {k[2:]: golden[k] for k in golden.files if k.startswith("g/")}
    )
    assert set(ref_grads.keys()) == set(grads.keys())
    worst_key, worst = None, 0.0
    for k, ref in ref_grads.items():
        ours = np.asarray(grads[k])
        scale = np.abs(ref).max() + 1e-6
        err = np.abs(ours - ref).max() / scale
        if err > worst:
            worst_key, worst = k, err
    assert worst < 2e-3, (worst_key, worst)


@pytest.mark.parametrize("impl", ["grouped", "batchgroup", "taps", "kpatch3", "pallas_train"])
def test_gradient_impl_agreement(impl):
    """Gradients through the alternative OSConv execution engines must match
    the einsum engine (identical math, different XLA formulations — the
    grouped form's native conv backward benches ~4% faster at the shipped
    recipe and is the train-YAML default)."""
    state_path = os.path.join(GOLDEN_DIR, "savsr_small_state.npz")
    if not os.path.isfile(state_path):
        pytest.skip("state golden not generated")
    params = {
        k: jnp.asarray(v)
        for k, v in convert_state_dict(dict(np.load(state_path))).items()
    }
    rng = np.random.default_rng(3)
    lq = jnp.asarray(rng.random((2, 7, 12, 12, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32))
    trainable, stats = split_params(params)

    def grads_for(impl_name):
        model = SAVSR(**SMALL_CFG, osconv_impl=impl_name, remat_train=False)

        def loss_fn(tr):
            sr, _ = model.apply({**tr, **stats}, lq, (2.0, 2.0), train=True)
            return jnp.sqrt((sr - gt) ** 2 + 1e-12).mean()

        return jax.jit(jax.value_and_grad(loss_fn))(trainable)

    l_ref, g_ref = grads_for("einsum")
    l_alt, g_alt = grads_for(impl)
    assert abs(float(l_ref) - float(l_alt)) < 1e-6
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_alt[k])
        # relative against the grad's own scale, with an absolute floor for
        # effectively-zero grads (dead routing biases at ~1e-10 are pure
        # reassociation noise)
        tol = max(1e-4 * np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() < tol, k


@pytest.mark.parametrize("remat", [False, True])
def test_train_loop_scan_equivalence(remat):
    """train_loop='scan' (alignment loop + trunk groups rolled into lax.scan
    with the chained BatchNorm running-stat updates threaded through the scan
    carry) must reproduce the unrolled training forward: same loss, same
    per-parameter gradients, same running-stat updates."""
    state_path = os.path.join(GOLDEN_DIR, "savsr_small_state.npz")
    if not os.path.isfile(state_path):
        pytest.skip("state golden not generated")
    params = {
        k: jnp.asarray(v)
        for k, v in convert_state_dict(dict(np.load(state_path))).items()
    }
    rng = np.random.default_rng(5)
    lq = jnp.asarray(rng.random((2, 7, 12, 12, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32))
    trainable, stats = split_params(params)

    def run(loop):
        model = SAVSR(**SMALL_CFG, osconv_impl="taps", remat_train=remat,
                      train_loop=loop)

        def loss_fn(tr):
            sr, ups = model.apply({**tr, **stats}, lq, (2.0, 2.0), train=True)
            return jnp.sqrt((sr - gt) ** 2 + 1e-12).mean(), ups

        (l, ups), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(trainable)
        return l, g, ups

    l_u, g_u, s_u = run("unroll")
    l_s, g_s, s_s = run("scan")
    assert abs(float(l_u) - float(l_s)) < 1e-6
    assert set(s_u) == set(s_s)
    for k in s_u:
        np.testing.assert_allclose(
            np.asarray(s_u[k]), np.asarray(s_s[k]), rtol=0, atol=1e-6, err_msg=k
        )
    for k in g_u:
        a, b = np.asarray(g_u[k]), np.asarray(g_s[k])
        tol = max(1e-4 * np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() < tol, k


def test_remat_stau_equivalence():
    """remat_stau (selective remat of ONLY the STAU upsampler segment, the
    measured HBM hotspot of the no-remat training step) must not change the
    step's math: same loss, gradients, and running-stat updates as the plain
    no-remat step — jax.checkpoint changes scheduling, not values."""
    state_path = os.path.join(GOLDEN_DIR, "savsr_small_state.npz")
    if not os.path.isfile(state_path):
        pytest.skip("state golden not generated")
    params = {
        k: jnp.asarray(v)
        for k, v in convert_state_dict(dict(np.load(state_path))).items()
    }
    rng = np.random.default_rng(7)
    lq = jnp.asarray(rng.random((2, 7, 12, 12, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32))
    trainable, stats = split_params(params)

    def run(**kw):
        model = SAVSR(**SMALL_CFG, osconv_impl="taps", remat_train=False, **kw)

        def loss_fn(tr):
            sr, ups = model.apply({**tr, **stats}, lq, (2.0, 2.0), train=True)
            return jnp.sqrt((sr - gt) ** 2 + 1e-12).mean(), ups

        (l, ups), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(trainable)
        return l, g, ups

    l0, g0, s0 = run()
    l1, g1, s1 = run(remat_stau=True)
    assert abs(float(l0) - float(l1)) < 1e-7
    assert set(s0) == set(s1)
    for k in s0:
        np.testing.assert_allclose(
            np.asarray(s0[k]), np.asarray(s1[k]), rtol=0, atol=1e-7, err_msg=k
        )
    for k in g0:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        tol = max(1e-5 * np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() < tol, k


def test_train_loop_scan_multigroup_stats():
    """Multi-group trunk scan: the per-group OSAdapt BN stat updates come out
    of the scan as stacked outputs and must scatter back to the right
    adapt.{i}.* keys (n_resgroups=2, fresh-init params)."""
    cfg = {**SMALL_CFG, "n_resgroups": 2, "w1_num_block": 1,
           "n_resblocks": 1}
    rng = np.random.default_rng(11)
    lq = jnp.asarray(rng.random((1, 7, 8, 8, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))

    def run(loop):
        model = SAVSR(**cfg, osconv_impl="taps", remat_train=False,
                      train_loop=loop)
        params = model.init(jax.random.PRNGKey(0))
        # perturb running stats so the chained-update arithmetic is visible
        params = {
            k: (v + 0.25 if k.endswith("running_mean") else v)
            for k, v in params.items()
        }
        trainable, stats = split_params(params)

        def loss_fn(tr):
            sr, ups = model.apply({**tr, **stats}, lq, (2.0, 2.0), train=True)
            return jnp.sqrt((sr - gt) ** 2 + 1e-12).mean(), ups

        (l, ups), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(trainable)
        return l, g, ups

    l_u, g_u, s_u = run("unroll")
    l_s, g_s, s_s = run("scan")
    assert abs(float(l_u) - float(l_s)) < 1e-6
    assert set(s_u) == set(s_s)
    assert any(k.startswith("adapt.1.") for k in s_u)  # multi-group coverage
    for k in s_u:
        np.testing.assert_allclose(
            np.asarray(s_u[k]), np.asarray(s_s[k]), rtol=0, atol=1e-6, err_msg=k
        )
    for k in g_u:
        a, b = np.asarray(g_u[k]), np.asarray(g_s[k])
        tol = max(1e-4 * np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() < tol, k
