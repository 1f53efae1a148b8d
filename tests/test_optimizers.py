"""ASGD / Rprop parity vs torch.optim on toy problems, plus the LDL
artifact map vs the reference implementation (executed as an oracle).

Completes the reference's 7-type optimizer factory
(lbasicsr/models/base_model.py:107-124) and
get_refined_artifact_map (lbasicsr/losses/loss_util.py:99-145).
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from savsr_tpu.models.optimizers import scale_by_asgd, scale_by_rprop

REF = os.environ.get("SAVSR_REFERENCE", "/root/reference")


def _toy_problem(seed=0, n=6):
    """A small quadratic-ish objective: params {w, b}, loss = mean((Xw+b-y)^2)."""
    rng = np.random.RandomState(seed)
    X = rng.randn(16, n).astype(np.float32)
    y = rng.randn(16).astype(np.float32)
    w0 = rng.randn(n).astype(np.float32)
    b0 = rng.randn(1).astype(np.float32)
    return X, y, w0, b0


def _torch_trajectory(opt_ctor, steps, seed=0):
    X, y, w0, b0 = _toy_problem(seed)
    Xt, yt = torch.from_numpy(X), torch.from_numpy(y)
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    b = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = opt_ctor([w, b])
    traj = []
    for _ in range(steps):
        opt.zero_grad()
        loss = ((Xt @ w + b - yt) ** 2).mean()
        loss.backward()
        opt.step()
        traj.append((w.detach().numpy().copy(), b.detach().numpy().copy()))
    return traj


def _jax_trajectory(tx, steps, seed=0):
    X, y, w0, b0 = _toy_problem(seed)
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}

    def loss_fn(p):
        return jnp.mean((X @ p["w"] + p["b"] - y) ** 2)

    state = tx.init(params)
    traj = []
    grad_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(steps):
        g = grad_fn(params)
        upd, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        traj.append(jax.device_get(params))
    return traj, state


@pytest.mark.parametrize("lr", [1e-2, 0.05])
def test_rprop_matches_torch(lr):
    steps = 12
    ref = _torch_trajectory(
        lambda ps: torch.optim.Rprop(ps, lr=lr, etas=(0.5, 1.2), step_sizes=(1e-6, 50.0)),
        steps,
    )
    got, _ = _jax_trajectory(scale_by_rprop(lr=lr), steps)
    for t, ((rw, rb), gp) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(gp["w"], rw, rtol=1e-5, atol=1e-6, err_msg=f"step {t} w")
        np.testing.assert_allclose(gp["b"], rb, rtol=1e-5, atol=1e-6, err_msg=f"step {t} b")


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_asgd_matches_torch(wd):
    import optax

    steps = 12
    lr, lambd, alpha, t0 = 0.05, 1e-2, 0.75, 4  # small t0 so mu-averaging activates
    ref = _torch_trajectory(
        lambda ps: torch.optim.ASGD(ps, lr=lr, lambd=lambd, alpha=alpha, t0=t0,
                                    weight_decay=wd),
        steps,
    )
    chain = [optax.add_decayed_weights(wd)] if wd else []
    chain.append(scale_by_asgd(lr=lr, lambd=lambd, alpha=alpha, t0=t0))
    got, state = _jax_trajectory(optax.chain(*chain), steps)
    for t, ((rw, rb), gp) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(gp["w"], rw, rtol=1e-5, atol=1e-6, err_msg=f"step {t} w")
        np.testing.assert_allclose(gp["b"], rb, rtol=1e-5, atol=1e-6, err_msg=f"step {t} b")


def test_asgd_averaged_params_match_torch():
    """state.ax must equal torch's per-param 'ax' buffer (the actual ASGD
    deliverable: the Polyak average)."""
    steps, lr, t0 = 10, 0.05, 3
    X, y, w0, b0 = _toy_problem()
    Xt, yt = torch.from_numpy(X), torch.from_numpy(y)
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.ASGD([w], lr=lr, lambd=1e-2, t0=t0)
    for _ in range(steps):
        opt.zero_grad()
        ((Xt @ w - yt) ** 2).mean().backward()
        opt.step()
    ax_torch = opt.state[w]["ax"].numpy()

    tx = scale_by_asgd(lr=lr, lambd=1e-2, t0=t0)
    params = {"w": jnp.asarray(w0)}

    def loss_fn(p):
        return jnp.mean((X @ p["w"] - y) ** 2)

    state = tx.init(params)
    for _ in range(steps):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    inner = state if hasattr(state, "ax") else state[0]
    np.testing.assert_allclose(np.asarray(inner.ax["w"]), ax_torch, rtol=1e-5, atol=1e-6)


def test_factory_builds_asgd_rprop():
    """The model factory wires both new types and flags them self-scaled."""
    from savsr_tpu.models.base_model import BaseModel

    m = BaseModel.__new__(BaseModel)
    for typ in ("ASGD", "Rprop"):
        tx = m.get_optimizer(typ, lr=1e-3)
        assert m._opt_self_scaled
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        upd, _ = tx.update({"w": jnp.ones((3,))}, state, params)
        assert upd["w"].shape == (3,)
    m.get_optimizer("Adam", lr=1e-3)
    assert not m._opt_self_scaled


# --------------------------------------------------------------------- #
# LDL artifact map
# --------------------------------------------------------------------- #


def _load_ref_loss_util():
    path = os.path.join(REF, "lbasicsr", "losses", "loss_util.py")
    if not os.path.isfile(path):
        return None
    spec = importlib.util.spec_from_file_location("_ref_loss_util", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_loss_util"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("ksize", [5, 7])
def test_ldl_artifact_map_matches_reference(ksize):
    ref = _load_ref_loss_util()
    if ref is None:
        pytest.skip("reference checkout not available")
    from savsr_tpu.losses.loss_util import get_refined_artifact_map

    rng = np.random.RandomState(3)
    gt = rng.rand(2, 24, 20, 3).astype(np.float32)
    out = (gt + 0.1 * rng.randn(2, 24, 20, 3)).astype(np.float32)
    ema = (gt + 0.1 * rng.randn(2, 24, 20, 3)).astype(np.float32)

    def to_t(x):  # NHWC -> NCHW torch
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    want = ref.get_refined_artifact_map(to_t(gt), to_t(out), to_t(ema), ksize)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    got = np.asarray(get_refined_artifact_map(gt, out, ema, ksize))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
