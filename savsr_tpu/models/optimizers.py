"""ASGD and Rprop as optax-style gradient transformations.

Completes the 7-type optimizer factory of the reference
(lbasicsr/models/base_model.py:107-124: Adam, AdamW, Adamax, SGD, ASGD,
RMSprop, Rprop). Semantics match ``torch.optim.ASGD`` / ``torch.optim.Rprop``
step-for-step (pinned by toy-problem tests vs torch in
tests/test_optimizers.py).

Both optimizers consume the learning rate *inside* the transform — Rprop
uses lr only to initialize its per-element step sizes, and ASGD's effective
step ``eta`` decays as ``lr / (1 + lambd*lr*t)^alpha`` — so unlike the
Adam-family chains (which end in scale(-1) and are multiplied by the
scheduled lr in the train step) these return final updates; the factory
marks them ``self_scaled`` and the train step skips its lr multiply.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RpropState(NamedTuple):
    step_size: optax.Updates  # per-element adaptive step, init = lr
    prev_grad: optax.Updates  # previous (post-zeroing) gradient


def scale_by_rprop(
    lr: float = 1e-2,
    etas: tuple[float, float] = (0.5, 1.2),
    step_sizes: tuple[float, float] = (1e-6, 50.0),
) -> optax.GradientTransformation:
    """Resilient backpropagation (torch.optim.Rprop semantics).

    Per element: compare the sign of the current gradient with the previous
    one; on agreement grow the step by ``eta_plus``, on a sign flip shrink it
    by ``eta_minus`` AND suppress the update this step (the flipped gradient
    is zeroed, which also makes the next comparison neutral). The returned
    update is ``-sign(g) * step_size`` — final, no external lr scaling.
    """
    eta_minus, eta_plus = etas
    step_min, step_max = step_sizes

    def init_fn(params):
        return RpropState(
            step_size=jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, lr, dtype=jnp.float32), params
            ),
            prev_grad=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), params
            ),
        )

    def update_fn(updates, state, params=None):
        del params

        def per_leaf(g, prev, step):
            g = g.astype(jnp.float32)
            agree = jnp.sign(g * prev)
            factor = jnp.where(agree > 0, eta_plus, jnp.where(agree < 0, eta_minus, 1.0))
            new_step = jnp.clip(step * factor, step_min, step_max)
            g_eff = jnp.where(agree < 0, 0.0, g)
            upd = -jnp.sign(g_eff) * new_step
            return upd, new_step, g_eff

        flat = jax.tree_util.tree_map(
            per_leaf, updates, state.prev_grad, state.step_size
        )
        upd = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        new_step = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        g_eff = jax.tree_util.tree_map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
        return upd, RpropState(step_size=new_step, prev_grad=g_eff)

    return optax.GradientTransformation(init_fn, update_fn)


class ASGDState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    eta: jnp.ndarray   # scalar f32 effective lr for the NEXT update
    mu: jnp.ndarray    # scalar f32 averaging coefficient for the NEXT update
    ax: optax.Updates  # the Polyak/Ruppert averaged parameters


def scale_by_asgd(
    lr: float = 1e-2,
    lambd: float = 1e-4,
    alpha: float = 0.75,
    t0: float = 1e6,
) -> optax.GradientTransformation:
    """Averaged SGD (torch.optim.ASGD semantics).

    The live parameters follow decayed SGD — update
    ``-lambd*eta*p - eta*g`` with ``eta`` decaying as
    ``lr / (1 + lambd*lr*t)^alpha`` — while ``state.ax`` accumulates the
    running average that kicks in after ``t0`` steps (``mu = 1/max(1, t-t0)``;
    before that ``mu == 1`` so ``ax`` tracks the live params exactly, as in
    torch). Weight decay, if any, must be chained in front (L2-in-grad).
    Returns final updates — no external lr scaling.
    """

    def init_fn(params):
        return ASGDState(
            step=jnp.zeros([], jnp.int32),
            eta=jnp.asarray(lr, jnp.float32),
            mu=jnp.asarray(1.0, jnp.float32),
            ax=jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params),
        )

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("scale_by_asgd requires params.")
        step = state.step + 1
        eta, mu = state.eta, state.mu
        upd = jax.tree_util.tree_map(
            lambda g, p: -(lambd * eta) * p - eta * g, updates, params
        )
        new_p = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        ax = jax.tree_util.tree_map(
            lambda a, p: a + (p - a) * mu, state.ax, new_p
        )
        stepf = step.astype(jnp.float32)
        new_eta = lr / (1.0 + lambd * lr * stepf) ** alpha
        new_mu = 1.0 / jnp.maximum(1.0, stepf - t0)
        return upd, ASGDState(step=step, eta=new_eta, mu=new_mu, ax=ax)

    return optax.GradientTransformation(init_fn, update_fn)
