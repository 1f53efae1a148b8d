"""Learning signal test: a tiny SAVSR trained on a tiny synthetic dataset
reduces its Charbonnier loss substantially within a few dozen steps."""

import numpy as np
import pytest

from savsr_tpu.archs.savsr_arch import SAVSR, frame_sample_indices


def test_frame_sample_indices_interval_semantics():
    """Interval subsampling of forward/backward streams
    (reference savsr_arch.py:638-659)."""
    # interval 0: both streams are the full window
    f, b = frame_sample_indices(7, 0)
    assert f == b == list(range(7))
    # 9 frames, interval 1, even center 4
    f, b = frame_sample_indices(9, 1)
    assert f == [1, 3, 4, 5, 7]
    assert b == [0, 2, 4, 6, 8]
    # 11 frames, interval 1, odd center 5
    f, b = frame_sample_indices(11, 1)
    assert f == [0, 2, 4, 5, 6, 8, 10]
    assert b == [0, 1, 3, 5, 7, 9, 10]
    assert len(f) == len(b)


def test_tiny_savsr_loss_decreases():
    import jax
    import jax.numpy as jnp
    import optax

    from savsr_tpu.models.base_model import split_params

    model = SAVSR(
        num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
        interval=0, w1_num_block=1, w2_num_block=1, n_resgroups=1, n_resblocks=1,
    )
    params = model.init(jax.random.PRNGKey(0))
    trainable, stats = split_params(params)
    optimizer = optax.adam(2e-4)
    opt_state = optimizer.init(trainable)

    # synthetic panning video: gt 24x24, lq 12x12 (x2)
    rng = np.random.default_rng(0)
    import cv2

    canvas = cv2.GaussianBlur((rng.random((40, 64, 3)) * 255).astype(np.uint8), (7, 7), 2)
    canvas = canvas.astype(np.float32) / 255.0

    def make_batch(step):
        gts = []
        for b in range(2):
            x0 = (step * 2 + b * 7) % 30
            frames = [canvas[8 : 8 + 24, x0 + t : x0 + t + 24] for t in range(7)]
            gts.append(np.stack(frames))
        gt = np.stack(gts)  # [2,7,24,24,3]
        from savsr_tpu.data.resize import resize_np

        lq = resize_np(gt, (12, 12), mode="torch")
        return jnp.asarray(lq), jnp.asarray(gt[:, 3])

    def loss_fn(tr, st, lq, gt):
        sr, su = model.apply({**tr, **st}, lq, (2.0, 2.0), train=True)
        return jnp.sqrt((sr - gt) ** 2 + 1e-12).mean(), su

    @jax.jit
    def step_fn(tr, st, os_, lq, gt):
        (loss, su), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr, st, lq, gt)
        updates, os2 = optimizer.update(grads, os_, tr)
        tr = jax.tree_util.tree_map(lambda p, u: p + u, tr, updates)
        return tr, {**st, **su}, os2, loss

    losses = []
    for i in range(30):
        lq, gt = make_batch(i)
        trainable, stats, opt_state, loss = step_fn(trainable, stats, opt_state, lq, gt)
        losses.append(float(loss))
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert late < 0.7 * early, (early, late)
