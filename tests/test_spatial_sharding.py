"""2-D (data x spatial) mesh parity: SPMD-sharding the frame height must
not change the math — XLA inserts halo exchanges for the convs and
collectives for the cross-shard gathers (SURVEY.md §2.7; the TPU-native
answer to "serve frames larger than one chip").

Runs on the virtual 8-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from savsr_tpu.archs.savsr_arch import SAVSR

pytestmark = pytest.mark.heavy  # sharded training-graph compiles: heavy tier

CFG = dict(
    num_in_ch=3, num_feat=16, num_frame=7, slid_win=3, fusion_win=5,
    interval=0, w1_num_block=2, w2_num_block=1, n_resgroups=1, n_resblocks=2,
)


@pytest.mark.parametrize("spec", [
    P("data", None, "spatial"),
    P(None, None, "spatial"),
])
def test_spatial_sharded_eval_matches_replicated(spec):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "spatial"))
    model = SAVSR(**CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 7, 32, 36, 3), np.float32))

    fwd = jax.jit(lambda p, x: model.apply(p, x, (2.0, 2.0))[0])
    y_ref = np.asarray(fwd(params, x))

    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    x_sh = jax.device_put(x, NamedSharding(mesh, spec))
    y_sh = np.asarray(fwd(params_r, x_sh))

    assert np.abs(y_sh - y_ref).max() < 1e-5


def test_spatial_sharded_train_step():
    """One dp x sp training step compiles + runs, loss finite and equal to
    the replicated step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "spatial"))
    model = SAVSR(**CFG)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    lq = jnp.asarray(rng.random((2, 7, 16, 16, 3), np.float32))
    gt = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))

    from savsr_tpu.models.base_model import split_params

    trainable, stats = split_params(params)

    def loss_fn(tp, lq, gt):
        sr, _ = model.apply({**tp, **stats}, lq, (2.0, 2.0), train=True)
        return jnp.mean(jnp.abs(sr - gt))

    step = jax.jit(jax.value_and_grad(loss_fn))
    l_ref, g_ref = step(trainable, lq, gt)

    params_r = jax.device_put(trainable, NamedSharding(mesh, P()))
    lq_sh = jax.device_put(lq, NamedSharding(mesh, P("data", None, "spatial")))
    gt_sh = jax.device_put(gt, NamedSharding(mesh, P("data", "spatial")))
    l_sh, g_sh = step(params_r, lq_sh, gt_sh)

    assert np.isfinite(float(l_sh))
    assert abs(float(l_sh) - float(l_ref)) < 1e-5
    gmax = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sh)))
    assert gmax < 1e-4
