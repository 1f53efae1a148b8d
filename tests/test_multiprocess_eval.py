"""Two-process distributed eval: frame-strided sharding + cross-process
metric reduction, on local CPU processes via jax.distributed.

This is the multi-host analogue of the reference's rank-strided validation
with dist.reduce (video_base_model.py:50,108-113), exercised without a
cluster (SURVEY.md §4 consequence (d))."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multiprocess mesh: heavy tier

WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import numpy as np
from jax.experimental import multihost_utils

rank = jax.process_index()
world = jax.process_count()
assert world == 2

# emulate VideoBaseModel.dist_validation bookkeeping: 10 frames, metric =
# frame index; each process fills its stride, then allgather-sum merges
num_frames = 10
partial = np.zeros((num_frames, 1), dtype=np.float64)
for idx in range(rank, num_frames, world):
    partial[idx, 0] = float(idx)

summed = np.asarray(multihost_utils.process_allgather(partial)).sum(axis=0)
expected = np.arange(num_frames, dtype=np.float64)[:, None]
assert np.allclose(summed, expected), (summed, expected)
print(json.dumps({"rank": rank, "ok": True, "mean": float(summed.mean())}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROC"), reason="skipped by env")
def test_two_process_metric_reduction(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    # the shared persistent cache may hold entries compiled on a machine
    # with different CPU features (remote compile helper); a hit aborts
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    assert all('"ok": true' in o for o in outs)
    # every frame counted exactly once: mean of 0..9 = 4.5
    assert all('"mean": 4.5' in o for o in outs)
