"""Two-process distributed TRAINING: multihost batch assembly, gradient
all-reduce via shardings, rank-0-only checkpoint write — the production
``ASVSRModel.feed_data -> optimize_parameters`` path under real process
boundaries (the reference's DDP training, lbasicsr/models/base_model.py:
96-102 + train.py:167-237), exercised on local CPU processes via
``jax.distributed`` without a cluster (SURVEY.md §4 consequence (d))."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy  # multiprocess mesh + training-graph compile: heavy tier

WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
# the shared persistent compile cache may hold entries compiled on a
# machine with different CPU features (the remote compile helper); a hit
# then aborts with a machine-feature mismatch — keep workers cache-free
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
workdir = sys.argv[3]
import numpy as np

rank = jax.process_index()
assert jax.process_count() == 2
assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

from savsr_tpu.models import build_model

opt = {
    "name": "mp_train",
    "model_type": "ASVSRModel",
    "num_gpu": 2,
    "is_train": True,
    "dist": True,
    "rank": rank,
    "world_size": 2,
    "manual_seed": 0,
    "scale": (2.0, 2.0),
    "network_g": dict(
        type="SAVSR", num_in_ch=3, num_feat=16, num_frame=7, slid_win=3,
        fusion_win=5, interval=0, w1_num_block=2, w2_num_block=1,
        n_resgroups=1, n_resblocks=2,
    ),
    "path": {
        "pretrain_network_g": None,
        "strict_load_g": True,
        "models": os.path.join(workdir, "models"),
        "training_states": os.path.join(workdir, "training_states"),
    },
    "train": {
        "ema_decay": 0.999,
        "optim_g": {"type": "Adam", "lr": 2e-4, "weight_decay": 0,
                    "betas": [0.9, 0.999]},
        "scheduler": {"type": "CosineAnnealingRestartLR", "periods": [10, 10],
                      "restart_weights": [1, 0.5], "eta_min": 1e-7},
        "total_iter": 20,
        "warmup_iter": -1,
        "pixel_opt": {"type": "CharbonnierLoss", "loss_weight": 1.0,
                      "reduction": "mean"},
    },
    "datasets": {},
}
os.makedirs(opt["path"]["models"], exist_ok=True)
os.makedirs(opt["path"]["training_states"], exist_ok=True)

model = build_model(opt)

# multihost batch assembly: each process contributes ONE local sample
# (batch_size_per_gpu=1), the global batch is 2 — rank-DIFFERENT data, so
# equal losses across ranks prove the gradient all-reduce really merged
# both shards (they would diverge immediately otherwise).
losses = []
for step in (1, 2):
    rng = np.random.default_rng(100 * step + rank)
    batch = {
        "lq": rng.random((1, 7, 12, 12, 3), dtype=np.float32),
        "gt": rng.random((1, 24, 24, 3), dtype=np.float32),
        "scale": (2.0, 2.0),
    }
    model.update_learning_rate(step)
    model.feed_data(batch)
    assert model.lq.shape == (2, 7, 12, 12, 3), model.lq.shape  # global batch
    model.optimize_parameters(step)
    losses.append(model.log_dict["l_total"])
assert all(np.isfinite(losses)), losses

# rank-0-gated checkpoint write (reference base_model.py:211-256)
model.save(epoch=0, current_iter=2)

# cross-process sync AFTER the checkpoint write, then exit WITHOUT
# jax.distributed.shutdown(): the shutdown barrier is the flaky part on
# loaded 1-core hosts (a rank that reaches it seconds late trips
# DEADLINE_EXCEEDED and the coordination service kills the peer mid-save,
# observed under pytest). The sync guarantees neither rank tears down the
# process group while the other still runs; teardown itself is not the
# system under test. A watchdog turns a sync deadlock into a visible
# missing-ok failure instead of a 10-minute hang.
import threading
threading.Timer(120.0, lambda: os._exit(0)).start()
from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("post_save")
print(json.dumps({"rank": rank, "ok": True, "losses": losses}), flush=True)
os._exit(0)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROC"), reason="skipped by env")
def test_two_process_training_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    workdir = tmp_path / "exp"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    # conftest exports the shared persistent compile cache; entries in it
    # may have been compiled on a machine with different CPU features (the
    # remote compile helper) and a hit then aborts the worker with a
    # machine-feature-mismatch deserialization error — run cache-free
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), str(workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        # the evidence is the ok-JSON + checkpoint below; jax.distributed
        # teardown on CPU/Gloo is racy (shutdown-barrier timeouts when the
        # peer exits first) and is not the system under test — but a worker
        # that died BEFORE printing its result is a real failure
        if '"ok": true' not in out:
            assert p.returncode == 0, err[-3000:]
        outs.append(out)
    assert all('"ok": true' in o for o in outs), outs

    # both ranks saw the same globally-reduced losses
    import json

    recs = {}
    for o in outs:
        line = [ln for ln in o.strip().splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        recs[rec["rank"]] = rec["losses"]
    assert recs[0] == pytest.approx(recs[1], abs=1e-6), recs

    # checkpoint + training state written exactly once (by rank 0)
    assert (workdir / "models" / "net_g_2.npz").is_file()
    assert (workdir / "training_states" / "2.state").is_file()
