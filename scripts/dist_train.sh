#!/usr/bin/env bash
# Multi-host training launcher (role of the reference dist_train.sh).
#
# On TPU pods, run this once per host (e.g. via `gcloud compute tpus tpu-vm
# ssh --worker=all`); jax.distributed auto-discovers the pod topology, and
# each host drives all of its local chips — there is no per-device process
# spawning (the DDP/torchrun model does not apply).
#
# Usage: ./scripts/dist_train.sh <config.yml> [extra args...]
#   COORDINATOR=<host:port> NUM_PROCESSES=<n> PROCESS_ID=<i> for manual
#   (non-TPU-pod) multi-host setups.

set -euo pipefail

CONFIG=${1:?"usage: dist_train.sh <config.yml> [args...]"}
shift || true

if [[ -n "${COORDINATOR:-}" ]]; then
  exec python -m savsr_tpu.train -opt "${CONFIG}" --launcher jax \
    --force_yml "dist_params:coordinator_address=${COORDINATOR}" \
    "$@"
fi

exec python -m savsr_tpu.train -opt "${CONFIG}" --launcher jax "$@"
