#!/usr/bin/env bash
# Full test gate: default tier + heavy tier, with measured wall-clocks.
#
# Tiers (tests/conftest.py):
#   default   units/modules, green in ~10 min on a 1-core host with a warm
#             compile cache (~28 min cold)
#   heavy     training-graph compiles, CLI e2e pipelines, multiprocess
#             meshes — the load-bearing end-to-end evidence
#
# Usage:  scripts/run_full_gate.sh [extra pytest args]
# Wall-clock expectations (1-core host, warm .jax_cache): see README
# "Test suite" — the two tiers' measured walls are recorded there and in
# PERF.md. Heavy tests run sequentially after the default tier so a
# default-tier failure fails fast.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== default tier ==="
t0=$SECONDS
python -m pytest tests/ -q "$@"
rc1=$?
t_default=$((SECONDS - t0))
echo "default tier: ${t_default}s (rc=$rc1)"

echo "=== heavy tier ==="
t0=$SECONDS
RUN_HEAVY=1 python -m pytest tests/ -q -m heavy "$@"
rc2=$?
t_heavy=$((SECONDS - t0))
echo "heavy tier: ${t_heavy}s (rc=$rc2)"

echo "=== gate summary ==="
echo "default: ${t_default}s rc=$rc1 | heavy: ${t_heavy}s rc=$rc2"
exit $(( rc1 || rc2 ))
