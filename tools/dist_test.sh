#!/usr/bin/env bash
# Multi-host evaluation launcher (covers the reference's tools/dist_test.sh,
# which wraps torch.distributed.launch around tools/test.py; here the
# distributed runtime is jax.distributed, configured by environment
# variables that tools/test.py reads at startup).
#
# On TPU pods the JAX runtime discovers the topology itself — run the same
# command on every host:
#     bash tools/dist_test.sh CONFIG CHECKPOINT [args...]
#
# On CPU/GPU multi-process setups, set the rendezvous explicitly:
#     JAX_COORDINATOR=host0:12355 JAX_PROCESS_COUNT=8 JAX_PROCESS_ID=$i \
#         bash tools/dist_test.sh CONFIG CHECKPOINT [args...]
#
# Per-process dataset shards are gathered through the shared-FS dir
# passed via --gather-dir (collect_results_cpu parity, eval/runner.py).
set -euo pipefail

CONFIG=$1
CHECKPOINT=$2
shift 2

exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
