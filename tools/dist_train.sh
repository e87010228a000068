#!/usr/bin/env bash
# Multi-host training launcher (covers the reference's tools/dist_train.sh,
# which wraps torch.distributed.launch; here the "distributed launcher" is
# jax.distributed, configured by environment variables that tools/train.py
# reads at startup).
#
# On TPU pods the JAX runtime discovers the topology itself — run the same
# command on every host:
#     bash tools/dist_train.sh CONFIG [args...]
#
# On CPU/GPU multi-process setups, set the rendezvous explicitly:
#     JAX_COORDINATOR=host0:12355 JAX_PROCESS_COUNT=8 JAX_PROCESS_ID=$i \
#         bash tools/dist_train.sh CONFIG [args...]
set -euo pipefail

CONFIG=$1
shift

exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
