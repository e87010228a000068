#!/usr/bin/env bash
# SLURM multi-host evaluation launcher (covers tools/slurm_test.sh in the
# reference). One task per host; jax.distributed rendezvous derived from
# SLURM variables. Usage:
#     srun -N <hosts> --ntasks-per-node=1 \
#         bash tools/slurm_test.sh CONFIG CHECKPOINT [args...]
set -euo pipefail

CONFIG=$1
CHECKPOINT=$2
shift 2

MASTER=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR="${MASTER}:${JAX_COORDINATOR_PORT:-12355}"
export JAX_PROCESS_COUNT="${SLURM_NTASKS}"
export JAX_PROCESS_ID="${SLURM_PROCID}"

exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
