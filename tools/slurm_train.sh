#!/usr/bin/env bash
# SLURM multi-host training launcher (covers tools/slurm_train.sh in the
# reference). One task per host; jax.distributed rendezvous derived from
# SLURM variables. Usage:
#     sbatch -N <hosts> --ntasks-per-node=1 tools/slurm_train.sh CONFIG [args...]
# or interactively:
#     srun -N <hosts> --ntasks-per-node=1 bash tools/slurm_train.sh CONFIG [args...]
set -euo pipefail

CONFIG=$1
shift

MASTER=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
export JAX_COORDINATOR="${MASTER}:${JAX_COORDINATOR_PORT:-12355}"
export JAX_PROCESS_COUNT="${SLURM_NTASKS}"
export JAX_PROCESS_ID="${SLURM_PROCID}"

exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
