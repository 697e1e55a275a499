#!/bin/bash
#SBATCH --job-name=vdt-train
#SBATCH --ntasks-per-node=1
#SBATCH --kill-on-bad-exit=1
# Multi-host TPU-pod training: one process per host; jax.distributed.initialize
# picks up the SLURM environment (counterpart of the reference's srun/NCCL
# train_slurm.sh).
set -e
export JAX_COORDINATOR_ADDRESS=${JAX_COORDINATOR_ADDRESS:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1):12345}
srun python scripts/video_train.py "$@"
