#!/bin/bash
# Single-job template for TPU SLURM partitions.
# Reference parity: scripts/slurm/basic.sh.
#SBATCH --job-name=visreps_tpu
#SBATCH --partition=tpu
#SBATCH --time=08:00:00
#SBATCH --cpus-per-task=32
#SBATCH --output=logs/%x.%j.out

python -m visreps_tpu.run --mode "${MODE:-train}" ${CONFIG:+--config "$CONFIG"} \
    --override ${OVERRIDES:-}
