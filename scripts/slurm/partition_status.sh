#!/bin/bash
# Report TPU-partition availability. Reference parity: scripts/slurm/partition_status.sh.
set -euo pipefail
PARTITION="${1:-tpu}"
echo "== sinfo ($PARTITION) =="
sinfo -p "$PARTITION" -o "%P %a %D %t %N"
echo "== queued/running jobs =="
squeue -p "$PARTITION" -o "%i %u %t %M %R" | head -30
