#!/bin/bash
# Sequential TPU bench stages; never killed mid-compile.
cd /root/repo
for s in selection_device; do
  echo "=== $s $(date +%H:%M:%S) ===" >> /tmp/stage_chain.log
  python -m visreps_tpu.benchmarks.stages "$s" >> /tmp/stage_chain.log 2>&1
  echo "--- rc=$? $(date +%H:%M:%S) ---" >> /tmp/stage_chain.log
done
echo ALL-DONE >> /tmp/stage_chain.log
