"""Multi-host readiness: N REAL processes × D virtual CPU devices.

VERDICT round-1 item 10 / SURVEY.md §2.10 (DP row) + VERDICT r3 item 8:
proves the `jax.make_array_from_process_local_data` feed path
(parallel/feed.py) assembles global batches from per-process shards,
that cross-process collectives reduce over the full global array, that
the EXTRACTION feed (process_slice-sharded stimuli through the jitted
all-tap + SRP program) reproduces the single-process activations at 2
AND 4 processes, and that one real Trainer train step executes over
the multi-process mesh. Uses the gloo CPU collectives backend; all
losses must match (replicated params, same global batch).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc,ndev_per_proc", [(2, 4), (4, 2)])
def test_multiprocess_feed_extract_and_train_step(nproc, ndev_per_proc):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev_per_proc}"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port), str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(WORKER.parent.parent),
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid} nproc={nproc}" in out, out[-3000:]
    # replicated params + identical global batch → identical loss on
    # every host
    losses = {o.strip().split("loss=")[-1] for o in outs}
    assert len(losses) == 1, losses
