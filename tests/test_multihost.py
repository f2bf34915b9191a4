"""Multi-host readiness: 2 REAL processes x 4 virtual CPU devices.

VERDICT round-1 item 10 / SURVEY.md §2.10 (DP row): proves the
`jax.make_array_from_process_local_data` feed path (parallel/feed.py)
assembles global batches from per-process shards, that cross-process
collectives reduce over the full global array, and that one real
Trainer train step executes over the 2-process mesh. Uses the gloo CPU
collectives backend; both losses must match (replicated params, same
global batch).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_feed_and_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(WORKER.parent.parent),
        )
        for pid in range(2)
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
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
    # replicated params + identical global batch → identical loss on
    # both hosts
    losses = {o.strip().split("loss=")[-1] for o in outs}
    assert len(losses) == 1, losses
