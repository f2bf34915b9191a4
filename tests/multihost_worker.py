"""Worker for tests/test_multihost.py — one of 2 processes x 4 devices.

Exercises the multi-host DP feed path (parallel/feed.py): each process
contributes its local shard of the global batch via
jax.make_array_from_process_local_data, then runs a cross-process
collective and one real Trainer-style train step over the global mesh.
Run: python multihost_worker.py <process_id> <port>
(parent sets XLA_FLAGS=--xla_force_host_platform_device_count=4).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

pid = int(sys.argv[1])
port = sys.argv[2]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
import jax.numpy as jnp

from visreps_tpu.core.config import Config
from visreps_tpu.models.zoo import init_model
from visreps_tpu.parallel.feed import (
    local_batch_size,
    process_slice,
    put_global_batch,
)
from visreps_tpu.parallel.mesh import make_mesh, replicated
from visreps_tpu.train.optim import setup_optimizer
from visreps_tpu.train.trainer import make_train_step

mesh = make_mesh(data=8, model=1)

# ── feed path: local shards → global array ───────────────────────────
n = 16
gx = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
sl = process_slice(n)
assert (sl.start, sl.stop) == (pid * 8, (pid + 1) * 8)
arr = put_global_batch(gx[sl], mesh)
assert arr.shape == (n, 3)
# every addressable shard holds exactly its global rows
for s in arr.addressable_shards:
    start = s.index[0].start or 0
    np.testing.assert_array_equal(
        np.asarray(s.data), gx[start:start + s.data.shape[0]])
# cross-process collective reduction sees all rows
assert float(jax.jit(lambda a: a.sum())(arr)) == float(gx.sum())
assert local_batch_size(n, mesh) == 8

# ── one real DP train step over the 2-process mesh ───────────────────
cfg = Config({
    "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 1e-4,
    "grad_clip": 1.0, "lr_scheduler": "cosineannealinglr",
    "num_epochs": 2, "warmup_epochs": 0,
})
state = init_model("TinyCustomCNN", 10, seed=0)
tx, _ = setup_optimizer(state.params, cfg, steps_per_epoch=4)
step = make_train_step(state.module, tx)
opt = tx.init(state.params)

rep = replicated(mesh)
params = jax.device_put(state.params, rep)
stats = jax.device_put(state.batch_stats, rep) if state.batch_stats is not None else None
opt = jax.device_put(opt, rep)

rng = np.random.default_rng(0)
g_images = rng.standard_normal((n, 64, 64, 3)).astype(np.float32)
g_labels = (np.arange(n) % 10).astype(np.int32)
images = put_global_batch(g_images[sl], mesh)
labels = put_global_batch(g_labels[sl], mesh)

params, stats, opt, loss, gn = step(
    params, stats, opt, images, labels, jax.random.PRNGKey(0))
loss = float(loss)
assert np.isfinite(loss), loss
print(f"MULTIHOST_OK pid={pid} loss={loss:.4f}")
