"""Worker for tests/test_multihost.py — one of N processes × D devices.

Exercises the multi-host paths (parallel/feed.py):
  * feed: each process contributes its local shard of the global batch
    via jax.make_array_from_process_local_data, a cross-process
    collective reduces over the full global array;
  * train: one real Trainer-style train step over the global mesh
    (replicated params + identical global batch ⇒ identical loss on
    every host);
  * extract: the EXTRACTION feed end-to-end — every process draws its
    process_slice of a deterministic global stimulus set, the jitted
    all-tap + SRP extraction program runs over the process-spanning
    mesh, and the replicated global activations must equal a local
    single-process computation of the full batch (bitwise-level
    tolerance), covering the process_slice arithmetic at >2 processes
    (VERDICT r3 item 8).

Run: python multihost_worker.py <process_id> <port> <n_processes>
(parent sets XLA_FLAGS=--xla_force_host_platform_device_count=D).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

pid = int(sys.argv[1])
port = sys.argv[2]
nproc = int(sys.argv[3]) if len(sys.argv) > 3 else 2

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
ndev = jax.device_count()
ndev_local = jax.local_device_count()
assert ndev == ndev_local * nproc, (ndev, ndev_local, nproc)

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

mesh = make_mesh(data=ndev, model=1)

# ── feed path: local shards → global array ───────────────────────────
n = 2 * ndev
gx = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
sl = process_slice(n)
per = n // nproc
assert (sl.start, sl.stop) == (pid * per, (pid + 1) * per)
arr = put_global_batch(gx[sl], mesh)
assert arr.shape == (n, 3)
# every addressable shard holds exactly its global rows
for s in arr.addressable_shards:
    start = s.index[0].start or 0
    np.testing.assert_array_equal(
        np.asarray(s.data), gx[start:start + s.data.shape[0]])
# cross-process collective reduction sees all rows
assert float(jax.jit(lambda a: a.sum())(arr)) == float(gx.sum())
assert local_batch_size(n, mesh) == per

# process_slice arithmetic with a remainder (host-side, any nproc):
# disjoint, ordered, covering
edges = [process_slice(4 * nproc + 3, p, nproc) for p in range(nproc)]
assert edges[0].start == 0 and edges[-1].stop == 4 * nproc + 3
assert all(a.stop == b.start for a, b in zip(edges, edges[1:]))

# ── extraction feed end-to-end over the process-spanning mesh ────────
from visreps_tpu.models.extractor import FeatureExtractor

n_stim = 2 * ndev
state = init_model("TinyCustomCNN", 10, seed=0)
ex = FeatureExtractor(state, ["conv1", "fc1"], extract_pre_and_post=True,
                      srp_k=32, batch_size=n_stim, image_size=64)
proj = ex._proj_dict()
rng = np.random.default_rng(7)
g_stim = rng.standard_normal((n_stim, 64, 64, 3)).astype(np.float32)

stim_sl = process_slice(n_stim)
global_batch = put_global_batch(g_stim[stim_sl], mesh)
acts_sharded = ex._srp_step(state.variables, proj, global_batch)
rep = replicated(mesh)
acts_global = jax.jit(lambda d: d, out_shardings=rep)(acts_sharded)

# local single-process reference: full batch through the same program
acts_local = ex._srp_step(state.variables, proj, jnp.asarray(g_stim))
for tap in acts_local:
    np.testing.assert_allclose(
        np.asarray(acts_global[tap]), np.asarray(acts_local[tap]), atol=1e-5,
        err_msg=f"{nproc}-process extraction feed diverged at tap {tap}")

# ── one real DP train step over the multi-process mesh ───────────────
cfg = Config({
    "optimizer": "adamw", "learning_rate": 1e-3, "weight_decay": 1e-4,
    "grad_clip": 1.0, "lr_scheduler": "cosineannealinglr",
    "num_epochs": 2, "warmup_epochs": 0,
})
tx, _ = setup_optimizer(state.params, cfg, steps_per_epoch=4)
step = make_train_step(state.module, tx)
opt = tx.init(state.params)

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
print(f"MULTIHOST_OK pid={pid} nproc={nproc} loss={loss:.4f}")
