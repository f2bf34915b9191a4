"""Multi-host data feed: per-process local batches → global device arrays.

The reference is strictly single-host/single-device (visreps/trainer.py:17
pins cuda:0; SLURM fans out independent jobs, SURVEY.md §2.9-2.10). The
TPU-native scale-out unit is a pod slice spanning several hosts: each
host's dataloader yields only its shard of the global batch, and
`jax.make_array_from_process_local_data` assembles the logical global
array without any cross-host pixel traffic (activations/gradients move
over ICI via XLA collectives; input pixels never cross DCN).

Single-process meshes (one host, N chips) fall back to a plain sharded
device_put — the two paths produce identical logical arrays, which is
what tests/test_multihost.py verifies with 2 real processes.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global_batch(x, mesh: Mesh, spec: P = P("data")):
    """Upload one batch, sharded over the mesh.

    Single process: `x` is the full global batch; device_put shards it.
    Multi-process (jax.process_count() > 1): `x` is this PROCESS's
    contiguous shard of the global batch (global order = process order,
    see `process_slice`), and the global array is assembled from the
    per-process pieces.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(x), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def process_slice(n: int, process_id: int | None = None,
                  n_processes: int | None = None) -> slice:
    """This process's contiguous index range of a length-n global axis.

    The remainder goes to the last process; loaders use this to draw
    only the local subset of a (deterministically ordered/shuffled)
    global index list, so every process sees a disjoint shard and the
    concatenation over processes reproduces the single-host order.
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if n_processes is None else n_processes
    per = n // nproc
    start = pid * per
    stop = n if pid == nproc - 1 else start + per
    return slice(start, stop)


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-process batch size for a given global batch size.

    The global batch must divide evenly over processes (and should
    divide over the mesh's 'data' axis for even device shards).
    """
    nproc = jax.process_count()
    if global_batch_size % nproc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{nproc} processes")
    return global_batch_size // nproc
