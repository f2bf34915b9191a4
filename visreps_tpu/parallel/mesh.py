"""Device mesh construction and sharding helpers.

The reference has NO in-process parallelism (single cuda:0 device,
SURVEY.md §2.10); scale-out is SLURM fan-out. Here scale-out is a
jax.sharding.Mesh: batch axis ('data') for training/extraction,
optional 'model' axis for tensor-parallel FC blocks, and the stimulus
axis of RDM construction sharded in parallel/shard.py. XLA/GSPMD
inserts all collectives (psum / all-gather over ICI) — no NCCL analog.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# FC-layer kernels big enough to be worth tensor-parallel sharding:
# CustomCNN/AlexNet fc1/fc2 hold ~2/3 of all params.
_TP_MODULES = ("fc1", "fc2")


def shard_params_tp(params, mesh: Mesh):
    """Place params: fc kernels column-sharded on 'model', rest replicated.

    Column (output-dim) sharding keeps the activations sharded through
    the back-to-back fc1→fc2 pair; XLA inserts the reduce-scatter /
    all-gather pair where profitable.
    """
    rep = replicated(mesh)
    col = NamedSharding(mesh, P(None, "model"))

    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_tp_module = any(n in _TP_MODULES for n in names)
        if in_tp_module and leaf.ndim == 2:
            return jax.device_put(leaf, col)
        if in_tp_module and leaf.ndim == 1:
            return jax.device_put(leaf, NamedSharding(mesh, P("model")))
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, params)
