"""Default mesh construction for the product paths (run.py / evals).

The reference is single-device by design (visreps/trainer.py:17 pins
cuda:0; SURVEY.md §2.10). Here every CLI entry auto-builds a
('data', 'model') mesh over all visible devices so training batches,
extraction batches, large RDMs and bootstrap iterations spread across
the chip mesh by default — disable with --override use_mesh=false.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh

from visreps_tpu.parallel.mesh import make_mesh


def default_mesh(cfg=None) -> Mesh | None:
    """('data', 'model') mesh over all devices; None when single-device
    or disabled via cfg.use_mesh=false.

    The 'model' axis defaults to 1 (pure data parallel — the paper's
    models are ~34 M params, SURVEY.md §2.10); cfg.mesh_model_axis
    carves out a tensor-parallel axis for the fc1/fc2 kernels.
    """
    if cfg is not None and not cfg.get("use_mesh", True):
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    model = int(cfg.get("mesh_model_axis", 1)) if cfg is not None else 1
    if model < 1 or len(devices) % model != 0:
        raise ValueError(
            f"mesh_model_axis={model} does not divide {len(devices)} devices"
        )
    return make_mesh(data=len(devices) // model, model=model)
