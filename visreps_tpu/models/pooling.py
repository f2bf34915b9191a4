"""Pooled multi-layer feature extraction (library home).

Promoted from experiments/representation_analysis/utils.py so package
code (visreps_tpu.analysis.extract_representations) never imports from
the experiments tree (ADVICE r2: the spatial_pool path broke when the
package was installed without the repo checkout layout).

Reference parity: experiments pool with nn.AdaptiveAvgPool2d on GPU
(reference experiments/representation_analysis/utils.py:100-160); here
conv taps are adaptively average-pooled on device inside one jitted
multi-tap program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def adaptive_avg_pool(x: jnp.ndarray, out_hw: int) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_hw, out_hw) — same bin edges
    as torch's AdaptiveAvgPool2d (floor/ceil split)."""
    n, h, w, c = x.shape
    starts_h = [(i * h) // out_hw for i in range(out_hw)]
    ends_h = [-(-((i + 1) * h) // out_hw) for i in range(out_hw)]
    starts_w = [(j * w) // out_hw for j in range(out_hw)]
    ends_w = [-(-((j + 1) * w) // out_hw) for j in range(out_hw)]
    rows = []
    for i in range(out_hw):
        cols = [
            x[:, starts_h[i]:ends_h[i], starts_w[j]:ends_w[j], :].mean(axis=(1, 2))
            for j in range(out_hw)
        ]
        rows.append(jnp.stack(cols, axis=1))  # (n, out_hw, c)
    return jnp.stack(rows, axis=1)  # (n, out_hw, out_hw, c)


def make_pooled_extractor(state, layers, pool_size: int | None = 3,
                          l2_normalize: bool = True):
    """Jitted fn(batch) -> {layer: (B, d) f32}, post-ReLU taps, conv
    taps pooled to pool_size², optional L2 row-normalize."""
    points = tuple(f"{l}_post" for l in layers)

    @jax.jit
    def step(variables, x):
        _, taps = state.module.apply(variables, x, train=False, capture=points)
        out = {}
        for l, p in zip(layers, points):
            t = taps[p]
            if t.ndim == 4 and pool_size is not None:
                t = adaptive_avg_pool(t, pool_size)
            t = t.reshape(t.shape[0], -1).astype(jnp.float32)
            if l2_normalize:
                t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-8)
            out[l] = t
        return out

    return partial(step, state.variables)
