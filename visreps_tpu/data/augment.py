"""On-device batch augmentation (flip + small rotation), jit-compiled.

The reference augments per-image on host workers with PIL
(obj_cls.py:37-43: RandomHorizontalFlip + RandomRotation(10°)). On a
TPU the host decode thread is the bottleneck, so augmentation moves to
the device: one jitted program flips and rotates the whole batch with
a gather-based nearest-neighbor resample (matching PIL's default
NEAREST rotation resample).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_degrees",))
def augment_batch(key, images: jnp.ndarray, max_degrees: float = 10.0) -> jnp.ndarray:
    """Random hflip + uniform(−max_deg, max_deg) rotation per image.

    images: (b, h, w, c) float32 (already normalized — rotation fills
    exposed corners with 0, matching PIL's black fill on normalized
    data only approximately; pass pre-normalization data for exact
    black fill).
    """
    b, h, w, c = images.shape
    k_flip, k_rot = jax.random.split(key)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)

    angles = jax.random.uniform(k_rot, (b,), minval=-max_degrees, maxval=max_degrees)
    rad = angles * (jnp.pi / 180.0)
    cos, sin = jnp.cos(rad), jnp.sin(rad)

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (h, w)

    # inverse rotation: source = R(−θ) · dest
    src_y = cos[:, None, None] * yy + sin[:, None, None] * xx + cy  # (b, h, w)
    src_x = -sin[:, None, None] * yy + cos[:, None, None] * xx + cx

    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)

    batch_idx = jnp.arange(b)[:, None, None]
    rotated = images[batch_idx, iy, ix]  # (b, h, w, c)
    return jnp.where(valid[..., None], rotated, 0.0)
