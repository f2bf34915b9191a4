"""Seeded random projections for memory-bounded activation extraction.

The reference caps every layer's feature dim at k = min(4096, D) via a
cached sklearn SparseRandomProjection (density ≈ 1/√D, values
±√(1/(density·k))) applied with torch.sparse.mm on GPU
(reference: visreps/models/utils.py:281-347,
visreps/analysis/sparse_random_projection.py). TPU redesign:

  * No disk cache — the projection is a pure function of
    (D, k, density, seed); it is regenerated on device from the seed.
  * The sparse-sign matrix is MATERIALIZED DENSE in bfloat16 and
    applied as an MXU matmul with f32 accumulation. At AlexNet scale
    (ΣD ≈ 0.45M unique dims) all per-layer matrices total ~3.7 GB of
    HBM while the matmuls run at MXU speed — far faster than any
    sparse gather/scatter formulation on TPU.
  * ``srht_project`` offers a storage-free structured alternative
    (sign flip → fast Walsh-Hadamard → coordinate subsample), the
    classic subsampled randomized Hadamard transform, for dims too
    large to materialize.

Note on fidelity: the reference calls sklearn with seed=None
(models/utils.py:305), so its projection is only reproducible through
its joblib cache — there is no canonical matrix to match bit-for-bit.
This implementation draws from the same ±√(1/(density·k)) sparse-sign
family and is exactly reproducible from the seed.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp


def _sparse_sign_matrix(key, d: int, k: int, density: float) -> jnp.ndarray:
    """(d, k) dense matrix with P(+v)=P(−v)=density/2, v=√(1/(density·k)).

    Same entry distribution as sklearn's _sparse_random_matrix
    (Achlioptas/Li family) without replicating its RNG stream.
    Built in f32 then cast to bf16 for MXU-friendly storage.
    """
    ku, ks = jax.random.split(key)
    u = jax.random.uniform(ku, (d, k), dtype=jnp.float32)
    sign = jnp.where(jax.random.bernoulli(ks, 0.5, (d, k)), 1.0, -1.0)
    value = math.sqrt(1.0 / (density * k))
    entries = jnp.where(u < density, sign * value, 0.0)
    return entries.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("d", "k", "density_q"))
def _make_matrix(seed: jnp.ndarray, d: int, k: int, density_q: float) -> jnp.ndarray:
    return _sparse_sign_matrix(jax.random.PRNGKey(seed), d, k, density_q)


@partial(jax.jit, static_argnames=("d", "k", "density_q"))
def _make_matrix_chunk(seed: jnp.ndarray, chunk: jnp.ndarray, d: int, k: int,
                       density_q: float) -> jnp.ndarray:
    """Row-chunk ci of an oversize projection: the chunk key is
    fold_in(PRNGKey(subseed), ci+1) — a hashed derivation whose streams
    are disjoint from every PRNGKey(int) base stream, so a chunk can
    never alias another tap dim's whole-matrix projection (the old
    additive subseed+1_000_003·(ci+1) collided with the base subseed of
    dim d+1_000_003·(ci+1) under the same seed)."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), chunk)
    return _sparse_sign_matrix(key, d, k, density_q)


@dataclass
class SRPTransform:
    """Seeded sparse-sign JL projection D → k, applied on the MXU.

    Matrices are cached in HBM per (D, k) for the lifetime of the
    transform object (mirrors the reference's per-(D,k) joblib cache,
    visreps/analysis/sparse_random_projection.py:83-150, without disk).
    """

    k: int = 4096
    seed: int = 0
    density: float | None = None  # None → 'auto' = 1/sqrt(D)
    _cache: dict = field(default_factory=dict, repr=False)

    def matrix_chunks(self, d: int) -> tuple:
        """Projection for input dim d, as a tuple of row-chunks.

        A single dense (d, k) bf16 buffer must stay under XLA's 2^31-
        byte buffer limit — CLIP/DINOv2 ViT-L taps (d = 257·1024 =
        263,168 at 224 px) put it at 2.155 GB and the remote compile
        helper rejects the program (measured: exit 1 on both towers;
        ViT-B's 1.24 GB compiles). Dims whose matrix fits stay ONE
        chunk, bit-identical to the unchunked build (same subseed →
        same matrix → same cached executables); oversize dims split
        into equal row-chunks keyed by fold_in(PRNGKey(subseed), ci+1)
        (streams disjoint from every base-dim stream) — entries remain
        i.i.d. from the same Achlioptas/Li family, and the projection
        is applied as a sum of chunked matmuls.
        """
        key = (d, self.k)
        if key not in self._cache:
            k_eff = min(self.k, d)
            density = self.density if self.density is not None else 1.0 / math.sqrt(d)
            # Per-D subseed so every unique input dim gets an
            # independent projection (reference caches per-D files).
            subseed = (self.seed * 1_000_003 + d) % (2**31 - 1)
            if 2 * d * k_eff < 2**31:
                chunks = (_make_matrix(jnp.uint32(subseed), d, k_eff, density),)
            else:
                n_chunks = -(-(2 * d * k_eff) // (2**30))  # chunks ≤ 1 GB
                rows = -(-d // n_chunks)
                chunks = tuple(
                    _make_matrix_chunk(
                        jnp.uint32(subseed), jnp.uint32(ci + 1),
                        min(rows, d - start), k_eff, density)
                    for ci, start in enumerate(range(0, d, rows)))
            self._cache[key] = chunks
        return self._cache[key]

    def matrix(self, d: int) -> jnp.ndarray:
        chunks = self.matrix_chunks(d)
        if len(chunks) > 1:
            raise ValueError(
                f"SRP matrix for d={d} exceeds the single-buffer limit; "
                "use matrix_chunks() / apply_chunked()")
        return chunks[0]

    def out_dim(self, d: int) -> int:
        return min(self.k, d)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Project (..., D) → (..., min(k, D)) with f32 accumulation."""
        return apply_chunked(x, self.matrix_chunks(x.shape[-1]))


def apply_chunked(x: jnp.ndarray, chunks) -> jnp.ndarray:
    """x (..., D) @ concat(chunks) with f32 accumulation, without ever
    materializing the concatenated (D, k) matrix: each row-chunk
    multiplies its slice of x and the partials sum."""
    out = None
    off = 0
    for m in chunks:
        r = m.shape[0]
        xs = jax.lax.slice_in_dim(x, off, off + r, axis=x.ndim - 1) \
            if len(chunks) > 1 else x
        part = jax.lax.dot_general(
            xs.astype(jnp.bfloat16), m,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = part if out is None else out + part
        off += r
    return out


# ─────────────── SRHT: storage-free structured JL ───────────────


def _fwht(x: jnp.ndarray) -> jnp.ndarray:
    """Fast Walsh-Hadamard transform along the last axis (len = 2^m).

    log2(D) rounds of pairwise add/sub — pure VPU work, no matrices.
    """
    d = x.shape[-1]
    h = 1
    while h < d:
        x = x.reshape(*x.shape[:-1], d // (2 * h), 2, h)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.stack([a + b, a - b], axis=-2).reshape(*x.shape[:-3], d)
        h *= 2
    return x


@partial(jax.jit, static_argnames=("k",))
def srht_project(x: jnp.ndarray, k: int, seed: int = 0) -> jnp.ndarray:
    """Subsampled randomized Hadamard transform (batch, D) → (batch, k).

    y = √(D_pad/k) · P · H · diag(s) · x / √D_pad with random signs s
    and a seeded coordinate subsample P. JL-equivalent to sparse
    random projection; zero HBM for the operator (signs + indices only).
    """
    b, d = x.shape
    d_pad = 1 << (d - 1).bit_length()
    key = jax.random.PRNGKey(seed)
    k_sign, k_perm = jax.random.split(key)
    signs = jnp.where(jax.random.bernoulli(k_sign, 0.5, (d,)), 1.0, -1.0)
    xp = jnp.zeros((b, d_pad), jnp.float32).at[:, :d].set(x.astype(jnp.float32) * signs)
    h = _fwht(xp) / math.sqrt(d_pad)
    idx = jax.random.choice(k_perm, d_pad, (k,), replace=False)
    return h[:, idx] * math.sqrt(d_pad / k)
