"""Multi-layer activation extraction with fused on-device SRP.

Reference parity: visreps/models/utils.py:27-404 (FeatureExtractor +
get_activations + extract_single_layer). TPU redesign:

  * No forward hooks — tap points are explicit jitted outputs chosen by
    a static ``capture`` tuple, so a single compiled program produces
    the forward pass AND all 14 sparse-random-projections per batch
    (conv → flatten → bf16 MXU matmul), with no host round trips
    between layers.
  * Tap shapes are discovered with ``jax.eval_shape`` (no probe batch
    forward, unlike models/utils.py:297-305).
  * The last ragged batch is padded to the fixed batch size so one
    compiled program serves the whole run.
  * Device dispatch is pipelined one batch deep: batch i+1's forward is
    enqueued before batch i's projected activations are fetched,
    overlapping host JPEG decode with TPU compute.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visreps_tpu.core.logging import rprint
from visreps_tpu.models.zoo import ModelState
from visreps_tpu.ops.srp import SRPTransform
from visreps_tpu.ops.srp import apply_chunked as srp_apply_chunked


def expand_return_nodes(module, return_nodes: Sequence[str], extract_pre_and_post: bool = True):
    """Semantic layer names → ordered tap point names.

    With extract_pre_and_post, each layer that has a downstream
    activation expands to (name_pre, name_post); layers without one
    keep a single point (reference: models/utils.py:198-230).
    Without it, the single post point keeps the plain layer name.
    """
    tap_specs = module.TAPS
    points: list[str] = []
    alias: dict[str, str] = {}  # tap point -> output name
    for name in return_nodes:
        if name not in tap_specs:
            rprint(f"Warning: {name} not found in model tap map", style="warning")
            continue
        spec = tap_specs[name]
        if extract_pre_and_post or len(spec) == 1:
            for p in spec:
                points.append(p)
                alias[p] = p
        else:
            # post-ReLU point only, reported under the plain layer name
            p = spec[-1]
            points.append(p)
            alias[p] = name
    return points, alias


class FeatureExtractor:
    """Jit-compiled multi-tap extractor with optional fused SRP."""

    def __init__(
        self,
        state: ModelState,
        return_nodes: Sequence[str],
        extract_pre_and_post: bool = True,
        srp_k: int = 4096,
        srp_seed: int = 0,
        batch_size: int = 128,
        image_size: int | None = None,
        compute_dtype: str | None = None,
        mesh=None,
    ):
        self.state = state
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndev = mesh.shape["data"]
            # Every batch is padded to batch_size, so one rounding at
            # init keeps the batch axis divisible across the mesh.
            batch_size = -(-batch_size // ndev) * ndev
            self._batch_sharding = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())
            state.params = jax.device_put(state.params, self._replicated)
            if state.batch_stats is not None:
                state.batch_stats = jax.device_put(state.batch_stats, self._replicated)
        self.batch_size = batch_size
        self.image_size = image_size or state.input_size
        # 'bf16' runs the forward in bfloat16 (≈3× MXU throughput for
        # the f32 convs); activations feed the SRP whose JL noise
        # dominates the cast error. Default f32 for reference parity.
        self.compute_dtype = compute_dtype
        self.points, self.alias = expand_return_nodes(
            state.module, list(return_nodes), extract_pre_and_post
        )
        self.return_nodes = {self.alias[p]: self.alias[p] for p in self.points}
        self.srp = SRPTransform(k=srp_k, seed=srp_seed)

        # Tap shape discovery without running the model. Eval stimuli
        # are transformed to a fixed size (224 in the reference's
        # imgnet transform) regardless of the model's training size.
        size = self.image_size
        dummy = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32)

        def fwd(variables, x):
            return state.module.apply(variables, x, train=False, capture=tuple(self.points))

        _, tap_shapes = jax.eval_shape(fwd, state.variables, dummy)
        self.tap_dims = {
            self.alias[p]: int(np.prod(tap_shapes[p].shape[1:])) for p in self.points
        }

        points = tuple(self.points)
        alias = dict(self.alias)
        module = state.module
        bf16_fwd = compute_dtype == "bf16"
        from visreps_tpu.data.transforms import DS_MEAN, DS_STD

        norm_mean = jnp.asarray(DS_MEAN["imgnet"])
        norm_std = jnp.asarray(DS_STD["imgnet"])

        def _flat_taps(variables, x):
            if x.dtype == jnp.uint8:
                # uint8 transfer path: 4x less host→device bandwidth;
                # normalization folds into the first device op.
                x = (x.astype(jnp.float32) / 255.0 - norm_mean) / norm_std
            if bf16_fwd:
                variables = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
                    variables,
                )
                x = x.astype(jnp.bfloat16)
            _, taps = module.apply(variables, x, train=False, capture=points)
            return {p: taps[p].reshape(taps[p].shape[0], -1) for p in points}

        def _srp_body(variables, proj, x, out_bf16=False):
            flats = _flat_taps(variables, x)
            out = {}
            for p in points:
                flat = flats[p]
                # proj is keyed by INPUT DIM, not tap name: taps sharing
                # a dim share one projection argument. Passing the same
                # matrix once per tap made the AOT compiler account it
                # once per parameter — 24 ViT-L block taps × 2.05 GB
                # billed 49.3 GB of HBM "arguments" against a 15.75 GB
                # chip and the towers failed to compile. Values are
                # chunk tuples (a single (263168, 4096) bf16 buffer also
                # crosses the 2^31-byte limit; see ops/srp.py).
                o = srp_apply_chunked(flat, proj[str(flat.shape[1])])
                # Device-store callers consume bf16; casting HERE fuses
                # into the matmul epilogue — a separate astype per tap
                # per batch is ~2k extra relay dispatches at 73k scale.
                out[alias[p]] = o.astype(jnp.bfloat16) if out_bf16 else o
            return out

        self._srp_step = partial(jax.jit, static_argnames=("out_bf16",))(_srp_body)

        def _srp_body_exact(variables, proj, x, keep, exact_points,
                            out_bf16=False):
            # Same forward + SRP, ADDITIONALLY gathering the exact
            # (full-resolution, no-SRP) tap rows of the `keep` indices
            # as bf16 for the taps in `exact_points` (a budgeted
            # subset) — phase-2 test-row retention (VERDICT r4 item 3):
            # the ~1k shared-test rows are kept during the bulk pass so
            # the eval never re-reads / re-uploads / re-forwards them.
            flats = _flat_taps(variables, x)
            out, exact = {}, {}
            for p in points:
                flat = flats[p]
                if p in exact_points:
                    exact[alias[p]] = jnp.take(
                        flat, keep, axis=0).astype(jnp.bfloat16)
                o = srp_apply_chunked(flat, proj[str(flat.shape[1])])
                out[alias[p]] = o.astype(jnp.bfloat16) if out_bf16 else o
            return out, exact

        self._srp_step_exact = partial(
            jax.jit, static_argnames=("exact_points", "out_bf16"))(
                _srp_body_exact)

        @partial(jax.jit, static_argnames=("out_bf16",))
        def _srp_step_super(variables, proj, xs, out_bf16=False):
            # K stacked batches per dispatch: lax.map keeps the live tap
            # intermediates at single-batch size while cutting the
            # dispatch round-trips (and H2D transfers) K-fold — through
            # a remote-dispatch relay those round-trips serialize
            # against the image uploads and dominate extraction
            # (measured 296-371 s at 73k where pure 3-stream H2D of the
            # same bytes is ~153 s).
            outs = jax.lax.map(
                lambda x: _srp_body(variables, proj, x, out_bf16), xs)
            return {name: o.reshape(-1, o.shape[-1]) for name, o in outs.items()}

        self._srp_step_super = _srp_step_super

        @partial(jax.jit, static_argnames=("exact_points", "out_bf16"))
        def _srp_step_super_exact(variables, proj, xs, keeps, exact_points,
                                  out_bf16=False):
            # Super-batched twin of _srp_body_exact: keeps is (K, max_k)
            # per-sub-batch row indices (zero-padded; pads target the
            # exact store's dump row downstream). The (K, max_k, D)
            # exact gathers stay at single-sub-batch live size inside
            # the lax.map and flatten to (K·max_k, D) for the scatter.
            def one(args):
                x, keep = args
                return _srp_body_exact(variables, proj, x, keep,
                                       exact_points, out_bf16)

            outs, exact = jax.lax.map(one, (xs, keeps))
            return (
                {name: o.reshape(-1, o.shape[-1]) for name, o in outs.items()},
                {name: e.reshape(-1, e.shape[-1]) for name, e in exact.items()},
            )

        self._srp_step_super_exact = _srp_step_super_exact

        @partial(jax.jit, donate_argnums=(0, 1))
        def _store_write_exact(store, exact_store, outs, ex_rows, offset, dst):
            # One donated program per group writes BOTH stores: the
            # batch's SRP rows in place at `offset`, and the retained
            # exact tap rows scattered to their final positions (padded
            # slots carry dst = n_exact, the dump row). Fusing the two
            # writes halves the per-group write dispatches — dispatch
            # COUNT is the host-side lever through the relay.
            new_store = {
                name: jax.lax.dynamic_update_slice(
                    store[name], outs[name].astype(store[name].dtype),
                    (offset, 0))
                for name in store
            }
            new_exact = {name: exact_store[name].at[dst].set(ex_rows[name])
                         for name in exact_store}
            return new_store, new_exact

        self._store_write_exact = _store_write_exact

        @partial(jax.jit, donate_argnums=(0,))
        def _store_write(store, outs, offset):
            # Write one batch's tap outputs in place into the
            # preallocated (N_pad, k) per-tap store at row `offset`
            # (traced scalar — no per-offset recompiles; donation makes
            # the update zero-copy). Kept as its OWN tiny program
            # rather than fused into the forward: the fused variant's
            # compile-time footprint (store + projections + every tap
            # intermediate live at once) was 16.14 GB — a compile-time
            # HBM OOM on a 15.75 GB chip — while split programs each
            # stay small and the forward executable stays byte-stable
            # (reuses its relay compile cache entry across runs).
            return {
                name: jax.lax.dynamic_update_slice(
                    store[name], outs[name].astype(store[name].dtype),
                    (offset, 0))
                for name in store
            }

        self._store_write = _store_write

        def _single_step(variables, x, point):
            if x.dtype == jnp.uint8:
                x = (x.astype(jnp.float32) / 255.0 - norm_mean) / norm_std
            _, taps = module.apply(variables, x, train=False, capture=(point,))
            t = taps[point]
            return t.reshape(t.shape[0], -1).astype(jnp.float32)

        self._single_step = jax.jit(_single_step, static_argnames=("point",))

        def _multi_step(variables, x, points):
            if x.dtype == jnp.uint8:
                x = (x.astype(jnp.float32) / 255.0 - norm_mean) / norm_std
            _, taps = module.apply(variables, x, train=False, capture=points)
            return {
                p: taps[p].reshape(taps[p].shape[0], -1).astype(jnp.float32)
                for p in points
            }

        # jit caches per distinct `points` tuple, so repeated phase-2
        # calls with the same layer set compile once.
        self._multi_step = jax.jit(_multi_step, static_argnames=("points",))

        def _seg_step(acc, variables, seg, x, point):
            # Forward one batch and scatter-add its flattened tap rows
            # into the per-group accumulator — the group means are the
            # only thing that ever leaves the device (see
            # extract_single_layer_mean). Donating `acc` reuses the
            # (G+1, D) buffer across batches.
            if x.dtype == jnp.uint8:
                x = (x.astype(jnp.float32) / 255.0 - norm_mean) / norm_std
            _, taps = module.apply(variables, x, train=False, capture=(point,))
            t = taps[point].reshape(x.shape[0], -1).astype(jnp.float32)
            return acc.at[seg].add(t)

        self._seg_step = jax.jit(
            _seg_step, static_argnames=("point",), donate_argnums=(0,))

    # ── projection matrices (built once, HBM-resident) ──────────
    def _proj_dict(self):
        # Keyed by unique input dim (stringified for the jit pytree):
        # pre/post tap pairs and same-width transformer blocks share
        # one argument — see the dedup note in _srp_body.
        proj = {str(d): self.srp.matrix_chunks(d)
                for d in set(self.tap_dims.values())}
        if self._batch_sharding is not None:
            proj = jax.device_put(proj, self._replicated)
        return proj

    def out_dims(self) -> dict[str, int]:
        return {name: self.srp.out_dim(d) for name, d in self.tap_dims.items()}

    def _pad(self, x: np.ndarray, pad_to: int | None = None) -> tuple[np.ndarray, int]:
        target = pad_to or self.batch_size
        b = x.shape[0]
        if b == target:
            return x, b
        pad = np.zeros((target - b, *x.shape[1:]), x.dtype)
        return np.concatenate([x, pad]), b

    def _to_device(self, x: np.ndarray):
        """Upload one batch, sharded over the mesh's 'data' axis when
        present — GSPMD then propagates the batch sharding through the
        forward and SRP matmuls (collectives ride ICI)."""
        if self._batch_sharding is not None:
            # multi-host safe: under >1 process, x is this host's shard
            # of the global batch (parallel/feed.py)
            from visreps_tpu.parallel.feed import put_global_batch

            return put_global_batch(x, self.mesh)
        return jnp.asarray(x)

    def _device_feed(self, loader: Iterable, depth: int | None = None,
                     threads: int | None = None, pad_to: int | None = None,
                     superbatch: int = 1):
        """Yield (device_batch, keys, n_valid) with uploads pipelined.

        superbatch=K stacks K consecutive padded batches into ONE
        (K, B, ...) host array per upload — K× fewer transfers and K×
        fewer downstream dispatches (the caller runs one lax.map
        program per stack). Yields (stacked_device, flat_keys, keep)
        where keep is None (every row valid) or an int32 row-index
        array (final, zero-padded stack). The final stack is padded to
        K sub-batches rather than compiled at a second leading dim —
        one wasted zero-batch beats another relay compile.

        On remote-attached TPUs a single in-flight host→device copy is
        latency-bound; concurrent transfers raise effective bandwidth
        up to a ~72 MB/s per-process ceiling that peaks at THREE
        in-flight copies and degrades beyond (measured sweep, stages.
        stage_h2d_streams: 1→64, 2→69, 3→72, 4→64, 6→57 MB/s), and the
        upload of batch k+1..k+depth overlaps batch k's compute.
        Uploads run on a small thread pool; the loader's own prefetch
        threads keep decoding ahead of the uploads.
        """
        import os
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if depth is None:
            env_depth = os.environ.get("VISREPS_FEED_DEPTH")
            if env_depth is not None:
                depth = int(env_depth)
            else:
                # Keep in-flight upload bytes ~constant across
                # superbatch sizes (K·B·img_bytes·depth ≈ 1.2 GB at the
                # NSD shape): K=8 stacks 616 MB per upload, so queue 2.
                depth = 4 if superbatch <= 4 else 2
        if threads is None:
            threads = int(os.environ.get("VISREPS_FEED_THREADS", "3"))
        import time as _time

        # Decomposition of the host feed wall (read by get_activations
        # into last_extract_times): loader_s = blocked on host decode /
        # batch assembly; upload_wait_s = blocked on device_put futures.
        stats = self._feed_stats = {"loader_s": 0.0, "upload_wait_s": 0.0}
        ex = ThreadPoolExecutor(max_workers=threads)
        pending: deque = deque()

        def _result(fut):
            t = _time.perf_counter()
            res = fut.result()
            stats["upload_wait_s"] += _time.perf_counter() - t
            return res

        group_x: list = []
        group_keys: list = []
        group_ns: list = []

        def _flush_group():
            k_sub = len(group_x)
            b = group_x[0].shape[0]
            while len(group_x) < superbatch:  # zero-pad the final stack
                group_x.append(np.zeros_like(group_x[0]))
            stacked = np.stack(group_x)
            group_x.clear()
            keep = None
            if k_sub < superbatch or any(n < b for n in group_ns):
                rows = []
                for i, n in enumerate(group_ns):
                    rows.extend(range(i * b, i * b + n))
                keep = np.asarray(rows, np.int32)
            keys_flat = list(group_keys)
            group_keys.clear()
            group_ns.clear()
            return stacked, keys_flat, keep

        try:
            it = iter(loader)
            while True:
                t = _time.perf_counter()
                item = next(it, None)
                stats["loader_s"] += _time.perf_counter() - t
                if item is None:
                    break
                x, keys = item
                xp, n = self._pad(np.asarray(x), pad_to)
                if superbatch > 1:
                    group_x.append(xp)
                    group_keys.extend(keys[:n])
                    group_ns.append(n)
                    if len(group_x) < superbatch:
                        continue
                    stacked, keys_flat, keep = _flush_group()
                    pending.append(
                        (ex.submit(self._to_device, stacked), keys_flat, keep))
                else:
                    pending.append((ex.submit(self._to_device, xp), keys, n))
                if len(pending) >= depth:
                    fut, k, nv = pending.popleft()
                    yield _result(fut), k, nv
            if group_x:
                stacked, keys_flat, keep = _flush_group()
                pending.append(
                    (ex.submit(self._to_device, stacked), keys_flat, keep))
            while pending:
                fut, k, nv = pending.popleft()
                yield _result(fut), k, nv
        finally:
            ex.shutdown(wait=True)

    def _exact_retain_plan(self, loader, exact_retain_ids, k_super: int):
        """Host-side plan for phase-2 test-row retention.

        Extraction order is the dataset's sorted-key order; knowing it
        (plus the batch/superbatch geometry) BEFORE extraction fixes a
        single static kept-rows-per-sub-batch shape (max_k), so ONE
        compiled forward program serves every group. Returns
        (keeps (G, K, max_k) int32 within-sub-batch row indices,
        dsts (G, K*max_k) int32 target rows in the exact store —
        padded slots point at the dump row n_exact,
        order (the expected full id sequence), exact_ids) or None when
        the loader's order is unknowable or nothing matches.
        """
        if jax.process_count() > 1:
            # Multi-host feeds shard each batch per process; the
            # host-local key sequence no longer matches the global plan.
            return None
        ds = getattr(loader, "dataset", None)
        keys_sorted = getattr(ds, "keys", None)
        if not keys_sorted:
            return None
        order = [str(k) for k in keys_sorted]
        want_rank = {}
        for sid in exact_retain_ids:
            s = str(sid)
            if s not in want_rank:
                want_rank[s] = len(want_rank)
        present = [s for s in order if s in want_rank]
        if not present:
            return None
        # final store row of each retained id = its rank in
        # exact_retain_ids order (the order phase 2 scores in)
        ranks = sorted(want_rank[s] for s in present)
        row_of_rank = {r: i for i, r in enumerate(ranks)}
        n_exact = len(present)

        b = self.batch_size
        group = k_super * b
        n_groups = -(-len(order) // group)
        kept: list[list[list[tuple[int, int]]]] = [
            [[] for _ in range(k_super)] for _ in range(n_groups)]
        for pos, s in enumerate(order):
            if s not in want_rank:
                continue
            g, rem = divmod(pos, group)
            j, i = divmod(rem, b)
            kept[g][j].append((i, row_of_rank[want_rank[s]]))
        max_k = max((len(sub) for grp in kept for sub in grp), default=0)
        max_k = max(1, max_k)
        keeps = np.zeros((n_groups, k_super, max_k), np.int32)
        dsts = np.full((n_groups, k_super, max_k), n_exact, np.int32)
        for g, grp in enumerate(kept):
            for j, sub in enumerate(grp):
                for slot, (i, dst) in enumerate(sub):
                    keeps[g, j, slot] = i
                    dsts[g, j, slot] = dst
        exact_ids = [None] * n_exact
        for s in present:
            exact_ids[row_of_rank[want_rank[s]]] = s
        return keeps, dsts.reshape(n_groups, -1), order, exact_ids

    # ── bulk extraction with SRP ─────────────────────────────────
    def get_activations(self, loader: Iterable, total: int | None = None,
                        store: str = "host", retain_ids=None,
                        exact_retain_ids=None):
        """All-tap SRP activations over a loader of (batch, keys).

        store="host": ({name: np.float32 (N, k)}, ids) — the reference
        contract (models/utils.py:281-347), activations accumulated on
        the host.
        store="device": activations stay HBM-resident as bfloat16
        jax arrays — downstream RDM/selection math then runs without
        re-uploading (73k × 4096 × 14 taps ≈ 8.5 GB bf16; crucial when
        host↔device bandwidth is the bottleneck).
        retain_ids: optional set of stimulus ids (str) to KEEP. Every
        stimulus is still uploaded and run through the all-tap SRP
        forward (the full workload); rows no downstream consumer reads
        are dropped at accumulation time. The RSA eval's phase 1 only
        ever reads the n_select-per-subject seed-42 subsample, so
        retaining just that union cuts the 73k-scale device store from
        ~8.4 GB to < 1 GB — which is what lets several extraction
        processes share one 16 GB chip. Device-store retention pads
        each batch's kept-row index vector to a power-of-two bucket
        (≤ log2(batch)+1 compiled gather shapes — a VARIABLE-length
        gather per batch would compile one program per distinct length,
        and through a remote-compile relay those ~100 synchronous
        compiles dominate the whole extraction) and compacts the padded
        store with ONE final gather.
        exact_retain_ids: optional ORDERED list of stimulus ids whose
        EXACT (full-resolution, no-SRP) tap rows are additionally kept
        on device as bf16, scatter-written into a preallocated
        (n_exact, D) per-tap store during the same forward pass —
        deleting the RSA eval's phase-2 re-extraction of the shared
        test stimuli (VERDICT r4 item 3; the reference re-extracts per
        layer, visreps/models/utils.py:350-404). Only available on the
        device-store fast path with an order-knowable loader; the
        result lands in ``self.exact_store`` / ``self.exact_ids``
        (None when unavailable — callers fall back to re-extraction).
        """
        import os
        import time as _time

        _t0 = _time.perf_counter()
        self.exact_store = None
        self.exact_ids = None
        proj = self._proj_dict()
        dims = self.out_dims()
        chunks: dict[str, list] = {name: [] for name in dims}
        ids: list = []
        pending = None  # (device result dict, keep spec)
        retain_meta: list[tuple[int, int]] = []  # (padded_len, n_valid)

        out_bf16 = store == "device"

        def drain(p):
            # keep=None: full batch, append the step output as-is (zero
            # extra programs — the bf16 cast is fused into _srp_step).
            # keep=slice: last partial batch, one trim per tap.
            # keep=array: retention gather (bucket-padded indices).
            res, keep = p
            if store == "device":
                for name, arr in res.items():
                    chunks[name].append(arr if keep is None else arr[keep])
            else:
                host = jax.device_get(res)
                for name, arr in host.items():
                    chunks[name].append(arr if keep is None else arr[keep])

        dispatch_s = 0.0

        def _step(xd):
            nonlocal dispatch_s
            t = _time.perf_counter()
            fn = self._srp_step_super if xd.ndim == 5 else self._srp_step
            res = fn(self.state.variables, proj, xd, out_bf16=out_bf16)
            dispatch_s += _time.perf_counter() - t
            return res

        # Superbatching (K uploads + K dispatches → 1 + 1) only applies
        # off the retention path: retention computes per-batch kept-row
        # indices that assume single-batch granularity. Multi-host mesh
        # feeds also stay at K=1 (put_global_batch shards per batch).
        # Default K=8: dispatch round-trips dominate extraction whenever
        # the relay degrades (same-code e2e dispatch walls of 8.8 s →
        # 550 s across windows; dispatch cost is count-linear). A
        # same-window r5 A/B at 73k measured K=8/depth=2 extraction
        # 195.8 s (dispatch 62.5) vs K=4/depth=4 285.1 s (dispatch
        # 158.1), WITH K=8's first compile included; the feed keeps
        # in-flight upload bytes constant by queueing 2 stacks deep.
        k_super = 1
        if retain_ids is None and self._batch_sharding is None:
            k_super = max(1, int(os.environ.get("VISREPS_SUPERBATCH", "8")))

        # Device-store fast path: preallocate the full (N_pad, k) bf16
        # store per tap and have ONE program (forward + SRP + donated
        # dynamic_update_slice) write each batch in place. No per-batch
        # chunk buffers, no final 143-input concatenate program — both
        # mattered through the remote-compile relay (the concat tail
        # alone showed up as 60-220 s of "drain"). Padded tail rows are
        # never referenced: every consumer gathers rows via the ids map.
        n_total = total
        if n_total is None:
            ds = getattr(loader, "dataset", None)
            try:
                n_total = len(ds) if ds is not None else len(loader) * self.batch_size
            except TypeError:
                n_total = None
        if (store == "device" and retain_ids is None and n_total
                and os.environ.get("VISREPS_STORE_UPDATE", "1") != "0"):
            exact_plan = None
            if exact_retain_ids:
                exact_plan = self._exact_retain_plan(
                    loader, exact_retain_ids, k_super)
            exact_store = None
            exact_points = ()
            if exact_plan is not None:
                keeps_all, dsts_all, plan_order, plan_ids = exact_plan
                n_exact = len(plan_ids)
                # Budgeted retention, smallest tap dims first: the full
                # 14-tap store (~0.9 GB bf16 at NSD scale, conv1_pre/
                # post alone ~86% of ΣD) tipped extraction over a
                # 15.75 GB chip whose bulk store + projections +
                # in-flight uploads already ride the ceiling (measured
                # RESOURCE_EXHAUSTED at the fused store write). Taps
                # over the budget are simply not retained — phase 2
                # re-extracts only those if selected.
                budget = float(os.environ.get(
                    "VISREPS_EXACT_RETAIN_MB", "192")) * 1e6
                kept_names, used = [], 0.0
                for name, d in sorted(self.tap_dims.items(),
                                      key=lambda kv: kv[1]):
                    cost = 2.0 * (n_exact + 1) * d
                    if used + cost > budget:
                        continue
                    kept_names.append(name)
                    used += cost
                if kept_names:
                    # +1 dump row for the zero-padded kept slots
                    exact_store = {
                        name: jnp.zeros((n_exact + 1, self.tap_dims[name]),
                                        jnp.bfloat16)
                        for name in kept_names}
                    exact_points = tuple(
                        p for p in self.points if self.alias[p] in exact_store)
            group = k_super * self.batch_size
            n_pad = -(-n_total // group) * group
            acts = {name: jnp.zeros((n_pad, d), jnp.bfloat16)
                    for name, d in dims.items()}
            offset = 0
            g_idx = 0
            short_seen = False
            for xd, keys, n in self._device_feed(loader, superbatch=k_super):
                rows = group if k_super > 1 else self.batch_size
                if offset + rows > n_pad:
                    raise RuntimeError(
                        f"loader yielded more than the estimated {n_total} "
                        f"stimuli (store preallocated at {n_pad} rows)")
                valid = keys if k_super > 1 else keys[:n]
                if short_seen:
                    # Row i of the store must be ids[i]: only trailing
                    # padding keeps that true, so a short batch is only
                    # legal as the final one.
                    raise RuntimeError(
                        "short batch before the final one breaks store "
                        "row alignment")
                if len(valid) < rows:
                    short_seen = True
                ids.extend(valid)
                if exact_store is not None:
                    t = _time.perf_counter()
                    if xd.ndim == 5:
                        out, ex = self._srp_step_super_exact(
                            self.state.variables, proj, xd,
                            jnp.asarray(keeps_all[g_idx]),
                            exact_points=exact_points, out_bf16=True)
                    else:
                        out, ex = self._srp_step_exact(
                            self.state.variables, proj, xd,
                            jnp.asarray(keeps_all[g_idx, 0]),
                            exact_points=exact_points, out_bf16=True)
                    acts, exact_store = self._store_write_exact(
                        acts, exact_store, out, ex, offset,
                        jnp.asarray(dsts_all[g_idx]))
                    dispatch_s += _time.perf_counter() - t
                else:
                    out = _step(xd)  # counts its own dispatch_s
                    t = _time.perf_counter()
                    acts = self._store_write(acts, out, offset)
                    dispatch_s += _time.perf_counter() - t
                offset += rows
                g_idx += 1
            del proj
            if exact_store is not None:
                if ids == plan_order:
                    # Drop the dump row in one program; the store is in
                    # exact_retain_ids order by construction.
                    self.exact_store = jax.jit(
                        lambda d: {k: v[:n_exact] for k, v in d.items()}
                    )(exact_store)
                    self.exact_ids = plan_ids
                else:
                    rprint(
                        "Warning: loader order diverged from the exact-"
                        "retention plan — discarding retained taps "
                        "(phase 2 will re-extract)", style="warning")
                del exact_store
            _t1 = _time.perf_counter()
            jax.block_until_ready(list(acts.values()))
            self.last_extract_times = {
                "enqueue_s": round(_t1 - _t0, 1),
                "drain_s": round(_time.perf_counter() - _t1, 1),
                "loader_s": round(self._feed_stats["loader_s"], 1),
                "upload_wait_s": round(self._feed_stats["upload_wait_s"], 1),
                "dispatch_s": round(dispatch_s, 1),
            }
            rprint(
                f"  SRP activations: {len(acts)} taps x {len(ids)} stimuli "
                f"(device, in-place store)",
                style="success",
            )
            return acts, ids

        for xd, keys, n in self._device_feed(loader, superbatch=k_super):
            if k_super > 1:
                ids.extend(keys)
                keep = n  # feed contract: None or int32 row-index array
            elif retain_ids is None:
                ids.extend(keys)
                keep = None if n == self.batch_size else slice(None, n)
            else:
                kept = [i for i, k in enumerate(keys[:n]) if str(k) in retain_ids]
                if not kept:
                    # Still dispatch the forward: the workload is every
                    # stimulus through every tap, retained or not.
                    res = _step(xd)
                    del res
                    continue
                ids.extend(keys[i] for i in kept)
                if store == "device":
                    pad_len = 1
                    while pad_len < len(kept):
                        pad_len *= 2
                    pad_len = min(pad_len, self.batch_size)
                    kp = np.zeros(pad_len, np.int32)
                    kp[: len(kept)] = kept
                    retain_meta.append((pad_len, len(kept)))
                    keep = kp
                else:
                    keep = np.asarray(kept, np.int32)  # host gather: free
            cur = (_step(xd), keep)
            if pending is not None:
                drain(pending)
            pending = cur
        if pending is not None:
            drain(pending)

        del proj, pending
        # Compaction positions of the true rows inside the padded
        # device store (host-computed; one static gather per tap).
        compact = None
        if retain_meta:
            pos, off = [], 0
            for pad_len, n_valid in retain_meta:
                pos.extend(range(off, off + n_valid))
                off += pad_len
            compact = jnp.asarray(np.asarray(pos, np.int32))
        cat = jnp.concatenate if store == "device" else np.concatenate
        # Concatenate tap by tap, dropping each tap's chunk list as it
        # is consumed: transient peak = resident acts + ONE tap, not 2x
        # the full store (73k-scale device store is ~8.4 GB — doubling
        # it OOMs a 16 GB v5e chip).
        acts = {}
        for name in list(chunks):
            parts = chunks.pop(name)
            if parts:
                a = cat(parts, axis=0)
                if compact is not None:
                    a = a[compact]
                acts[name] = a
        _t1 = _time.perf_counter()
        if store == "device" and acts:
            # Drain the device queue before returning: every upload /
            # forward / concat above is async, and without this sync the
            # entire extraction backlog would be billed to whichever
            # downstream phase fetches first (measured: "phase-1" walls
            # of 100-164 s that were really extraction work). The work
            # must finish before selection reads the store anyway, so
            # this costs nothing and keeps phase timers truthful.
            jax.block_until_ready(list(acts.values()))
        # enqueue = host loop wall (loader + uploads + dispatch round
        # trips); drain = device backlog left when the host finished.
        # enqueue >> drain → the host/relay link is the bottleneck;
        # drain >> 0 → device compute or queue-bound.
        self.last_extract_times = {
            "enqueue_s": round(_t1 - _t0, 1),
            "drain_s": round(_time.perf_counter() - _t1, 1),
            "loader_s": round(self._feed_stats["loader_s"], 1),
            "upload_wait_s": round(self._feed_stats["upload_wait_s"], 1),
            "dispatch_s": round(dispatch_s, 1),
        }
        rprint(
            f"  SRP activations: {len(acts)} taps x {len(ids)} stimuli ({store})",
            style="success",
        )
        return acts, ids

    def extract_layers_exact(self, loader: Iterable, layer_names, stimulus_ids=None,
                             store: str = "host", batch_size: int | None = None,
                             stable_signature: bool = False):
        """Full-resolution activations for SEVERAL taps in ONE pass.

        Phase-2 re-extraction in the reference runs one forward pass
        per unique selected layer (evals.py:286-301) — on TPU terminals
        the pixel upload dominates, so re-reading/re-uploading the test
        stimuli per layer multiplies the H2D cost by the layer count.
        One pass computing every requested tap pays it once.
        Returns ({layer_name: (N, D_layer) float32}, ids).

        store="device" keeps the activations HBM-resident (jax arrays)
        so downstream RDMs run without a device→host→device round trip
        (~4 GB of exact AlexNet taps at 1000 test stimuli — minutes of
        wall-clock through a relay-attached host).
        batch_size: pad uploads to this size instead of the extractor's
        bulk batch — full-resolution taps at batch 512 hold ~2 GB of
        live f32 per program and measured ~4x slower tails on a 16 GB
        chip, so phase-2 callers cap this at 256.
        stable_signature=True captures ALL the extractor's tap points
        in the forward program regardless of which layers were
        requested (only the requested ones are accumulated; the rest
        are dropped per batch). The selected-layer set varies run to
        run, and each distinct capture tuple is a fresh ~20-30 s
        remote-relay compile — the all-points program compiles ONCE
        ever and then always hits the persistent compilation cache.
        """
        point_of = {}
        for name in layer_names:
            for p in self.points:
                if self.alias[p] == name or p == name:
                    point_of[name] = p
                    break
            else:
                raise KeyError(
                    f"Layer {name!r} not among extraction points {self.points}")
        points = tuple(dict.fromkeys(point_of.values()))
        capture = tuple(self.points) if stable_signature else points

        parts: dict[str, list] = {p: [] for p in points}
        ns: list[int] = []
        all_ids: list = []
        pending = None

        def drain(p_res, n_valid):
            if store == "device":
                # Append full padded batches untouched; the trim, the
                # stimulus_ids gather and the concat all run in ONE
                # fused tail program below — per-batch per-tap slices
                # are ~56 extra relay dispatches at phase-2 scale.
                ns.append(n_valid)
                for p in points:
                    parts[p].append(p_res[p])
            else:
                host = jax.device_get(p_res)
                for p in points:
                    parts[p].append(host[p][:n_valid])

        for xd, keys, n in self._device_feed(loader, pad_to=batch_size):
            all_ids.extend(keys)
            cur = (self._multi_step(self.state.variables, xd, capture), n)
            if pending is not None:
                drain(*pending)
            pending = cur
        if pending is not None:
            drain(*pending)

        acts = {}
        keep = None
        if stimulus_ids is not None:
            id_to_idx = {str(k): i for i, k in enumerate(all_ids)}
            keep = [id_to_idx[str(s)] for s in stimulus_ids if str(s) in id_to_idx]
            if len(keep) != len(stimulus_ids):
                # Surface the mismatch HERE: a silently smaller RDM
                # fails much later with an opaque shape error.
                rprint(
                    f"Warning: {len(stimulus_ids) - len(keep)} of "
                    f"{len(stimulus_ids)} requested stimulus_ids absent "
                    f"from the loader output (kept {len(keep)})",
                    style="warning",
                )
            all_ids = [all_ids[i] for i in keep]
        if store == "device":
            trims = tuple(ns)

            # One fused concat+trim+gather program PER LAYER, with that
            # layer's per-batch buffers dropped as soon as its program
            # is dispatched. A single all-layer program would be 1
            # dispatch instead of 14, but its inputs + concats +
            # gathered outputs coexist (~12 GB of full AlexNet f32 taps
            # at 1000 test stimuli — measured OOM on a 16 GB chip);
            # per-layer, the old buffers shrink as the outputs grow.
            def _tail_one(chunks_in, keep_arr):
                a = jnp.concatenate(
                    [c[:k] for c, k in zip(chunks_in, trims)], axis=0)
                return a if keep_arr is None else jnp.take(a, keep_arr, axis=0)

            tail = jax.jit(_tail_one)
            keep_idx = None if keep is None else jnp.asarray(keep, jnp.int32)
            consumers = {p: sum(1 for q in point_of.values() if q == p)
                         for p in points}
            for name, p in point_of.items():
                acts[name] = tail(parts[p], keep_idx)
                consumers[p] -= 1
                if consumers[p] == 0:
                    parts[p] = []
        else:
            keep_idx = None if keep is None else np.asarray(keep)
            for name, p in point_of.items():
                a = np.concatenate(parts[p], axis=0)
                parts[p] = []
                acts[name] = a[keep_idx] if keep_idx is not None else a
        rprint(
            f"  Re-extracted {len(acts)} layers in one pass "
            f"({len(all_ids)} stimuli, exact, no SRP)",
            style="success",
        )
        return acts, all_ids

    def free_projection_cache(self):
        """Drop the HBM-resident SRP matrices (~3.7 GB at AlexNet
        scale). They regenerate from the seed on the next use, so this
        is safe to call once bulk SRP extraction is done — phase-2
        exact re-extraction never touches them."""
        self.srp._cache.clear()

    def extract_single_layer_mean(self, loader: Iterable, layer_name: str,
                                  groups: dict, group_order: Sequence[str]):
        """Per-GROUP means of one tap's full-resolution activations,
        averaged ON DEVICE during extraction.

        The THINGS eval concept-averages exact (no-SRP) activations of
        ~26k images (reference: models/utils.py:350-404 feeding
        rsa.py:284-305 — fine on a local GPU, but fetching the raw
        (26k, 65k) float32 matrix moves ~6.7 GB across the device link
        before a single mean is taken). Here every batch's tap rows are
        scatter-added into a (G+1, D) accumulator inside the same
        program as the forward; only the (G, D) group means ever exist
        beyond the batch. Stimuli not in any group land in dump row G
        (alongside the zero-padded tail rows) and are discarded.

        groups: {group_key: [stimulus ids]}; group_order: output row
        order. Returns ((G, D) float32 device means, list(group_order)).
        Means are sum/count in float32 — numerically within float32
        round-off of the host np.mean path (≤ ~1e-6 relative at the
        ≤ dozens-of-images-per-concept workload scale).
        """
        point = None
        for p in self.points:
            if self.alias[p] == layer_name or p == layer_name:
                point = p
                break
        if point is None:
            raise KeyError(
                f"Layer {layer_name!r} not among extraction points {self.points}")

        seg_of = {}
        for gi, g in enumerate(group_order):
            for sid in groups[g]:
                seg_of[str(sid)] = gi
        G = len(group_order)
        D = self.tap_dims[self.alias[point]]

        acc = jnp.zeros((G + 1, D), jnp.float32)
        counts = np.zeros(G, np.int64)
        for xd, keys, n in self._device_feed(loader):
            seg = np.full(xd.shape[0], G, np.int32)
            for i, k in enumerate(keys[:n]):
                seg[i] = seg_of.get(str(k), G)
            np.add.at(counts, seg[:n][seg[:n] < G], 1)
            acc = self._seg_step(acc, self.state.variables,
                                 jnp.asarray(seg), xd, point)
        if (counts == 0).any():
            rprint(
                f"Warning: {int((counts == 0).sum())} of {G} groups matched "
                "no stimuli in the loader output (zero rows)",
                style="warning",
            )
        denom = jnp.asarray(np.maximum(counts, 1), jnp.float32)[:, None]
        means = acc[:G] / denom
        rprint(
            f"  Re-extracted {layer_name}: {G} group means of dim {D} "
            "(exact, no SRP, device-averaged)",
            style="success",
        )
        return means, list(group_order)

    # ── exact single-layer re-extraction (no SRP) ────────────────
    def extract_single_layer(self, loader: Iterable, layer_name: str, stimulus_ids=None):
        """Full-resolution activations for ONE tap point.

        Reference: models/utils.py:350-404 — optional reorder/filter to
        ``stimulus_ids``.
        """
        point = None
        for p in self.points:
            if self.alias[p] == layer_name or p == layer_name:
                point = p
                break
        if point is None:
            raise KeyError(f"Layer {layer_name!r} not among extraction points {self.points}")

        parts, all_ids = [], []
        pending = None

        for xd, keys, n in self._device_feed(loader):
            all_ids.extend(keys)
            cur = (self._single_step(self.state.variables, xd, point), n)
            if pending is not None:
                parts.append(jax.device_get(pending[0])[: pending[1]])
            pending = cur
        if pending is not None:
            parts.append(jax.device_get(pending[0])[: pending[1]])

        acts = np.concatenate(parts, axis=0)
        if stimulus_ids is not None:
            id_to_idx = {str(k): i for i, k in enumerate(all_ids)}
            keep = [id_to_idx[str(s)] for s in stimulus_ids if str(s) in id_to_idx]
            if len(keep) != len(stimulus_ids):
                rprint(
                    f"Warning: {len(stimulus_ids) - len(keep)} of "
                    f"{len(stimulus_ids)} requested stimulus_ids absent "
                    f"from the loader output (kept {len(keep)})",
                    style="warning",
                )
            acts = acts[keep]
            all_ids = [all_ids[i] for i in keep]
        rprint(f"  Re-extracted {layer_name}: {acts.shape} (exact, no SRP)", style="success")
        return acts, all_ids


def configure_feature_extractor(
    cfg, state: ModelState, verbose: bool = False, mesh=None
) -> FeatureExtractor:
    """Build a FeatureExtractor from an eval config.

    Reference: visreps/models/utils.py:262-278.
    """
    return_nodes = list(cfg.get("return_nodes") or [])
    if not return_nodes:
        raise ValueError("return_nodes must be specified in config")
    extractor = FeatureExtractor(
        state,
        return_nodes,
        extract_pre_and_post=cfg.get("extract_pre_and_post", True),
        srp_k=cfg.get("srp_k", 4096),
        srp_seed=cfg.get("srp_seed", 0),
        batch_size=cfg.get("batchsize", 128),
        image_size=cfg.get("image_size", 224),
        mesh=mesh,
    )
    n_points = len(extractor.points)
    suffix = f" ({len(return_nodes)} layers x pre/post)" if cfg.get("extract_pre_and_post", True) else ""
    rprint(f"  {n_points} extraction points{suffix}", style="success")
    if verbose:
        rprint(f"    Points: {extractor.points}", style="info")
    return extractor
