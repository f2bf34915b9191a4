"""Threaded prefetching batch loader (the DataLoader replacement).

The reference leans on torch DataLoader worker PROCESSES with
pin_memory + prefetch_factor (visreps/dataloaders/obj_cls.py:256-269).
Here decode/transform runs in a thread pool (PIL decode releases the
GIL) with a bounded prefetch queue of fully-assembled numpy batches;
the device pipeline (models/extractor.py, train/trainer.py) overlaps
H2D transfer and compute one batch deep on top of this.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

import numpy as np


class PrefetchLoader:
    """Iterates (batch_array, meta_list) with background batch assembly.

    dataset: indexable returning (np.ndarray HWC, meta) per item.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 128,
        shuffle: bool = False,
        num_workers: int = 16,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.RandomState(self.seed + self._epoch)
        return rng.permutation(n)

    def __iter__(self):
        order = self._index_order()
        self._epoch += 1
        n = len(order)
        bounds = range(0, n - self.batch_size + 1 if self.drop_last else n, self.batch_size)
        batches = [order[i: i + self.batch_size] for i in bounds]
        native_batch = getattr(self.dataset, "native_batch", None)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def assemble(idxs):
            if native_batch is not None:
                out = native_batch(idxs, n_threads=self.num_workers)
                if out is not None:
                    return out
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                items = list(pool.map(self.dataset.__getitem__, idxs))
            arrs, metas = zip(*items)
            return np.stack(arrs), list(metas)

        def produce():
            for idxs in batches:
                if stop.is_set():
                    break
                q.put(assemble(idxs))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def _batch_array_fast(batch: np.ndarray, spec: dict) -> np.ndarray | None:
    """Batched twin of transforms._array_fast: uint8 HWC arrays whose
    shorter side equals the resize size reduce the whole transform to a
    center-crop slice (+ optional normalize) — same offsets, same
    arithmetic, applied to the (B, H, W, 3) stack in one pass."""
    if (spec["augment"] or batch.ndim != 4 or batch.shape[3] != 3
            or batch.dtype != np.uint8):
        return None
    h, w = batch.shape[1:3]
    crop = spec["crop"]
    if min(h, w) != spec["resize"] or h < crop or w < crop:
        return None
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    out = batch[:, top: top + crop, left: left + crop]
    if not spec.get("normalize", True):
        return np.ascontiguousarray(out)
    mean = np.asarray(spec["mean"], np.float32)
    std = np.asarray(spec["std"], np.float32)
    return (np.asarray(out, np.float32) / 255.0 - mean) / std


class StimuliDataset:
    """Sorted-key stimulus dataset: path / ndarray / PIL values.

    Reference: visreps/dataloaders/neural.py:464-503 (_StimuliDataset) —
    deterministic sorted-key ordering, returns (image, stimulus_id).
    """

    def __init__(self, stimuli, transform):
        import os

        self.keys = sorted(stimuli.keys())
        self.stimuli = stimuli  # may be a lazy dict (HDF5)
        self.transform = transform
        # Transformed-output cache: evals that pass over the same
        # stimuli twice (THINGS/TVSD bulk SRP extraction + exact
        # re-extraction, reference evals.py:140-144) pay the JPEG
        # decode — the host bottleneck on this 1-CPU box — twice for
        # identical pixels. Cache the transformed arrays when the whole
        # set fits under VISREPS_DECODE_CACHE_MAX bytes (default 8 GB;
        # 0 disables). Deterministic transforms only.
        self._cache: dict | None = None
        spec = getattr(transform, "spec", None)
        if spec is not None and not spec["augment"]:
            bpp = 4 if spec.get("normalize", True) else 1
            est = len(self.keys) * spec["crop"] * spec["crop"] * 3 * bpp
            cap = float(os.environ.get("VISREPS_DECODE_CACHE_MAX", 8e9))
            if 0 < est < cap:
                self._cache = {}

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, idx):
        from visreps_tpu.data.transforms import load_image

        if self._cache is not None and idx in self._cache:
            return self._cache[idx], self.keys[idx]
        key = self.keys[idx]
        val = self.stimuli[key]
        if getattr(self.transform, "accepts_raw", False):
            # get_transform closures take raw values and use a PIL-free
            # fast path for identity-resize uint8 arrays (HDF5 bricks).
            if not isinstance(val, (str, np.ndarray)):
                val = np.asarray(val) if not hasattr(val, "convert") else val
            out = self.transform(val)
        else:
            out = self.transform(load_image(val))
        if self._cache is not None:
            self._cache[idx] = out
        return out, key

    def native_batch(self, idxs, n_threads: int = 16):
        """C++ decode when every requested stimulus is a JPEG/PNG path.

        Covers both transform modes: normalized float32, and the
        uint8_transfer path (normalize=False) — there the decoder runs
        with identity mean / std=1/255 so its output IS the resampled
        0..255 image, rounded to uint8. Without this, uint8 pipelines
        silently fell back to per-item threaded PIL (~2x slower on this
        1-CPU host) while float pipelines used the C++ decoder — the
        two modes decoded through different code paths.
        """
        spec = getattr(self.transform, "spec", None)
        if spec is None or spec["augment"]:
            return None
        idxs = list(idxs)
        if self._cache is not None and all(i in self._cache for i in idxs):
            return (np.stack([self._cache[i] for i in idxs]),
                    [self.keys[i] for i in idxs])
        get_batch = getattr(self.stimuli, "get_batch", None)
        if get_batch is not None and not spec.get("normalize", True):
            # Bulk-readable store (HDF5 brick), uint8 feed: one h5py
            # run-sliced read for the batch, then the same
            # identity-resize center-crop math as the per-item uint8
            # fast path, vectorized over the batch. (The float feed
            # stays per-item: its normalize arithmetic parallelizes
            # over decode threads, while one batched float pass is
            # single-threaded and slower.)
            # Pre-check the store's per-item shape/dtype against the
            # spec from h5py METADATA before issuing the bulk read — a
            # mismatched store would have _batch_array_fast decline
            # AFTER the brick I/O, and the per-item fallback then pays
            # the read twice (ADVICE r4).
            item_spec = getattr(self.stimuli, "item_spec", None)
            eligible = True
            if item_spec is not None:
                shape, dtype = item_spec()
                crop = spec["crop"]
                eligible = (len(shape) == 3 and shape[2] == 3
                            and dtype == np.uint8
                            and min(shape[0], shape[1]) == spec["resize"]
                            and shape[0] >= crop and shape[1] >= crop)
            if eligible:
                keys = [self.keys[i] for i in idxs]
                out = _batch_array_fast(get_batch(keys), spec)
                if out is not None:
                    if self._cache is not None:
                        for j, i in enumerate(idxs):
                            self._cache[i] = out[j]
                    return out, keys
        keys, paths = [], []
        for i in idxs:
            key = self.keys[i]
            val = self.stimuli[key]
            if not isinstance(val, str) or not val.lower().endswith((".jpg", ".jpeg", ".png")):
                return None
            keys.append(key)
            paths.append(val)
        try:
            from visreps_tpu.native import (decode_batch, decode_batch_u8,
                                            native_available)
        except ImportError:
            return None
        if not native_available():
            return None
        if spec.get("normalize", True):
            batch = decode_batch(
                paths, spec["resize"], spec["crop"], spec["mean"], spec["std"],
                n_threads=n_threads,
            )
        else:
            # Direct uint8 emit in C++: the former float round-trip
            # (decode with std=1/255 + numpy rint/clip/astype) ran at
            # 170 img/s vs 836 img/s threaded PIL on the 1-CPU host —
            # it was the TVSD/THINGS extraction bottleneck on chip.
            batch = decode_batch_u8(
                paths, spec["resize"], spec["crop"], n_threads=n_threads,
            )
        if self._cache is not None:
            for j, i in enumerate(idxs):
                self._cache[i] = batch[j]
        return batch, keys


def make_stimuli_loader(stimuli, transform, batch_size: int, num_workers: int = 16) -> PrefetchLoader:
    """shuffle=False loader over a stimulus dict.

    Reference: visreps/dataloaders/neural.py:513-523 (_make_loader).
    """
    return PrefetchLoader(
        StimuliDataset(stimuli, transform),
        batch_size=batch_size,
        shuffle=False,
        num_workers=num_workers,
    )


class LabeledDataset:
    """(image, int_label) dataset over (path, label, img_id) samples."""

    def __init__(self, samples: Sequence, transform: Callable):
        self.samples = list(samples)
        self.transform = transform
        self._native_rng = np.random.RandomState(0)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        from visreps_tpu.data.transforms import load_image

        path, label, _ = self.samples[idx]
        return self.transform(load_image(path)), label

    def native_batch(self, idxs, n_threads: int = 16):
        """Batch decode via the C++ pipeline when eligible, else None.

        Eligible: native lib built, standard transform spec, all-JPEG
        paths. Augmentation degrades to horizontal flip only (the
        reference's ±10° rotation is PIL-only; pass
        ``data_augment=False`` + rotation-free training for exact
        parity with the native path).
        """
        import os

        spec = getattr(self.transform, "spec", None)
        if spec is None or not spec.get("normalize", True):
            return None
        if spec["augment"] and os.environ.get("VISREPS_NATIVE_AUGMENT") != "1":
            # Default training path keeps PIL (flip + rotation) for
            # reference parity; opt in to flip-only native augment.
            return None
        paths, labels = [], []
        for i in idxs:
            path, label, _ = self.samples[i]
            if not isinstance(path, str) or not path.lower().endswith((".jpg", ".jpeg", ".png")):
                return None
            paths.append(path)
            labels.append(label)
        try:
            from visreps_tpu.native import decode_batch, native_available
        except ImportError:
            return None
        if not native_available():
            return None
        hflip = None
        if spec["augment"]:
            hflip = (self._native_rng.rand(len(paths)) < 0.5).astype(np.uint8)
        batch = decode_batch(
            paths, spec["resize"], spec["crop"], spec["mean"], spec["std"],
            hflip=hflip, n_threads=n_threads,
        )
        return batch, labels


def collate_labels(loader):
    """Adapt (batch, metas) → (batch, np.int32 labels)."""
    for batch, metas in loader:
        yield batch, np.asarray(metas, np.int32)
