"""Synthetic full-scale NSD benchmark fixture on disk.

Builds (once, cached under ~/.cache/visreps_bench_fixture) the on-disk
shape of the real NSD eval inputs at the BASELINE.md workload scale:

  * nsd_stimuli.hdf5 — "imgBrick" uint8 (73000, 256, 256, 3). The real
    brick stores 425×425; 256 keeps the fixture at ~14 GB while still
    exercising the resize→crop→normalize path end to end.
  * nsd_data.pkl — 8 subjects × 6 regions; each subject sees the 1000
    shared stimuli + its own 9000 unique stimuli (ids partitioned so
    the union is exactly 73000, matching NSD's structure). Responses
    are 512 voxels/region float32 (full NSD ventral is 7604; the
    neural-RDM cost is linear in voxels and ~2 % of the budget — the
    reduction keeps the pickle under 1 GB and is disclosed in the
    bench output).
  * jpeg/ — 8192 JPEG files for the native-decoder throughput metric.

Pixels are synthetic (the VERDICT allows this) but every byte flows
through the real loaders: LazyHdf5Dict, PIL/native decode, transforms.
"""
from __future__ import annotations

import json
import os
import pickle
import time
from pathlib import Path

import numpy as np

FIXTURE_DIR = Path(os.environ.get("VISREPS_BENCH_FIXTURE",
                                  "/root/.cache/visreps_bench_fixture"))


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


# Scale knobs (env-overridable so CI can smoke the measured-e2e path at
# tiny scale; the defaults are the BASELINE.md workload).
N_SHARED = _env_int("VISREPS_BENCH_N_SHARED", 1000)
N_UNIQUE = _env_int("VISREPS_BENCH_N_UNIQUE", 9000)
N_SUBJECTS = _env_int("VISREPS_BENCH_N_SUBJECTS", 8)
REGIONS = ["early", "ventral", "V1", "V2", "V3", "hV4"][
    : _env_int("VISREPS_BENCH_N_REGIONS", 6)]
N_VOXELS = _env_int("VISREPS_BENCH_N_VOXELS", 512)
N_STIMULI = N_SHARED + N_SUBJECTS * N_UNIQUE  # 73000 at default scale
IMG_SIZE = _env_int("VISREPS_BENCH_IMG_SIZE", 256)
N_JPEG = _env_int("VISREPS_BENCH_N_JPEG", 8192)


def _write_hdf5(path: Path):
    import h5py

    rng = np.random.Generator(np.random.PCG64(0))
    chunk = 2048
    with h5py.File(path, "w") as f:
        d = f.create_dataset("imgBrick", (N_STIMULI, IMG_SIZE, IMG_SIZE, 3),
                             dtype=np.uint8, chunks=(8, IMG_SIZE, IMG_SIZE, 3))
        for start in range(0, N_STIMULI, chunk):
            n = min(chunk, N_STIMULI - start)
            d[start:start + n] = rng.integers(
                0, 256, (n, IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)


def _write_pickle(path: Path):
    rng = np.random.Generator(np.random.PCG64(1))
    shared_ids = list(range(N_SHARED))
    data = {}
    for region in REGIONS:
        data[region] = {}
        for subj in range(N_SUBJECTS):
            unique = list(range(N_SHARED + subj * N_UNIQUE,
                                N_SHARED + (subj + 1) * N_UNIQUE))
            ids = shared_ids + unique
            data[region][subj] = {
                "stimulus": ids,
                "values": rng.standard_normal(
                    (len(ids), N_VOXELS), dtype=np.float32),
            }
    with open(path, "wb") as f:
        pickle.dump({"shared_ids": shared_ids, "data": data}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)


def _write_jpegs(root: Path):
    from PIL import Image

    rng = np.random.Generator(np.random.PCG64(2))
    root.mkdir(parents=True, exist_ok=True)
    base = rng.integers(0, 256, (64, IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
    for i in range(N_JPEG):
        # vary each file slightly so decoders can't trivially dedup
        arr = np.roll(base[i % 64], shift=i % IMG_SIZE, axis=1)
        Image.fromarray(arr).save(root / f"img_{i:05d}.jpg", quality=85)


def ensure_fixture() -> dict:
    """Create the fixture if absent; return paths + build metadata."""
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    meta_path = FIXTURE_DIR / "meta.json"
    h5 = FIXTURE_DIR / "nsd_stimuli.hdf5"
    pkl = FIXTURE_DIR / "nsd_data.pkl"
    jpeg_dir = FIXTURE_DIR / "jpeg"

    if meta_path.exists() and h5.exists() and pkl.exists():
        meta = json.loads(meta_path.read_text())
        same_scale = (
            meta.get("n_stimuli") == N_STIMULI
            and meta.get("n_subjects") == N_SUBJECTS
            and meta.get("regions") == REGIONS
            and meta.get("n_voxels_per_region") == N_VOXELS
            and meta.get("img_size") == IMG_SIZE
        )
        if same_scale:
            return meta

    t0 = time.time()
    _write_hdf5(h5)
    _write_pickle(pkl)
    _write_jpegs(jpeg_dir)
    meta = {
        "hdf5": str(h5), "pickle": str(pkl), "jpeg_dir": str(jpeg_dir),
        "n_stimuli": N_STIMULI, "n_subjects": N_SUBJECTS,
        "regions": REGIONS, "n_voxels_per_region": N_VOXELS,
        "img_size": IMG_SIZE, "n_jpeg": N_JPEG,
        "build_s": round(time.time() - t0, 1),
    }
    meta_path.write_text(json.dumps(meta))
    return meta
