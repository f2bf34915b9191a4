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


# ── additional workload fixtures (VERDICT r3 item 2) ─────────────
# THINGS / TVSD / NSD-Synthetic at BASELINE.md scale, sharing one JPEG
# pool: the loaders read each stimulus ID's own path, so pointing many
# IDs at a pool of distinct JPEG files preserves the decode + H2D
# workload shape without writing 26k unique images.

THINGS_CONCEPTS = _env_int("VISREPS_BENCH_THINGS_CONCEPTS", 1854)
THINGS_IMGS_PER_CONCEPT = _env_int("VISREPS_BENCH_THINGS_IPC", 14)  # ≈26k
THINGS_EMB_DIM = 66
TVSD_CONCEPTS = _env_int("VISREPS_BENCH_TVSD_CONCEPTS", 1854)
TVSD_IMGS_PER_CONCEPT = _env_int("VISREPS_BENCH_TVSD_IPC", 12)  # 22,248
TVSD_N_TEST = _env_int("VISREPS_BENCH_TVSD_N_TEST", 100)
TVSD_N_SITES = _env_int("VISREPS_BENCH_TVSD_N_SITES", 256)
NSDSYN_N_STIMULI = _env_int("VISREPS_BENCH_NSDSYN_N", 220)


def _ensure_jpeg_pool() -> Path:
    jpeg_dir = FIXTURE_DIR / "jpeg"
    if not jpeg_dir.exists() or len(os.listdir(jpeg_dir)) < N_JPEG:
        _write_jpegs(jpeg_dir)
    return jpeg_dir


def ensure_things_fixture() -> dict:
    """things_split.pkl (concept embeddings + image ids + paths) under a
    chdir-able root (load_things_data reads a CWD-relative path,
    reference: visreps/dataloaders/neural.py:313-335)."""
    root = FIXTURE_DIR / "things_root"
    meta_path = root / "meta.json"
    n_images = THINGS_CONCEPTS * THINGS_IMGS_PER_CONCEPT
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if (meta.get("n_concepts") == THINGS_CONCEPTS
                and meta.get("n_images") == n_images):
            return meta

    pool = sorted(os.listdir(_ensure_jpeg_pool()))
    pool_paths = [str(FIXTURE_DIR / "jpeg" / f) for f in pool]
    rng = np.random.Generator(np.random.PCG64(3))
    embeddings, image_ids, image_paths = {}, {}, {}
    k = 0
    for c in range(THINGS_CONCEPTS):
        concept = f"concept{c:04d}"
        embeddings[concept] = rng.standard_normal(THINGS_EMB_DIM).astype(np.float32)
        ids = [f"{concept}_{i:02d}" for i in range(THINGS_IMGS_PER_CONCEPT)]
        image_ids[concept] = ids
        for sid in ids:
            image_paths[sid] = pool_paths[k % len(pool_paths)]
            k += 1

    pkl_dir = root / "datasets" / "neural" / "things"
    pkl_dir.mkdir(parents=True, exist_ok=True)
    with open(pkl_dir / "things_split.pkl", "wb") as f:
        pickle.dump({"embeddings": embeddings, "image_ids": image_ids,
                     "image_paths": image_paths}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    meta = {"root": str(root), "n_concepts": THINGS_CONCEPTS,
            "n_images": n_images}
    meta_path.write_text(json.dumps(meta))
    return meta


def ensure_tvsd_fixture() -> dict:
    """fmri_responses.pkl (2 monkeys × V1/V4/IT, 22,248 train / 100
    test) + THINGS-convention image symlinks into the JPEG pool
    (reference: visreps/dataloaders/neural.py:393-460)."""
    root = FIXTURE_DIR / "tvsd_root"
    meta_path = root / "meta.json"
    n_train = TVSD_CONCEPTS * TVSD_IMGS_PER_CONCEPT
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if meta.get("n_train") == n_train and meta.get("n_test") == TVSD_N_TEST:
            return meta

    pool = sorted(os.listdir(_ensure_jpeg_pool()))
    pool_paths = [FIXTURE_DIR / "jpeg" / f for f in pool]

    train_ids = [f"concept{c:04d}_{i:02d}"
                 for c in range(TVSD_CONCEPTS)
                 for i in range(TVSD_IMGS_PER_CONCEPT)]
    test_ids = [f"testconcept{j:04d}_00" for j in range(TVSD_N_TEST)]

    # THINGS image-path convention: images/object_images/<concept>/<sid>.jpg
    bonner = root / "bonner" / "hebart2019.things" / "images" / "object_images"
    for k, sid in enumerate(train_ids + test_ids):
        concept = "_".join(sid.split("_")[:-1])
        d = bonner / concept
        d.mkdir(parents=True, exist_ok=True)
        link = d / f"{sid}.jpg"
        if not link.exists():
            os.symlink(pool_paths[k % len(pool_paths)], link)

    rng = np.random.Generator(np.random.PCG64(4))
    data = {}
    for region in ("V1", "V4", "IT"):
        data[region] = {}
        for subj in (0, 1):
            data[region][subj] = {
                "train": {"stimulus": list(train_ids),
                          "values": rng.standard_normal(
                              (n_train, TVSD_N_SITES)).astype(np.float32)},
                "test": {"stimulus": list(test_ids),
                         "values": rng.standard_normal(
                             (TVSD_N_TEST, TVSD_N_SITES)).astype(np.float32)},
            }
    pkl_dir = root / "datasets" / "neural" / "tvsd"
    pkl_dir.mkdir(parents=True, exist_ok=True)
    with open(pkl_dir / "fmri_responses.pkl", "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
    meta = {"root": str(root), "bonner_home": str(root / "bonner"),
            "n_train": n_train, "n_test": TVSD_N_TEST,
            "n_sites": TVSD_N_SITES}
    meta_path.write_text(json.dumps(meta))
    return meta


def ensure_nsd_synthetic_fixture() -> dict:
    """nsd_synthetic_data.pkl (220 shared stimuli × 8 subjects × 6
    regions) + stimuli/<name>.png (reference: visreps/dataloaders/
    neural.py:192-241)."""
    root = FIXTURE_DIR / "nsd_synthetic"
    meta_path = root / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if (meta.get("n_stimuli") == NSDSYN_N_STIMULI
                and meta.get("n_subjects") == N_SUBJECTS
                and meta.get("regions") == REGIONS):
            return meta

    from PIL import Image

    stim_dir = root / "stimuli"
    stim_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(5))
    names = [f"synth{i:03d}" for i in range(NSDSYN_N_STIMULI)]
    for n in names:
        arr = rng.integers(0, 256, (IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
        Image.fromarray(arr).save(stim_dir / f"{n}.png")

    data = {}
    for region in REGIONS:
        data[region] = {}
        for subj in range(N_SUBJECTS):
            data[region][subj] = {
                "stimulus": list(names),
                "values": rng.standard_normal(
                    (len(names), N_VOXELS)).astype(np.float32),
            }
    with open(root / "nsd_synthetic_data.pkl", "wb") as f:
        pickle.dump({"shared_stimulus_names": names, "data": data}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    meta = {"root": str(root), "n_stimuli": NSDSYN_N_STIMULI,
            "n_subjects": N_SUBJECTS, "regions": REGIONS,
            "n_voxels": N_VOXELS}
    meta_path.write_text(json.dumps(meta))
    return meta


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
