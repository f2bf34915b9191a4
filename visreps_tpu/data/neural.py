"""Neural dataset loaders: NSD, NSD-Synthetic, THINGS, TVSD, Cusack2025.

Reference parity: visreps/dataloaders/neural.py. The on-disk pickle
formats are fixed inputs; loaders accept BOTH the reference's
xarray-based pickles (when xarray is importable) and a plain-dict
response format ``{"stimulus": [ids], "values": (n_stim, n_voxels)}``
(producible with scripts/preprocess_data/*). Lazy HDF5 stimulus reads
are preserved for the 73k-image NSD imgBrick (~36 GB materialized).
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict

import numpy as np

from visreps_tpu.core.env import get_env_var, load_pickle
from visreps_tpu.data.loader import make_stimuli_loader
from visreps_tpu.data.transforms import get_transform

logger = logging.getLogger(__name__)

_NSD_REGION_MAP = {
    "early visual stream": "early",
    "ventral visual stream": "ventral",
    "V1": "V1",
    "V2": "V2",
    "V3": "V3",
    "hV4": "hV4",
    "FFA": "FFA",
    "PPA": "PPA",
}
_NSD_SUBJECTS = list(range(8))
_TVSD_REGIONS = ["V1", "V4", "IT"]
_TVSD_SUBJECTS = [0, 1]

NSD_STIMULI_HDF5 = os.environ.get(
    "NSD_STIMULI_HDF5",
    "/data/shared/datasets/allen2021.natural_scenes/nsddata_stimuli/stimuli/nsd/nsd_stimuli.hdf5",
)


# ── response-array adapter (xarray or plain dict) ────────────────
class ResponseArray:
    """Uniform view over an xarray.DataArray or a plain-dict response set."""

    def __init__(self, obj: Any):
        if hasattr(obj, "coords"):  # xarray.DataArray
            self.ids = [s for s in np.asarray(obj.coords["stimulus"].values)]
            self._values = np.asarray(obj.values)
        elif isinstance(obj, dict) and "stimulus" in obj:
            self.ids = list(obj["stimulus"])
            self._values = np.asarray(obj["values"])
        else:
            raise TypeError(f"Unsupported response container: {type(obj)}")
        self._index = {self._key(s): i for i, s in enumerate(self.ids)}

    @staticmethod
    def _key(s):
        return str(s)

    def sel(self, stim_id) -> np.ndarray:
        return self._values[self._index[self._key(stim_id)]]

    def to_dict(self, ids=None) -> Dict[str, np.ndarray]:
        ids = ids if ids is not None else self.ids
        return {str(i): self.sel(i) for i in ids}


# ── lazy HDF5 stimuli ────────────────────────────────────────────
class LazyHdf5Dict:
    """Dict-like on-demand reader over an HDF5 image brick.

    Reference: visreps/dataloaders/neural.py:78-114.
    """

    def __init__(self, hdf5_path: str, dataset_name: str, indices):
        self._path = hdf5_path
        self._name = dataset_name
        self._index_map = {str(i): int(i) for i in indices}
        self._keys_sorted = sorted(self._index_map, key=int)
        self._file = None

    def _open(self):
        if self._file is None:
            import h5py

            self._file = h5py.File(self._path, "r")
        return self._file

    def __contains__(self, key):
        return str(key) in self._index_map

    def __len__(self):
        return len(self._index_map)

    def keys(self):
        return self._keys_sorted

    def __getitem__(self, key):
        k = str(key)
        if k not in self._index_map:
            raise KeyError(key)
        return self._open()[self._name][self._index_map[k]]

    def item_spec(self):
        """(per-item shape, dtype) from HDF5 metadata — cheap (no data
        read), so loaders can decide whether the batched fast path will
        accept the store BEFORE paying the bulk brick read."""
        dset = self._open()[self._name]
        return tuple(dset.shape[1:]), dset.dtype

    def get_batch(self, keys) -> "np.ndarray":
        """One h5py read for a whole batch of keys.

        Per-item __getitem__ pays h5py's per-call overhead ~73k times
        over the NSD brick (the dominant loader wall at e2e scale);
        batch reads are a contiguous slice when the sorted-key batch
        maps to consecutive rows (the common case — loaders iterate
        keys sorted), else one fancy-index read.
        """
        import numpy as np

        idxs = np.asarray([self._index_map[str(k)] for k in keys])
        dset = self._open()[self._name]
        if (np.diff(idxs) == 1).all():
            return np.asarray(dset[int(idxs[0]): int(idxs[0]) + len(idxs)])
        # Scattered batch (string-sorted int keys interleave digit
        # groups): read ascending CONTIGUOUS RUNS as slices — h5py
        # fancy indexing at this granularity is ~7x slower than the
        # per-item path, while run slices beat both.
        order = np.argsort(idxs, kind="stable")
        s = idxs[order]
        out = np.empty((len(idxs), *dset.shape[1:]), dset.dtype)
        run_start = 0
        for i in range(1, len(s) + 1):
            if i == len(s) or s[i] != s[i - 1] + 1:
                block = dset[int(s[run_start]): int(s[i - 1]) + 1]
                out[order[run_start:i]] = block
                run_start = i
        return out

    def __del__(self):
        if self._file is not None:
            try:
                self._file.close()
            except Exception:
                pass  # h5py may already be finalized at interpreter exit


# ── NSD ──────────────────────────────────────────────────────────
def load_nsd_data(cfg) -> tuple[dict, dict]:
    """Single (region, subject): {"train"/"test": {sid: resp}}, stimuli."""
    region_key = _NSD_REGION_MAP.get(cfg["region"], cfg["region"])
    subj = cfg["subject_idx"]
    nsd = load_pickle(os.path.join(get_env_var("NSD_DATA_DIR"), "nsd_data.pkl"))
    shared = set(nsd["shared_ids"])
    arr = ResponseArray(nsd["data"][region_key][subj])
    stim_ids = [int(i) for i in arr.ids]
    train_ids = [str(i) for i in stim_ids if i not in shared]
    test_ids = [str(i) for i in stim_ids if i in shared]
    targets = {
        "train": {i: arr.sel(int(i)) for i in train_ids},
        "test": {i: arr.sel(int(i)) for i in test_ids},
    }
    stimuli = LazyHdf5Dict(NSD_STIMULI_HDF5, "imgBrick", stim_ids)
    return targets, stimuli


def load_all_nsd_data(cfg, subjects=None, regions=None) -> Dict:
    """All requested (subject, region) pairs + shared-test intersection.

    Reference: visreps/dataloaders/neural.py:121-188.
    """
    subjects = subjects if subjects is not None else _NSD_SUBJECTS
    region_pairs = [(pkl, name) for name, pkl in _NSD_REGION_MAP.items()
                    if regions is None or name in regions]
    nsd = load_pickle(os.path.join(get_env_var("NSD_DATA_DIR"), "nsd_data.pkl"))
    shared = set(nsd["shared_ids"])
    # Protocol-exact shared-test set under subject sharding: a worker
    # processing a subject SUBSET must still intersect test ids over the
    # FULL subject list (cfg.shared_test_subjects), else its
    # intersection can be a superset of the 8-subject one and its
    # scores drift from the single-process run.
    test_subjects = None
    if cfg is not None and hasattr(cfg, "get"):
        test_subjects = cfg.get("shared_test_subjects")

    neural: Dict = {}
    all_ids: set = set()
    per_subject_test: list[set] = []
    for region_key, region_full in region_pairs:
        neural[region_full] = {}
        for subj in subjects:
            arr = ResponseArray(nsd["data"][region_key][subj])
            stim_ids = [int(i) for i in arr.ids]
            all_ids.update(stim_ids)
            train_ids = [str(i) for i in stim_ids if i not in shared]
            test_ids = [str(i) for i in stim_ids if i in shared]
            neural[region_full][subj] = {
                "train": {i: arr.sel(int(i)) for i in train_ids},
                "test": {i: arr.sel(int(i)) for i in test_ids},
            }
            if region_key == region_pairs[0][0]:
                per_subject_test.append(set(test_ids))

    if test_subjects is not None:
        for subj in test_subjects:
            if subj in subjects:
                continue  # already counted above
            arr = ResponseArray(nsd["data"][region_pairs[0][0]][subj])
            per_subject_test.append(
                {str(int(i)) for i in arr.ids if int(i) in shared})

    shared_test_ids = sorted(set.intersection(*per_subject_test), key=int)
    stimuli = LazyHdf5Dict(NSD_STIMULI_HDF5, "imgBrick", all_ids)
    logger.info(
        "Loaded NSD: %d subjects x %d regions, %d stimuli, %d shared test IDs",
        len(subjects), len(region_pairs), len(stimuli), len(shared_test_ids),
    )
    return {
        "regions": [f for _, f in region_pairs],
        "subjects": list(subjects),
        "neural": neural,
        "stimuli": stimuli,
        "shared_test_ids": shared_test_ids,
    }


# ── NSD Synthetic ────────────────────────────────────────────────
def load_nsd_synthetic_test_data(cfg, subjects=None, regions=None) -> Dict:
    """220 shared synthetic test stimuli per (region, subject).

    Reference: visreps/dataloaders/neural.py:192-241.
    """
    subjects = subjects if subjects is not None else _NSD_SUBJECTS
    region_pairs = [(pkl, name) for name, pkl in _NSD_REGION_MAP.items()
                    if regions is None or name in regions]
    root = get_env_var("NSD_SYNTHETIC_DATA_DIR")
    synth = load_pickle(os.path.join(root, "nsd_synthetic_data.pkl"))
    names = synth["shared_stimulus_names"]

    neural: Dict = {}
    for region_key, region_full in region_pairs:
        neural[region_full] = {}
        for subj in subjects:
            arr = ResponseArray(synth["data"][region_key][subj])
            neural[region_full][subj] = {s: arr.sel(s) for s in names}

    stimuli = {n: os.path.join(root, "stimuli", f"{n}.png") for n in names}
    return {
        "regions": [f for _, f in region_pairs],
        "subjects": list(subjects),
        "neural": neural,
        "stimuli": stimuli,
        "test_ids": list(names),
    }


def load_nsd_synthetic_data(cfg) -> tuple[dict, dict]:
    """Single-(region,subject) synthetic responses + stimuli pickles.

    Reference: visreps/dataloaders/neural.py:245-273.
    """
    region, subj = cfg["region"], cfg["subject_idx"]
    root = get_env_var("NSD_SYNTHETIC_DATA_DIR")
    fmri = load_pickle(os.path.join(root, "fmri_responses.pkl"))[region][subj]
    images = {str(k): v for k, v in
              load_pickle(os.path.join(root, f"stimuli_subject_{subj}.pkl")).items()}
    ids = {str(k) for k in fmri} & images.keys()
    return {i: fmri[i] for i in ids}, {i: images[i] for i in ids}


# ── THINGS behavioral ────────────────────────────────────────────
def load_things_data() -> tuple[dict, dict]:
    """Concept embeddings + per-concept image IDs + image paths.

    Reference: visreps/dataloaders/neural.py:313-335.
    """
    pkl = os.path.join("datasets", "neural", "things", "things_split.pkl")
    data = load_pickle(pkl)
    return {"embeddings": data["embeddings"], "image_ids": data["image_ids"]}, data["image_paths"]


# ── TVSD macaque ─────────────────────────────────────────────────
def _tvsd_things_image_path(sid: str, things_root: str) -> str | None:
    concept = "_".join(sid.split("_")[:-1])
    path = os.path.join(things_root, "images", "object_images", concept, f"{sid}.jpg")
    if os.path.exists(path):
        return path
    logger.warning("TVSD image not found: %s", path)
    return None


def _things_root() -> str:
    return os.path.join(
        os.environ.get("BONNER_DATASETS_HOME", os.path.expanduser("~/.cache/bonner-datasets")),
        "hebart2019.things",
    )


def load_tvsd_data(cfg) -> tuple[dict, dict]:
    region, subj = cfg["region"], cfg["subject_idx"]
    splits = load_pickle(os.path.join("datasets", "neural", "tvsd", "fmri_responses.pkl"))[region][subj]
    root = _things_root()
    targets, img_paths = {}, {}
    for split_name, obj in splits.items():
        arr = ResponseArray(obj)
        ids = [str(s) for s in arr.ids]
        targets[split_name] = {sid: arr.sel(sid) for sid in ids}
        for sid in ids:
            if sid not in img_paths:
                p = _tvsd_things_image_path(sid, root)
                if p:
                    img_paths[sid] = p
    return targets, img_paths


def load_all_tvsd_data(cfg, subjects=None, regions=None) -> Dict:
    """Reference: visreps/dataloaders/neural.py:393-460."""
    subjects = subjects if subjects is not None else _TVSD_SUBJECTS
    regions_to_load = regions if regions is not None else _TVSD_REGIONS
    data = load_pickle(os.path.join("datasets", "neural", "tvsd", "fmri_responses.pkl"))
    root = _things_root()

    neural: Dict = {}
    all_paths: Dict = {}
    per_subject_test: list[set] = []
    for region in regions_to_load:
        neural[region] = {}
        for subj in subjects:
            targets = {}
            for split_name, obj in data[region][subj].items():
                arr = ResponseArray(obj)
                ids = [str(s) for s in arr.ids]
                targets[split_name] = {sid: arr.sel(sid) for sid in ids}
                for sid in ids:
                    if sid not in all_paths:
                        p = _tvsd_things_image_path(sid, root)
                        if p:
                            all_paths[sid] = p
            neural[region][subj] = targets
            if region == regions_to_load[0]:
                per_subject_test.append(set(targets["test"].keys()))

    shared_test_ids = sorted(set.intersection(*per_subject_test))
    return {
        "regions": list(regions_to_load),
        "subjects": list(subjects),
        "neural": neural,
        "stimuli": all_paths,
        "shared_test_ids": shared_test_ids,
    }


# ── Cusack 2025 infant fMRI ──────────────────────────────────────
def load_cusack_data(cfg) -> tuple[dict, dict]:
    """Reference: visreps/dataloaders/neural.py:277-309."""
    region = cfg["region"]
    age_group = cfg.get("age_group", "2month")
    fmri = load_pickle(os.path.join("datasets", "neural", "cusack2025", "fmri_responses.pkl"))
    targets = fmri[region][age_group]
    stimuli_dir = os.path.join("datasets", "neural", "cusack2025", "display_images")
    stimuli = {}
    for sid in targets:
        p = os.path.join(stimuli_dir, f"{sid}.png")
        if not os.path.exists(p):
            raise FileNotFoundError(f"Stimulus image not found: {p}")
        stimuli[sid] = p
    return targets, stimuli


# ── unified entry ────────────────────────────────────────────────
def get_neural_loader(cfg):
    """(targets, loader) for a neural dataset.

    Reference: visreps/dataloaders/neural.py:526-552.
    """
    dataset = cfg.get("neural_dataset")
    if dataset == "nsd":
        targets, stimuli = load_nsd_data(cfg)
    elif dataset == "things-behavior":
        targets, stimuli = load_things_data()
    elif dataset == "nsd_synthetic":
        targets, stimuli = load_nsd_synthetic_data(cfg)
    elif dataset == "cusack":
        targets, stimuli = load_cusack_data(cfg)
    elif dataset == "tvsd":
        targets, stimuli = load_tvsd_data(cfg)
    else:
        raise ValueError(
            "neural_dataset must be 'nsd', 'things-behavior', 'nsd_synthetic', 'cusack', or 'tvsd'"
        )
    loader = make_stimuli_loader(
        stimuli,
        # uint8_transfer: ship unnormalized uint8 batches (4x less H2D
        # traffic); the extractor normalizes on device (extractor.py).
        get_transform("imgnet", normalize=not cfg.get("uint8_transfer", False)),
        cfg["batchsize"], cfg.get("num_workers", 16),
    )
    return targets, loader
