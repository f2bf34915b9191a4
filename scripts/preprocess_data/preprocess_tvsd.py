"""Build TVSD fmri_responses.pkl (macaque MUA, THINGS stimuli).

Reference parity: scripts/preprocess_data/preprocess_tvsd.py:24-54 —
train split keeps single-shot responses (~22,248 stimuli); test split
averages the 100 test stimuli over their 30 repetitions. Output:
  data[region][subject] = {"train": {...}, "test": {...}}
with each split in the plain-dict format {"stimulus": ids, "values": arr}.

Input: per-(region, subject) .npz files {region}_subj{idx}.npz with
  train_stimulus, train_values (n_train, n_sites)
  test_stimulus,  test_values  (100, 30, n_sites) or (3000, n_sites)
  [test_repeats]  when test_values is flat (3000, n_sites)
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _average_test(z) -> tuple[list, np.ndarray]:
    stim = [str(s) for s in z["test_stimulus"]]
    vals = z["test_values"].astype(np.float32)
    if vals.ndim == 3:  # (n_test, n_reps, sites)
        return stim, vals.mean(axis=1)
    reps = int(z["test_repeats"]) if "test_repeats" in z else 30
    n_test = vals.shape[0] // reps
    vals = vals.reshape(n_test, reps, -1).mean(axis=1)
    return stim[:n_test], vals


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--npz-dir", required=True)
    parser.add_argument("--out", default="datasets/neural/tvsd/fmri_responses.pkl")
    args = parser.parse_args(argv)

    data: dict = {}
    for fname in sorted(os.listdir(args.npz_dir)):
        if not fname.endswith(".npz") or "_subj" not in fname:
            continue
        region, subj_part = fname[:-4].rsplit("_subj", 1)
        z = np.load(os.path.join(args.npz_dir, fname), allow_pickle=True)
        test_stim, test_vals = _average_test(z)
        data.setdefault(region, {})[int(subj_part)] = {
            "train": {
                "stimulus": [str(s) for s in z["train_stimulus"]],
                "values": z["train_values"].astype(np.float32),
            },
            "test": {"stimulus": test_stim, "values": test_vals},
        }
        print(f"  {region} subj {subj_part}: train {z['train_values'].shape}, "
              f"test {test_vals.shape} (rep-averaged)")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(data, f)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()
