"""Build Cusack2025 infant-fMRI pickles (region × age_group).

Reference parity: scripts/process_cusack25.py — produces
datasets/neural/cusack2025/fmri_responses.pkl with
data[region][age_group] = {stim_id: response}; display images live in
datasets/neural/cusack2025/display_images/{stim_id}.png.

Input: per-(region, age_group) .npz files {region}_{age}.npz with
'stimulus' (ids) and 'values' (n_stim, n_voxels).
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--npz-dir", required=True)
    parser.add_argument("--out", default="datasets/neural/cusack2025/fmri_responses.pkl")
    args = parser.parse_args(argv)

    data: dict = {}
    for fname in sorted(os.listdir(args.npz_dir)):
        if not fname.endswith(".npz"):
            continue
        region, age = fname[:-4].rsplit("_", 1)
        z = np.load(os.path.join(args.npz_dir, fname), allow_pickle=True)
        data.setdefault(region, {})[age] = {
            str(s): v.astype(np.float32)
            for s, v in zip(z["stimulus"], z["values"])
        }
        print(f"  {region}/{age}: {len(z['stimulus'])} stimuli")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(data, f)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()
