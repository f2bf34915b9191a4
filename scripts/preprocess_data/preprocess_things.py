"""Build things_split.pkl: concept embeddings + per-concept image ids.

Reference parity: scripts/preprocess_data/preprocess_things.py:30-75 —
reads the THINGS SPoSE 66-d embedding table (one row per concept) and
the THINGS object_images tree, producing:
  embeddings:  {concept: (66,) float32}
  image_ids:   {concept: [stimulus_id, ...]}
  image_paths: {stimulus_id: path}
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", required=True,
                        help="TSV/CSV: first column concept, remaining 66 dims")
    parser.add_argument("--images-root", required=True,
                        help=".../hebart2019.things/images/object_images")
    parser.add_argument("--out", default="datasets/neural/things/things_split.pkl")
    args = parser.parse_args(argv)

    import pandas as pd

    sep = "\t" if args.embeddings.endswith(".tsv") else ","
    df = pd.read_csv(args.embeddings, sep=sep)
    concept_col = df.columns[0]

    embeddings = {}
    image_ids = {}
    image_paths = {}
    missing = 0
    for _, row in df.iterrows():
        concept = str(row[concept_col])
        emb = row.iloc[1:].to_numpy(np.float32)
        concept_dir = os.path.join(args.images_root, concept)
        if not os.path.isdir(concept_dir):
            missing += 1
            continue
        ids = []
        for fname in sorted(os.listdir(concept_dir)):
            if fname.lower().endswith((".jpg", ".jpeg", ".png")):
                sid = os.path.splitext(fname)[0]
                ids.append(sid)
                image_paths[sid] = os.path.join(concept_dir, fname)
        if not ids:
            missing += 1
            continue
        embeddings[concept] = emb
        image_ids[concept] = ids

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(
            {"embeddings": embeddings, "image_ids": image_ids, "image_paths": image_paths}, f
        )
    n_imgs = sum(len(v) for v in image_ids.values())
    print(f"Saved {args.out}: {len(embeddings)} concepts, {n_imgs} images "
          f"({missing} concepts skipped, no images)")


if __name__ == "__main__":
    main()
