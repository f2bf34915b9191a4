"""Generate WordNet-hierarchy coarse labels for ImageNet (depths 1-7).

Port of reference experiments/wordnet/make_wordnet_labels.py:13-78: for
each depth, map every ImageNet class to its ancestor synset at that
depth along the LONGEST hypernym path, enumerate the unique ancestors
as label ids, and write one `pca_labels/wordnet/n_classes_{K}.csv`
(columns image,pca_label) per depth — the "wordnet" label source of the
paper's 4-source x 6-granularity training matrix.

Hierarchy source is pluggable (hierarchy.py): nltk when present, else
a JSON snapshot via $WORDNET_PATHS_JSON.
"""
from __future__ import annotations

import argparse
import csv
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from experiments.wordnet.hierarchy import WordnetHierarchy
from visreps_tpu.core.logging import rprint

MIN_DEPTH, MAX_DEPTH = 1, 7
LABELS_FOLDER = "wordnet"


def class_to_ancestor_at_depth(hierarchy: WordnetHierarchy, wnid_of_class,
                               depth: int, n_classes: int = 1000) -> dict:
    """Class idx -> ancestor synset name at `depth` (longest path)."""
    out = {}
    for class_idx in range(n_classes):
        wnid = wnid_of_class(class_idx)
        anc = hierarchy.ancestor_at_depth(wnid, depth)
        if anc is not None:
            out[class_idx] = anc
    return out


def make_labels(ds, hierarchy: WordnetHierarchy, labels_dir: str,
                min_depth: int = MIN_DEPTH, max_depth: int = MAX_DEPTH,
                n_classes: int = 1000) -> dict:
    """Write one CSV per depth; returns {depth: (n_classes, path)}."""
    os.makedirs(labels_dir, exist_ok=True)
    written = {}
    rprint("Depth | # Classes | Output File", style="info")
    for depth in range(min_depth, max_depth + 1):
        c2a = class_to_ancestor_at_depth(
            hierarchy, ds.get_wnid_from_label, depth, n_classes)
        unique = sorted(set(c2a.values()))
        label_of = {a: i for i, a in enumerate(unique)}
        k = len(unique)

        out_path = os.path.join(labels_dir, f"n_classes_{k}.csv")
        with open(out_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["image", "pca_label"])
            for _, class_idx, img_id in ds.samples:
                anc = c2a.get(class_idx)
                if anc is not None:
                    w.writerow([img_id, label_of[anc]])
        written[depth] = (k, out_path)
        rprint(f"{depth:5d} | {k:9d} | {out_path}", style="info")
    return written


def main(argv=None):
    from visreps_tpu.core.env import get_env_var
    from visreps_tpu.data.obj_cls import ImageNetDataset

    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default=os.path.join("pca_labels", LABELS_FOLDER))
    args = parser.parse_args(argv)

    ds = ImageNetDataset(get_env_var("IMAGENET_DATA_DIR"), split="all")
    rprint(f"Loaded {len(ds.samples)} images", style="success")
    wnids = sorted(set(ds.folder_labels))
    hierarchy = WordnetHierarchy.load(wnids)
    make_labels(ds, hierarchy, args.out_dir)
    rprint("Done.", style="success")


if __name__ == "__main__":
    main()
