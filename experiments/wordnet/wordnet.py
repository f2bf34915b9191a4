"""WordNet hierarchy exploration CLI.

Port of reference experiments/wordnet/wordnet.py:21-98: print the
hyponym tree under a synset and the hypernym ancestry of an ImageNet
class, against the pluggable hierarchy (nltk or JSON snapshot).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from experiments.wordnet.hierarchy import WordnetHierarchy


def print_hierarchy(hierarchy: WordnetHierarchy, name: str, depth: int = 0,
                    max_depth: int = 3, max_children: int = 5, out=print):
    """Recursively print the (induced) hyponym tree under `name`."""
    out(f"{'  ' * depth}- {name}")
    if depth >= max_depth:
        return
    kids = hierarchy.children(name)
    for i, child in enumerate(kids):
        if i >= max_children:
            out(f"{'  ' * depth}  ... ({len(kids) - max_children} more)")
            break
        print_hierarchy(hierarchy, child, depth + 1, max_depth, max_children, out)


def print_ancestry(hierarchy: WordnetHierarchy, wnid: str, out=print):
    """Every hypernym path from root to the wnid's synset."""
    paths = hierarchy.hypernym_paths(wnid)
    if not paths:
        out(f"(no paths for {wnid})")
        return
    for j, path in enumerate(paths):
        out(f"Path {j + 1} ({len(path)} levels):")
        for lvl, name in enumerate(path):
            out(f"  {lvl}: {name}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--tree", help="synset name to print hyponyms of")
    parser.add_argument("--ancestry", help="wnid to print hypernym paths of")
    parser.add_argument("--max_depth", type=int, default=3)
    args = parser.parse_args(argv)

    from visreps_tpu.core.env import get_env_var
    from visreps_tpu.data.obj_cls import ImageNetDataset

    ds = ImageNetDataset(get_env_var("IMAGENET_DATA_DIR"), split="all")
    hierarchy = WordnetHierarchy.load(sorted(set(ds.folder_labels)))
    if args.tree:
        print_hierarchy(hierarchy, args.tree, max_depth=args.max_depth)
    if args.ancestry:
        print_ancestry(hierarchy, args.ancestry)


if __name__ == "__main__":
    main()
