"""Pluggable WordNet hypernym hierarchy for the label-generation CLIs.

The reference scripts (experiments/wordnet/make_wordnet_labels.py,
make_semantic_labels.py) call nltk directly; this environment has no
nltk, so the hierarchy is abstracted behind one small provider with
two sources:

  * nltk, when importable and the wordnet corpus is on disk;
  * a JSON snapshot mapping wnid -> list of hypernym paths (each path
    a root-first list of synset names), e.g. exported once on a
    machine that has nltk via `python -m experiments.wordnet.hierarchy
    export <out.json>`.

Every consumer works identically against either source.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional


class WordnetHierarchy:
    """Hypernym paths per ImageNet wnid (e.g. 'n02084071')."""

    def __init__(self, paths: Dict[str, List[List[str]]]):
        self.paths = paths

    # ── constructors ─────────────────────────────────────────
    @classmethod
    def from_nltk(cls, wnids) -> "WordnetHierarchy":
        """Build from nltk (reference: experiments/wordnet/wordnet.py:14-20)."""
        from nltk.corpus import wordnet as wn

        paths = {}
        for wnid in wnids:
            syn = wn.synset_from_pos_and_offset("n", int(wnid[1:]))
            paths[wnid] = [[s.name() for s in p] for p in syn.hypernym_paths()]
        return cls(paths)

    @classmethod
    def from_json(cls, path: str) -> "WordnetHierarchy":
        with open(path) as f:
            return cls(json.load(f))

    @classmethod
    def load(cls, wnids=None) -> "WordnetHierarchy":
        """$WORDNET_PATHS_JSON snapshot if set, else nltk (needs the
        wordnet corpus on disk and the wnid list)."""
        snap = os.environ.get("WORDNET_PATHS_JSON")
        if snap:
            return cls.from_json(snap)
        if wnids is not None:
            try:
                from nltk.corpus import wordnet as wn

                wn.ensure_loaded()
                return cls.from_nltk(wnids)
            except Exception:
                pass
        raise RuntimeError(
            "No WordNet source: set WORDNET_PATHS_JSON to a hypernym-path "
            "snapshot, or install nltk + its wordnet corpus")

    # ── queries ──────────────────────────────────────────────
    def hypernym_paths(self, wnid: str) -> List[List[str]]:
        return self.paths.get(wnid, [])

    def ancestor_at_depth(self, wnid: str, depth: int) -> Optional[str]:
        """Ancestor at `depth` along the LONGEST path (most specific
        route to root) — reference make_wordnet_labels.py:15-31."""
        paths = self.hypernym_paths(wnid)
        if not paths:
            return None
        path = max(paths, key=len)
        return path[min(depth, len(path) - 1)]

    def level_synset(self, wnid: str, level: int = 6) -> Optional[str]:
        """Synset at `level` along the SHORTEST path — reference
        make_semantic_labels.py:84-99 (falls back to the leaf)."""
        paths = self.hypernym_paths(wnid)
        if not paths:
            return None
        path = min(paths, key=len)
        if len(path) > level:
            return path[level]
        return path[-1] if path else None

    def children(self, name: str) -> List[str]:
        """Immediate hyponyms observable from the stored paths (the
        snapshot holds ancestor chains only, so this is the induced
        sub-hierarchy, sufficient for the exploration CLI)."""
        kids = set()
        for paths in self.paths.values():
            for p in paths:
                for a, b in zip(p, p[1:]):
                    if a == name:
                        kids.add(b)
        return sorted(kids)


def export_snapshot(wnids, out_path: str) -> None:
    """Write a JSON snapshot usable via WORDNET_PATHS_JSON (run where
    nltk + the wordnet corpus exist)."""
    h = WordnetHierarchy.from_nltk(wnids)
    with open(out_path, "w") as f:
        json.dump(h.paths, f)


if __name__ == "__main__":
    import argparse
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from visreps_tpu.core.env import get_env_var
    from visreps_tpu.data.obj_cls import ImageNetDataset

    parser = argparse.ArgumentParser()
    parser.add_argument("cmd", choices=["export"])
    parser.add_argument("out")
    args = parser.parse_args()
    ds = ImageNetDataset(get_env_var("IMAGENET_DATA_DIR"), split="all")
    wnids = sorted(set(ds.folder_labels))
    export_snapshot(wnids, args.out)
    print(f"Wrote {len(wnids)} wnid hierarchies to {args.out}")
