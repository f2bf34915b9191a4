"""WordNet label-generation experiments against a synthetic hierarchy."""
import csv
import json

import pytest

from experiments.wordnet.hierarchy import WordnetHierarchy
from experiments.wordnet.make_semantic_labels import (
    classify_classes,
    make_labels as make_semantic,
)
from experiments.wordnet.make_wordnet_labels import make_labels as make_wordnet
from experiments.wordnet.wordnet import print_ancestry, print_hierarchy


class FakeDS:
    """ImageNetDataset stand-in: 4 classes x 2 images."""

    def __init__(self, n_classes=4):
        self.folder_labels = {f"n{100 + c:08d}": c for c in range(n_classes)}
        self.samples = [
            (f"/x/img{c}_{i}.jpg", c, f"img{c}_{i}.jpg")
            for c in range(n_classes)
            for i in range(2)
        ]

    def get_wnid_from_label(self, idx):
        return f"n{100 + idx:08d}"


@pytest.fixture
def hierarchy():
    # root -> organism -> animal -> {dog, cat}; root -> artifact chain
    # -> device; two paths for class 3 (longest differs from shortest).
    paths = {
        "n00000100": [["entity.n.01", "organism.n.01", "animal.n.01", "dog.n.01"]],
        "n00000101": [["entity.n.01", "organism.n.01", "animal.n.01", "cat.n.01"]],
        "n00000102": [["entity.n.01", "artifact.n.01", "instrumentality.n.03",
                       "device.n.01", "widget.n.01"]],
        "n00000103": [
            ["entity.n.01", "artifact.n.01", "device.n.01"],
            ["entity.n.01", "artifact.n.01", "instrumentality.n.03",
             "device.n.01", "gadget.n.01"],
        ],
    }
    return WordnetHierarchy(paths)


class TestHierarchy:
    def test_ancestor_uses_longest_path(self, hierarchy):
        # class 3: longest path has gadget at depth 4
        assert hierarchy.ancestor_at_depth("n00000103", 4) == "gadget.n.01"
        assert hierarchy.ancestor_at_depth("n00000103", 1) == "artifact.n.01"
        # depth beyond the path clamps to the leaf
        assert hierarchy.ancestor_at_depth("n00000100", 9) == "dog.n.01"

    def test_level_synset_uses_shortest_path(self, hierarchy):
        # class 3: shortest path is 3 long -> leaf fallback
        assert hierarchy.level_synset("n00000103", 6) == "device.n.01"
        assert hierarchy.level_synset("n00000100", 2) == "animal.n.01"

    def test_children_induced(self, hierarchy):
        assert hierarchy.children("animal.n.01") == ["cat.n.01", "dog.n.01"]
        assert "artifact.n.01" in hierarchy.children("entity.n.01")

    def test_json_roundtrip(self, hierarchy, tmp_path):
        p = tmp_path / "snap.json"
        p.write_text(json.dumps(hierarchy.paths))
        h2 = WordnetHierarchy.from_json(str(p))
        assert h2.paths == hierarchy.paths

    def test_load_uses_snapshot_env(self, hierarchy, tmp_path, monkeypatch):
        p = tmp_path / "snap.json"
        p.write_text(json.dumps(hierarchy.paths))
        monkeypatch.setenv("WORDNET_PATHS_JSON", str(p))
        h = WordnetHierarchy.load()
        assert h.paths == hierarchy.paths


class TestMakeWordnetLabels:
    def test_depth_csvs(self, hierarchy, tmp_path):
        ds = FakeDS()
        written = make_wordnet(ds, hierarchy, str(tmp_path), min_depth=1,
                               max_depth=3, n_classes=4)
        # depth 1: organism vs artifact -> 2 classes
        k1, path1 = written[1]
        assert k1 == 2
        with open(path1) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 8
        by_img = {r["image"]: r["pca_label"] for r in rows}
        assert by_img["img0_0.jpg"] == by_img["img1_1.jpg"]  # both organism
        assert by_img["img0_0.jpg"] != by_img["img2_0.jpg"]
        # depth 3 along longest paths: dog, cat, device, device -> 3 unique
        k3, _ = written[3]
        assert k3 == 3
        # labels are contiguous ids
        assert set(by_img.values()) == {"0", "1"}


class TestMakeSemanticLabels:
    def test_classify_and_write(self, hierarchy, tmp_path):
        ds = FakeDS()
        # level 2 along shortest path: animal.n.01 / artifact chains
        with pytest.raises(ValueError):
            # level-6 fallback leaves (dog.n.01 etc.) are unmapped
            classify_classes(hierarchy, ds.get_wnid_from_label, 4, level=6)

        # at level 2 the animal classes map to Animals; artifact classes
        # fall back to synsets not in the table -> still ValueError
        with pytest.raises(ValueError):
            classify_classes(hierarchy, ds.get_wnid_from_label, 4, level=2)

        # restrict to the two animal classes: clean mapping at level 2
        c2c, counts = classify_classes(hierarchy, ds.get_wnid_from_label, 2, level=2)
        assert counts["Animals"] == 2

        ds2 = FakeDS(n_classes=2)
        out = tmp_path / "semantic_categories.csv"
        make_semantic(ds2, hierarchy, str(out), n_classes=2, level=2)
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 4
        assert {r["pca_label"] for r in rows} == {"0"}  # all Animals
        assert (tmp_path / "semantic_categories_mapping.txt").exists()


class TestExploreCLI:
    def test_print_helpers(self, hierarchy):
        lines = []
        print_hierarchy(hierarchy, "entity.n.01", max_depth=2, out=lines.append)
        assert any("animal.n.01" in l for l in lines)
        lines2 = []
        print_ancestry(hierarchy, "n00000103", out=lines2.append)
        assert any("Path 2" in l for l in lines2)
