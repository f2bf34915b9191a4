"""Round-2 experiment ports, batch B: 2pcs_compare, semantic ports,
run_all — synthetic fixtures, CPU."""
import numpy as np
import pytest

from experiments.representation_analysis.two_pcs_compare import (
    align_pcs,
    assign_quadrants,
    compute_pca,
    plot as plot_2pcs,
    run_analysis,
)
from experiments.representation_analysis.utils import (
    embed_2d,
    extract_pooled_layers,
    load_labels,
)
from experiments.semantic_analysis.fine_grained_structure import (
    analyze_fine_grained_structure,
)
from experiments.semantic_analysis.plot_semantic_classes_umap import run as run_umap_grid
from experiments.semantic_analysis.semantic_alignment import (
    semantic_alignment_scores,
)
from visreps_tpu.core.config import Config


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


class TestTwoPcsCompare:
    def test_pca_matches_numpy(self, rng):
        x = rng.randn(200, 16).astype(np.float32)
        pcs, var = compute_pca(x)
        assert pcs.shape == (200, 2)
        # top-2 variance fractions match numpy svd
        c = x - x.mean(0)
        s = np.linalg.svd(c, compute_uv=False) ** 2 / (len(x) - 1)
        np.testing.assert_allclose(
            np.sort(var)[::-1], np.sort(s)[::-1][:2] / s.sum() * 100, rtol=1e-3)

    def test_quadrants_balanced(self, rng):
        pc1, pc2 = rng.randn(1000), rng.randn(1000)
        q, m1, m2 = assign_quadrants(pc1, pc2)
        counts = np.bincount(q, minlength=4)
        assert counts.min() > 200  # median splits -> ~250 each

    def test_align_recovers_flip_and_swap(self, rng):
        base = rng.randn(400, 2)
        q, _, _ = assign_quadrants(base[:, 0], base[:, 1])
        # trained = swapped + sign-flipped copy of the pretrained PCs
        trained = np.stack([-base[:, 1], base[:, 0]], axis=1)
        var = np.array([60.0, 40.0])
        aligned, var2, cfg = align_pcs(trained.copy(), var.copy(), q)
        # after alignment, quadrant centroids agree in sign with expected
        cents = np.stack([aligned[q == k].mean(0) for k in range(4)])
        expected = np.array([[-1, -1], [-1, 1], [1, -1], [1, 1]], float)
        assert (np.sign(cents) == expected).all()

    def test_run_analysis_and_plot(self, rng, tmp_path):
        feats_pre = {l: rng.randn(50, 12).astype(np.float32) for l in ("conv4", "fc1", "fc2")}
        feats_trn = {l: rng.randn(50, 12).astype(np.float32) for l in ("conv4", "fc1", "fc2")}
        out = tmp_path / "data_4way.npz"
        data = run_analysis(feats_pre, feats_trn, 4, str(out))
        assert out.exists()
        assert data["fc2_pretrained_pcs"].shape == (50, 2)
        fig = tmp_path / "fig.png"
        plot_2pcs(data, "fc2", str(fig))
        assert fig.exists()


class TestPooledExtraction:
    def test_extract_pooled_layers_tiny(self, rng):
        from visreps_tpu.models.zoo import init_model

        state = init_model("TinyCustomCNN", 8, seed=0)
        batches = [
            (rng.randn(4, 64, 64, 3).astype(np.float32), np.arange(4) % 2)
            for _ in range(2)
        ]
        feats, labels = extract_pooled_layers(
            state, batches, layers=["conv4", "fc1"], pool_size=2)
        assert feats["conv4"].shape[0] == 8
        assert labels.shape == (8,)
        # conv tap pooled to 2x2xC and L2-normalized rows
        norms = np.linalg.norm(feats["conv4"], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_load_labels(self, tmp_path):
        csv1 = tmp_path / "pca.csv"
        csv1.write_text("image,pca_label\nn01_1.jpg,3\n")
        samples = [("/a/n01_1.jpg", 0, "n01_1.jpg"), ("/a/n02_9.jpg", 1, "n02_9.jpg")]
        pca, sem, syn, paths = load_labels(samples, str(csv1), None)
        assert pca.tolist() == [3, -1]
        assert sem.tolist() == [-1, -1]
        assert syn.tolist() == ["n01", "n02"]


class TestSemanticPorts:
    def test_semantic_alignment_scores(self, rng):
        cfg = Config({"compare_method": "spearman"})
        ids = [f"s{i}" for i in range(30)]
        emb = {sid: rng.randn(8).astype(np.float32) for sid in ids}
        acts = {"fc1": rng.randn(30, 16).astype(np.float32),
                "fc2": np.stack([emb[s] for s in ids])}  # fc2 == embeddings
        rows = semantic_alignment_scores(cfg, acts, emb, ids)
        by_layer = {r["layer"]: r["score"] for r in rows}
        assert by_layer["fc2"] > 0.99
        assert by_layer["fc2"] > by_layer["fc1"]

    def test_fine_grained_figure(self, rng, tmp_path):
        n = 80
        sem = np.zeros(n, dtype=int)
        synsets = np.array([f"n{i % 5:03d}" for i in range(n)])
        feats = [rng.randn(n, 10).astype(np.float32) for _ in range(2)]
        out = tmp_path / "fg.png"
        n_animals = analyze_fine_grained_structure(
            feats, sem, synsets, str(out), model_names=["A", "B"], min_images=10)
        assert n_animals == n
        assert out.exists()

    def test_umap_grid_fallback(self, rng, tmp_path):
        n = 60
        labels = rng.randint(0, 3, n)
        feats = [{"fc2": rng.randn(n, 8).astype(np.float32)} for _ in range(3)]
        out = tmp_path / "grid.png"
        coords = run_umap_grid([f["fc2"] for f in feats] + [None],
                               labels, ["4-way", "8-way", "16-way", "x"], str(out))
        assert out.exists()
        assert coords[-1] is None and coords[0].shape == (n, 2)

    def test_embed_2d_backend(self, rng):
        coords, name = embed_2d(rng.randn(40, 6).astype(np.float32))
        assert coords.shape == (40, 2)
        assert name in ("UMAP", "t-SNE")


class TestRunAll:
    def test_run_all_cli(self, rng, tmp_path):
        from experiments.representation_analysis import run_all

        paths = []
        labels = np.arange(24) % 3
        for m in range(2):
            p = tmp_path / f"m{m}.npz"
            np.savez(p, fc2=rng.randn(24, 8).astype(np.float32),
                     conv4=rng.randn(24, 6).astype(np.float32), labels=labels)
            paths.append(str(p))
        run_all.main([
            "--features", *paths, "--names", "A", "B",
            "--out_dir", str(tmp_path / "out"),
        ])
        assert (tmp_path / "out" / "dimensionality_summary.npz").exists()
        assert (tmp_path / "out" / "variance_ratio.png").exists()
