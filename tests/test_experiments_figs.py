"""Figure-script ports (pca_analysis, binary_pc visualize, curriculum
plot, reconstruction plot, neurips_2025 tree) on synthetic fixtures."""
import csv
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from visreps_tpu.core.config import Config
from visreps_tpu.core.db import save_results


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return str(path)


# ── long results frame shared by the neurips figure CLIs ────────────
@pytest.fixture
def results_csv(tmp_path, rng):
    rows = []
    for layer in ("conv3", "conv4", "fc1", "fc2"):
        for seed in (1, 2, 3):
            for subj in (0, 1):
                rows.append(dict(
                    layer=layer, seed=seed, subject_idx=subj, epoch=0,
                    region="early visual stream", neural_dataset="nsd",
                    compare_method="Spearman", pca_labels=False,
                    pca_n_classes="", reconstruct_from_pcs=0, pca_k=1,
                    score=0.05 + 0.01 * rng.rand()))
                rows.append(dict(
                    layer=layer, seed=seed, subject_idx=subj, epoch=20,
                    region="early visual stream", neural_dataset="nsd",
                    compare_method="Spearman", pca_labels=False,
                    pca_n_classes="", reconstruct_from_pcs=0, pca_k=1,
                    score=0.30 + 0.01 * rng.rand()))
                for n in (2, 4, 8, 16, 32, 64):
                    rows.append(dict(
                        layer=layer, seed=seed, subject_idx=subj, epoch=20,
                        region="early visual stream", neural_dataset="nsd",
                        compare_method="Spearman", pca_labels=True,
                        pca_n_classes=n, reconstruct_from_pcs=0, pca_k=1,
                        score=0.2 + 0.001 * n + 0.01 * rng.rand()))
    return _write_csv(tmp_path / "full-vs-pcs_nsd.csv", rows)


class TestNeuripsFigs:
    def test_figutils_condition_barplot(self, tmp_path, rng):
        from experiments.neurips_2025.figutils import condition_barplot

        out = tmp_path / "bar.png"
        condition_barplot({"Untrained": [0.1, 0.12], "4 Classes": [0.2, 0.21],
                           "1000 Classes": [0.3]}, str(out))
        assert out.exists()

    def test_bar_plot_nsd_cli(self, results_csv, tmp_path):
        from experiments.neurips_2025.fig2 import bar_plot_nsd

        out = tmp_path / "bar_nsd.png"
        scores = bar_plot_nsd.main([
            "--csv", results_csv, "--region", "early visual stream",
            "--out", str(out)])
        assert out.exists()
        assert len(scores["Untrained"]) == 3  # one per seed
        assert "64 Classes" in scores

    def test_full_vs_pcs_cli(self, results_csv, tmp_path):
        from experiments.neurips_2025.fig4 import full_vs_pcs_nsd

        out = tmp_path / "fvp.png"
        full_vs_pcs_nsd.main(["--csv", results_csv,
                              "--region", "early visual stream",
                              "--out", str(out)])
        assert out.exists()

    def test_reconstructed_rsa_cli(self, results_csv, tmp_path, rng):
        from experiments.neurips_2025.fig2 import reconstructed_rsa_nsd

        rows = []
        for seed in (1, 2, 3):
            for k in range(1, 21):
                for subj in (0, 1):
                    rows.append(dict(
                        layer="fc1", seed=seed, subject_idx=subj, epoch=20,
                        region="ventral visual stream", neural_dataset="nsd",
                        correlation="Spearman", pca_labels=False,
                        pca_n_classes="", reconstruct_from_pcs=True,
                        pca_k=k, score=0.1 + 0.01 * k + 0.005 * rng.rand()))
        recon_csv = _write_csv(tmp_path / "recon.csv", rows)
        # baseline csv needs the requested region/layer
        base_rows = []
        for seed in (1, 2, 3):
            for epoch in (0, 20):
                base_rows.append(dict(
                    layer="fc1", seed=seed, subject_idx=0, epoch=epoch,
                    region="ventral visual stream", neural_dataset="nsd",
                    correlation="Spearman", pca_labels=epoch == 20,
                    pca_n_classes=64 if epoch == 20 else "",
                    reconstruct_from_pcs=0, pca_k=1,
                    score=0.05 if epoch == 0 else 0.28))
        base_csv = _write_csv(tmp_path / "base.csv", base_rows)
        out = tmp_path / "recon.png"
        reconstructed_rsa_nsd.main([
            "--recon_csv", recon_csv, "--baseline_csv", base_csv,
            "--region", "ventral visual stream", "--layer", "fc1",
            "--out", str(out)])
        assert out.exists()

    def test_schematic(self, tmp_path):
        from experiments.neurips_2025.fig1 import imagenet_pca_schematic as sch

        x, y = sch.make_synthetic(n_points=500, n_classes=10, d=20)
        assert x.shape == (500, 20)
        x2 = sch.pca_2d(x)
        assert x2.shape == (500, 2)
        out = tmp_path / "schematic.png"
        sch.render(str(out))
        assert out.exists()

    def test_model_reps_rsa(self, tmp_path, rng):
        from experiments.neurips_2025.fig1 import model_reps_rsa_comparisons as mrc

        base = tmp_path / "RSMs" / "pca4cls"
        base.mkdir(parents=True)
        n = 12

        def rsm():
            a = rng.rand(n, 6).astype(np.float32)
            return np.corrcoef(a)

        layers = {"conv1": rsm(), "fc2": rsm(), "neural": rsm()}
        for name in ("rsms_nsd_pca_labels_False_pca_k_2_cfgid_1_seed_1.npz",
                     "rsms_nsd_pca_labels_False_pca_k_2_cfgid_1_seed_2.npz",
                     "rsms_nsd_pca_labels_True_cfgid_2_seed_1.npz",
                     "rsms_nsd_pca_labels_True_cfgid_2_seed_2.npz"):
            np.savez(base / name, **layers)
        out = mrc.main(["--n_pca_cls", "4", "--base_rsm_dir",
                        str(tmp_path / "RSMs"), "--output_dir", str(tmp_path)])
        assert out is not None and Path(out).exists()


class TestPcaAnalysisFigs:
    def test_pca_poles(self, tmp_path, rng):
        from experiments.pca_analysis.pca_poles_images import (
            analyze_pc_poles,
            compute_pc_scores,
        )

        feats = rng.randn(300, 16).astype(np.float32)
        scores = compute_pc_scores(feats, n_components=3, n_fit=200)
        assert scores.shape == (300, 3)
        names = [f"n{i % 5:03d}_{i}.JPEG" for i in range(300)]
        rows = analyze_pc_poles(scores, names, {"n000": "dog"}, n_poles=10)
        assert len(rows) == 3 * 2 * 10
        assert {r["pole"] for r in rows} == {"low", "high"}
        # low pole rows really are the lowest scores for pc1
        pc1_low = [r["score"] for r in rows if r["pc"] == 1 and r["pole"] == "low"]
        assert max(pc1_low) <= float(np.percentile(scores[:, 0], 5))

    def test_pca_visualization(self, tmp_path, rng):
        from experiments.pca_analysis import pca_visualization as pv

        n, d = 120, 10
        feats = rng.randn(n, d).astype(np.float32)
        names = np.array([f"img_{i}.jpg" for i in range(n)])
        np.savez(tmp_path / "features.npz", fc2=feats, image_names=names)
        vecs = np.linalg.qr(rng.randn(d, d))[0][:, :4]
        np.savez(tmp_path / "eig.npz", eigenvectors=vecs, mean=feats.mean(0))
        _write_csv(tmp_path / "n_classes_4.csv",
                   [{"image": f"img_{i}.jpg", "pca_label": i % 4} for i in range(n)])
        scores, labels = pv.load_scores_and_labels(
            str(tmp_path / "features.npz"), str(tmp_path / "eig.npz"),
            str(tmp_path / "n_classes_4.csv"), sample_fraction=0.5)
        assert scores.shape[1] == 4
        out1, out2 = tmp_path / "s.png", tmp_path / "d.png"
        pv.plot_scatter(scores, labels, 4, str(out1))
        pv.plot_1d_distributions(scores, str(out2))
        assert out1.exists() and out2.exists()


class TestBinaryPcVisualize:
    def test_visualize_cli(self, tmp_path, rng):
        from experiments.binary_pc_rsa import visualize as viz

        rows = []
        for region in viz.REGIONS:
            for n_pcs in (2, 5, 10, 20):
                for weighted in (True, False):
                    for corr in ("Spearman", "Kendall"):
                        for subj in (0, 1):
                            rows.append(dict(
                                n_pcs=n_pcs, region=region, weighted=weighted,
                                correlation=corr, subject_idx=subj,
                                score=0.1 + 0.002 * n_pcs + 0.01 * rng.rand()))
        res_csv = _write_csv(tmp_path / "binary.csv", rows)
        base_rows = [dict(layer=viz.LAYER_FOR_REGION[r], region=r, epoch=e,
                          correlation=c, subject_idx=0, score=0.2)
                     for r in viz.REGIONS for e in (0, 20)
                     for c in ("Spearman", "Kendall")]
        base_csv = _write_csv(tmp_path / "cnn.csv", base_rows)
        viz.main(["--results", res_csv, "--cnn_baseline", base_csv,
                  "--out_dir", str(tmp_path)])
        assert (tmp_path / "binary_pc_rsa_early.png").exists()
        assert (tmp_path / "binary_pc_rsa_ventral.png").exists()


class TestCurriculumPlot:
    def test_plot_curriculum(self, tmp_path, rng):
        from experiments.coarse_grain_benefits import plot_curriculum_rsa as pcr

        rows = []
        for name in pcr.MODEL_NAMES:
            for region in ("early visual stream", "ventral visual stream"):
                for depth in np.linspace(0, 1, 5):
                    rows.append(dict(model_name=name, region=region,
                                     depth_normalized=round(float(depth), 3),
                                     rsa_score=0.1 + 0.2 * depth + 0.01 * rng.rand()))
        csv_path = _write_csv(tmp_path / "cur.csv", rows)
        out = tmp_path / "cur.png"
        pcr.main(["--input", csv_path, "--out", str(out)])
        assert out.exists()


class TestCoarseUtils:
    def test_configs_and_names(self):
        from experiments.coarse_grain_benefits.utils import (
            get_config_name,
            get_model_configs,
        )

        cfgs = get_model_configs([32, 64], [1, 2], include_pretrained=True)
        assert (32, 1) in cfgs and ("pretrained", None) in cfgs
        assert get_config_name(32, 1) == "cfg32a"
        assert get_config_name(1000, 3) == "cfg1000c"

    def test_extract_features(self, rng):
        from experiments.coarse_grain_benefits.utils import extract_features
        from visreps_tpu.models.zoo import init_model

        state = init_model("TinyCustomCNN", 8, seed=0)
        batches = [(rng.randn(2, 64, 64, 3).astype(np.float32), None)
                   for _ in range(2)]
        feats = extract_features(state, batches, layer="fc1")
        assert feats.shape[0] == 4


class TestReconstructionPlot:
    def test_plot_dataset_from_db(self, tmp_path, rng):
        from experiments.reconstruction_analysis.plot import plot_dataset

        db = tmp_path / "results.db"

        def save(cfg_id, recon, pca_k, score, pca, folder="pca_labels_alexnet"):
            cfg = Config({
                "seed": 1, "epoch": 20, "region": "V1", "subject_idx": 0,
                "neural_dataset": "tvsd", "cfg_id": cfg_id, "pca_labels": pca,
                "pca_n_classes": cfg_id if pca else None,
                "pca_labels_folder": folder, "checkpoint_dir": "ckpt",
                "analysis": "rsa", "compare_method": "spearman",
                "reconstruct_from_pcs": recon, "pca_k": pca_k,
                "model_name": "CustomCNN",
            })
            save_results([{
                "layer": "fc1", "compare_method": "spearman", "score": score,
                "ci_low": score - 0.01, "ci_high": score + 0.01,
                "analysis": "rsa",
            }], cfg, db_path=db)

        for k in (1, 5, 10, 20):
            save(1000, True, k, 0.1 + 0.01 * k, pca=False)
        save(1000, False, 1, 0.35, pca=False)
        save(64, False, 1, 0.30, pca=True)
        out = plot_dataset(db, "tvsd", [("V1", "V1")], (4, 3.5),
                           out_dir=tmp_path)
        assert Path(out).exists()
