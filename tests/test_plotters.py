"""DB-fixture smoke tests for every figure CLI + query parity tests.

VERDICT item 7: a seeded synthetic results.db containing untrained
(epoch 0), coarse 2-64 (multiple pca-label sources), and 1000-class
baselines must render the paper-style figures through every per-dataset
CLI, and query_best_scores must filter by (pca_labels_folder, cfg_id).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from visreps_tpu.core.config import Config
from visreps_tpu.core.db import save_results

DATASET_REGIONS = {
    "nsd": ["early visual stream", "ventral visual stream",
            "V1", "V2", "V3", "hV4", "FFA", "PPA"],
    "nsd_synthetic": ["early visual stream", "ventral visual stream"],
    "tvsd": ["V1", "V4", "IT"],
    "things-behavior": ["N/A"],
}


def _save(db, *, cfg_id, folder, epoch, region, subj, seed, score, nd="nsd",
          pca=True, rng=None):
    cfg = Config({
        "seed": seed, "epoch": epoch, "region": region, "subject_idx": subj,
        "neural_dataset": nd, "cfg_id": cfg_id, "pca_labels": pca,
        "pca_n_classes": cfg_id if pca else None, "pca_labels_folder": folder,
        "checkpoint_dir": f"ckpt_{folder}", "analysis": "rsa",
        "compare_method": "spearman", "reconstruct_from_pcs": False,
        "pca_k": 1, "model_name": "CustomCNN",
    })
    save_results([{
        "layer": "conv5_post", "compare_method": "spearman", "score": score,
        "ci_low": score - 0.03, "ci_high": score + 0.03, "analysis": "rsa",
        "layer_selection_scores": [],
        "bootstrap_scores": list(rng.uniform(score - 0.04, score + 0.04, 40)),
    }], cfg, db_path=db)


@pytest.fixture
def seeded_db(tmp_path):
    """Untrained + coarse (two label sources) + 1000-class rows for every
    dataset/region anatomy."""
    db = tmp_path / "results.db"
    rng = np.random.RandomState(0)
    for nd, regions in DATASET_REGIONS.items():
        subjects = {"nsd": range(4), "nsd_synthetic": range(4),
                    "tvsd": range(2), "things-behavior": ["N/A"]}[nd]
        for region in regions:
            for subj in subjects:
                for seed in (1, 2):
                    for folder_arch in ("alexnet", "clip"):
                        for cfg_id in (2, 4, 8, 16, 32, 64):
                            _save(db, cfg_id=cfg_id,
                                  folder=f"pca_labels_{folder_arch}",
                                  epoch=20, region=region, subj=subj, seed=seed,
                                  score=0.2 + 0.002 * cfg_id + 0.01 * seed,
                                  nd=nd, rng=rng)
                    # 1000-class baseline + untrained
                    _save(db, cfg_id=1000, folder="imagenet1k", epoch=20,
                          region=region, subj=subj, seed=seed, score=0.31,
                          nd=nd, pca=False, rng=rng)
                    _save(db, cfg_id=1000, folder="imagenet1k", epoch=0,
                          region=region, subj=subj, seed=seed, score=0.05,
                          nd=nd, pca=False, rng=rng)
    return db


class TestQueryBestScores:
    def test_filters_by_folder_and_cfg(self, seeded_db):
        from plotters.plotter_utils import query_best_scores

        df = query_best_scores("nsd", "V1", "pca_labels_alexnet", 32, db_path=seeded_db)
        assert len(df) == 8  # 4 subjects x 2 seeds
        df_clip = query_best_scores("nsd", "V1", "pca_labels_clip", 32, db_path=seeded_db)
        assert len(df_clip) == 8
        assert query_best_scores("nsd", "V1", "pca_labels_dino", 32,
                                 db_path=seeded_db).empty

    def test_epoch_filter_separates_untrained(self, seeded_db):
        from plotters.plotter_utils import query_best_scores

        un = query_best_scores("nsd", "V1", "imagenet1k", 1000, epoch=0,
                               db_path=seeded_db)
        tr = query_best_scores("nsd", "V1", "imagenet1k", 1000, epoch=20,
                               db_path=seeded_db)
        assert un["score"].mean() < tr["score"].mean()

    def test_condition_summary_ci(self, seeded_db):
        from plotters.plotter_utils import get_condition_summary

        s = get_condition_summary("nsd", "V1", "pca_labels_alexnet", 64,
                                  epoch=20, db_path=seeded_db)
        assert s["n_runs"] == 8
        assert s["ci_low"] <= s["mean"] <= s["ci_high"]


class TestFigureCLIs:
    def test_nsd_streams(self, seeded_db, tmp_path, monkeypatch):
        from plotters.nsd.plot_coarseness import main

        out = tmp_path / "figs"
        main(["--pca_labels", "alexnet", "--regions", "streams",
              "--out-dir", str(out), "--db", str(seeded_db)])
        assert (out / "coarseness_bars_alexnet.png").exists()
        assert (out / "per_subject_alexnet.png").exists()

    def test_nsd_finegrained_grid(self, seeded_db, tmp_path):
        from plotters.nsd.plot_coarseness import main

        out = tmp_path / "figs"
        main(["--pca_labels", "clip", "--regions", "finegrained",
              "--out-dir", str(out), "--db", str(seeded_db)])
        assert (out / "coarseness_bars_clip_finegrained.png").exists()

    def test_nsd_synthetic(self, seeded_db, tmp_path):
        from plotters.nsd_synthetic.plot_coarseness import main

        out = tmp_path / "figs"
        main(["--pca_labels", "alexnet", "--out-dir", str(out),
              "--db", str(seeded_db)])
        assert (out / "coarseness_bars_alexnet.png").exists()

    def test_tvsd(self, seeded_db, tmp_path):
        from plotters.tvsd.plot_coarseness import main

        out = tmp_path / "figs"
        main(["--pca_labels", "alexnet", "--out-dir", str(out),
              "--db", str(seeded_db)])
        assert (out / "coarseness_bars_alexnet.png").exists()

    def test_things_skips_per_subject(self, seeded_db, tmp_path):
        from plotters.things.plot_coarseness import main

        out = tmp_path / "figs"
        main(["--pca_labels", "alexnet", "--out-dir", str(out),
              "--db", str(seeded_db)])
        assert (out / "coarseness_bars_alexnet.png").exists()
        assert not (out / "per_subject_alexnet.png").exists()

    def test_architectures_main_figure(self, seeded_db, tmp_path):
        """The paper's main figure: label sources x granularities with
        the 1K baseline — requires pca_labels_folder filtering."""
        from plotters.plot_architectures import main

        out = tmp_path / "figs"
        main(["--dataset", "nsd", "--region", "ventral visual stream",
              "--out-dir", str(out), "--db", str(seeded_db)])
        assert (out / "architectures_nsd_ventral_visual_stream.png").exists()
        assert (out / "architectures_per_subject_nsd_ventral_visual_stream.png").exists()


class TestFrameUtilities:
    def test_avg_helpers_and_split(self, seeded_db):
        from plotters.plotter_utils import (
            avg_over_seed,
            avg_over_subject_idx,
            avg_over_subject_idx_seed,
            query_scores,
            split_and_select_df,
        )

        df = query_scores("nsd", db_path=seeded_db)
        pca_df, full_df = split_and_select_df(df, region="V1")
        assert not pca_df.empty and not full_df.empty
        assert set(pca_df["pca_labels"].astype(str).str.lower()) <= {"1", "true"}

        a = avg_over_subject_idx(pca_df)
        assert "seed" in a.columns and "score" in a.columns
        b = avg_over_seed(pca_df)
        assert "subject_idx" in b.columns
        c = avg_over_subject_idx_seed(pca_df)
        assert len(c) <= len(pca_df)

    def test_get_best_layer_scores(self, seeded_db):
        from plotters.plotter_utils import get_best_layer_scores, query_scores

        df = query_scores("nsd", db_path=seeded_db)
        res = get_best_layer_scores(df[df.pca_labels.astype(str).isin(("1", "True", "true"))],
                                    ["pca_n_classes"])
        assert all(layer == "conv5_post" for _, layer in res.values())
