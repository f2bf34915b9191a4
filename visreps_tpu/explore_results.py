"""Results dashboard CLI over results.db.

Reference parity: scripts/explore_results.py:1-431 — completeness
matrix vs expected anatomy (subjects × regions × seeds per dataset /
analysis), per-run summaries, arbitrary SQL passthrough.

Usage:
  python -m visreps_tpu.explore_results summary
  python -m visreps_tpu.explore_results completeness --neural-dataset nsd --analysis rsa
  python -m visreps_tpu.explore_results sql "SELECT ... "
"""
from __future__ import annotations

import argparse
import sqlite3
from pathlib import Path

import pandas as pd

from visreps_tpu.core.db import RESULTS_DB_PATH

# Expected anatomy per dataset (reference: explore_results.py:51-62)
EXPECTED_ANATOMY = {
    "nsd": {
        "subjects": [str(i) for i in range(8)],
        "regions": ["early visual stream", "ventral visual stream",
                    "V1", "V2", "V3", "hV4", "FFA", "PPA"],
        "seeds": [1, 2, 3],
    },
    "nsd_synthetic": {
        "subjects": [str(i) for i in range(8)],
        "regions": ["early visual stream", "ventral visual stream",
                    "V1", "V2", "V3", "hV4", "FFA", "PPA"],
        "seeds": [1, 2, 3],
    },
    "tvsd": {
        "subjects": ["0", "1"],
        "regions": ["V1", "V4", "IT"],
        "seeds": [1, 2, 3],
    },
    "things-behavior": {
        "subjects": ["N/A"],
        "regions": ["N/A"],
        "seeds": [1, 2, 3],
    },
}


def _connect(db_path=None) -> sqlite3.Connection:
    path = Path(db_path) if db_path else RESULTS_DB_PATH
    if not path.exists():
        raise FileNotFoundError(f"No results DB at {path}")
    return sqlite3.connect(str(path))


def summary(db_path=None) -> pd.DataFrame:
    conn = _connect(db_path)
    df = pd.read_sql_query(
        """SELECT neural_dataset, analysis, compare_method,
                  COUNT(*) AS rows, COUNT(DISTINCT run_id) AS runs,
                  MIN(score) AS min_score, MAX(score) AS max_score
           FROM results
           GROUP BY neural_dataset, analysis, compare_method""",
        conn,
    )
    conn.close()
    return df


def completeness(neural_dataset: str, analysis: str = "rsa", db_path=None) -> pd.DataFrame:
    """Subjects × regions × seeds presence matrix vs expected anatomy."""
    anatomy = EXPECTED_ANATOMY[neural_dataset]
    conn = _connect(db_path)
    df = pd.read_sql_query(
        """SELECT DISTINCT subject_idx, region, seed FROM results
           WHERE neural_dataset=? AND analysis=?""",
        conn, params=(neural_dataset, analysis),
    )
    conn.close()
    have = {(r.subject_idx, r.region, r.seed) for r in df.itertuples()}

    rows = []
    for region in anatomy["regions"]:
        for subj in anatomy["subjects"]:
            row = {"region": region, "subject": subj}
            for seed in anatomy["seeds"]:
                row[f"seed{seed}"] = "x" if (subj, region, seed) in have else "."
            rows.append(row)
    out = pd.DataFrame(rows)
    total = len(anatomy["regions"]) * len(anatomy["subjects"]) * len(anatomy["seeds"])
    done = len(have)
    print(f"{neural_dataset}/{analysis}: {done}/{total} (subject, region, seed) cells present")
    return out


def db_info(db_path=None) -> dict:
    """File size, date range, per-table row counts.

    Reference: scripts/explore_results.py:127-145.
    """
    path = Path(db_path) if db_path else RESULTS_DB_PATH
    conn = _connect(db_path)
    cur = conn.cursor()
    info = {"file": str(path), "size_mb": path.stat().st_size / 1e6}
    lo, hi = cur.execute(
        "SELECT MIN(created_at), MAX(created_at) FROM run_configs").fetchone()
    info["date_range"] = (lo, hi)
    names = [r[0] for r in cur.execute(
        "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name").fetchall()]
    tables = {t: cur.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
              for t in names}
    info["tables"] = tables
    conn.close()
    print(f"  File: {info['file']}  ({info['size_mb']:.1f} MB)")
    print(f"  Date range: {lo} → {hi}")
    for t, n in tables.items():
        print(f"  {t:30s} {n:>8,} rows")
    return info


def distinct_values(db_path=None) -> dict:
    """Distinct values of every filterable column.

    Reference: scripts/explore_results.py:147-158.
    """
    conn = _connect(db_path)
    cur = conn.cursor()
    out = {}
    for col in ("neural_dataset", "analysis", "compare_method", "region",
                "cfg_id", "seed", "pca_labels_folder", "model_name"):
        vals = [str(r[0]) for r in cur.execute(
            f"SELECT DISTINCT {col} FROM results ORDER BY {col}")]
        out[col] = vals
        print(f"  {col:25s} {', '.join(vals)}")
    conn.close()
    return out


def health(db_path=None) -> dict:
    """Cross-table consistency checks.

    Reference: scripts/explore_results.py:301-354 — orphaned results
    (no run_configs row), runs without bootstrap distributions or
    layer-selection scores, NULL scores.
    """
    conn = _connect(db_path)
    cur = conn.cursor()
    checks = {}
    checks["orphaned_results"] = cur.execute(
        """SELECT COUNT(DISTINCT r.run_id) FROM results r
           LEFT JOIN run_configs rc ON r.run_id = rc.run_id
           WHERE rc.run_id IS NULL""").fetchone()[0]
    total = cur.execute("SELECT COUNT(DISTINCT run_id) FROM results").fetchone()[0]
    checks["total_runs"] = total
    checks["runs_without_bootstrap"] = cur.execute(
        """SELECT COUNT(DISTINCT r.run_id) FROM results r
           LEFT JOIN bootstrap_distributions bd
             ON r.run_id = bd.run_id AND r.compare_method = bd.compare_method
           WHERE bd.run_id IS NULL""").fetchone()[0]
    checks["runs_without_layer_selection"] = cur.execute(
        """SELECT COUNT(DISTINCT r.run_id) FROM results r
           LEFT JOIN (SELECT DISTINCT run_id FROM layer_selection_scores) ls
             ON r.run_id = ls.run_id
           WHERE ls.run_id IS NULL""").fetchone()[0]
    checks["null_scores"] = cur.execute(
        "SELECT COUNT(*) FROM results WHERE score IS NULL").fetchone()[0]
    conn.close()
    for name in ("orphaned_results", "null_scores"):
        status = "OK" if checks[name] == 0 else f"WARN: {checks[name]}"
        print(f"  {name:30s} {status}")
    for name in ("runs_without_bootstrap", "runs_without_layer_selection"):
        have = total - checks[name]
        print(f"  {name:30s} {have}/{total} covered")
    return checks


def recent(n: int = 10, db_path=None) -> pd.DataFrame:
    """Last-n saved runs with their identity columns.

    Reference: scripts/explore_results.py:356-366.
    """
    conn = _connect(db_path)
    df = pd.read_sql_query(
        """SELECT rc.created_at, r.neural_dataset, r.analysis,
                  r.pca_labels_folder, r.cfg_id, r.seed, r.region, r.subject_idx
           FROM run_configs rc JOIN results r ON rc.run_id = r.run_id
           ORDER BY rc.created_at DESC LIMIT ?""",
        conn, params=(n,),
    )
    conn.close()
    return df


def run_sql(query: str, db_path=None) -> pd.DataFrame:
    conn = _connect(db_path)
    df = pd.read_sql_query(query, conn)
    conn.close()
    return df


def main(argv=None):
    parser = argparse.ArgumentParser(description="Explore results.db")
    parser.add_argument("command", choices=[
        "summary", "completeness", "sql", "info", "distinct", "health",
        "recent", "all"])
    parser.add_argument("query", nargs="?", default=None)
    parser.add_argument("--neural-dataset", default="nsd")
    parser.add_argument("--analysis", default="rsa")
    parser.add_argument("--recent-n", type=int, default=10)
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    pd.set_option("display.width", 200)
    pd.set_option("display.max_rows", 300)
    if args.command == "summary":
        print(summary(args.db))
    elif args.command == "completeness":
        print(completeness(args.neural_dataset, args.analysis, args.db))
    elif args.command == "info":
        db_info(args.db)
    elif args.command == "distinct":
        distinct_values(args.db)
    elif args.command == "health":
        health(args.db)
    elif args.command == "recent":
        print(recent(args.recent_n, args.db))
    elif args.command == "all":
        print("== DATABASE INFO ==")
        db_info(args.db)
        print("\n== DISTINCT VALUES ==")
        distinct_values(args.db)
        print("\n== SUMMARY ==")
        print(summary(args.db))
        print("\n== HEALTH ==")
        health(args.db)
        print(f"\n== RECENT ({args.recent_n}) ==")
        print(recent(args.recent_n, args.db))
    else:
        if not args.query:
            raise SystemExit("sql command requires a query argument")
        print(run_sql(args.query, args.db))


if __name__ == "__main__":
    main()
