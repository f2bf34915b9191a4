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


def run_sql(query: str, db_path=None) -> pd.DataFrame:
    conn = _connect(db_path)
    df = pd.read_sql_query(query, conn)
    conn.close()
    return df


def main(argv=None):
    parser = argparse.ArgumentParser(description="Explore results.db")
    parser.add_argument("command", choices=["summary", "completeness", "sql"])
    parser.add_argument("query", nargs="?", default=None)
    parser.add_argument("--neural-dataset", default="nsd")
    parser.add_argument("--analysis", default="rsa")
    parser.add_argument("--db", default=None)
    args = parser.parse_args(argv)

    pd.set_option("display.width", 200)
    pd.set_option("display.max_rows", 300)
    if args.command == "summary":
        print(summary(args.db))
    elif args.command == "completeness":
        print(completeness(args.neural_dataset, args.analysis, args.db))
    else:
        if not args.query:
            raise SystemExit("sql command requires a query argument")
        print(run_sql(args.query, args.db))


if __name__ == "__main__":
    main()
