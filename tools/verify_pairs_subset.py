"""Oracle-verify the quadratic pair queries at sf0.1 scale via a
deterministic id-subset.

The six pair-producing dedup queries (ngram_jaccard, minhash_lsh, simhash,
embedding_cosine, embedding_cosine_blocked, clusters) have DuckDB oracles
that are quadratic in the document count — infeasible at sf0.1's 5k docs.
This tool closes that gap without weakening the check: it materializes a
RESTRICTED copy of the sf0.1 tables (documents: doc_id % K == 0,
embeddings: vec_id % K == 0 — deterministic, so both engine and oracle see
the identical corpus) and runs the untouched ``queries()`` /
``oracle_sql()`` pairs over it.  With K=3 the subset is ~1.7k docs — 3.3×
the sf0.01 gate corpus, with a pair space DuckDB still handles.

Pairs whose members straddle the subset boundary disappear from BOTH sides
equally, so the comparison stays exact; the tool asserts the engine output
is non-trivial so a degenerate (everything-filtered) run can't pass
silently.

Usage: python tools/verify_pairs_subset.py [K]
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

SRC = os.environ.get("PAIRS_SRC_SF_DIR", "/root/testdata/sf0.1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OUT = f"/tmp/sf01_subset_k{K}"

PAIR_QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_blocked",
    "dedup_clusters",
    "dedup_incremental_minhash",  # its jac CTE is the same quadratic oracle
    "dedup_incremental_indexed",
    "dedup_incremental_full",
    "corpus_ingest_survivors",    # composes the same jac CTE (round 7)
    "dedup_prefix_jaccard",       # all-pairs token-set oracle (round 7)
    "dedup_edit_distance",        # quadratic levenshtein oracle (round 8)
    "leakage_cross_split_pairs",  # quadratic cross-split cosine oracle (round 8)
    "semdedup_survivors",         # within-cluster pair oracle (round 8)
    "corpus_ingest_clean_tokens", # composes the jac CTE + span removal (round 8)
    "leakage_safe_split_counts",  # recursive component CTE over pairs (round 8)
    "knn_join_topk",              # quadratic per-query neighbor oracle (round 8)
    "dedup_keep_best_survivors",  # components + margin argmax (round 8)
    "dedup_source_matrix",        # pair labeling join (round 8)
    "dedup_components_star",      # recursive component CTE, star engine (round 9)
    "winnow_match_pairs",         # quadratic shared-fingerprint oracle (round 9)
    "dedup_containment_pairs",    # directed containment pair oracle (round 8)
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_subset() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst):
            continue
        if t == "documents":
            sql = f"SELECT * FROM '{SRC}/{t}.parquet' WHERE doc_id % {K} = 0"
        elif t == "embeddings":
            sql = f"SELECT * FROM '{SRC}/{t}.parquet' WHERE vec_id % {K} = 0"
        else:
            sql = f"SELECT * FROM '{SRC}/{t}.parquet'"
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    print(f"subset ready at {OUT}: {n} documents (K={K})")


if __name__ == "__main__":
    build_subset()
    env = dict(os.environ, DRIVE_SF_DIR=OUT)
    driver = os.path.join(os.path.dirname(os.path.abspath(__file__)), "drive_entry.py")
    rc = subprocess.call(
        [sys.executable, driver, *PAIR_QUERIES], env=env
    )
    sys.exit(rc)
