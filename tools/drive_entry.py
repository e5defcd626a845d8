"""Driver-mimic verification sweep: consume __spark_entry__ from a plain
SparkSession and hash-compare every query against its DuckDB oracle at sf0.01.
"""
import datetime as dt
import decimal
import math
import os
import sys
import traceback

# repo root = parent of tools/ — works from any checkout location
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

spark = SparkSession.builder.master("local[8]").getOrCreate()

import __spark_entry__ as entry_mod

# smoke: entry()
edf = entry_mod.entry(spark)
erows = edf.collect()
print(f"entry(): OK rows={len(erows)} cols={edf.columns}")

duck = duckdb.connect()
for t in TABLES:
    duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    return str(v)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


queries = entry_mod.queries()
oracles = entry_mod.oracle_sql()
# the query() decorator raises on duplicate names at import time; keep a
# belt-and-braces check here so a registry regression can't silently
# shadow a gated capability again (pre-r9 defect)
assert len(queries) == len(set(queries)), "duplicate query names"
assert set(oracles) <= set(queries), "oracle without a query"
only = set(sys.argv[1:])
ok = fail = rows_only = 0
results = {}
for name in sorted(queries):
    if only and name not in only:
        continue
    try:
        sdf = queries[name](spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: rows={len(srows)}")
            results[name] = {"status": "rows_only", "spark_rows": len(srows)}
            rows_only += 1
            continue
        ores = duck.execute(sql)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        results[name] = {"spark_rows": len(srows), "oracle_rows": len(orows)}
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: schema spark={sorted(scols)} oracle={sorted(ocols)}")
            results[name]["status"] = "fail_schema"
            fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            results[name]["status"] = "fail_rows"
            fail += 1
            continue
        sm, om = _multiset(srows, scols), _multiset(orows, ocols)
        if sm != om:
            diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs {diff}")
            results[name]["status"] = "fail_values"
            fail += 1
            continue
        print(f"OK   {name}: rows={len(srows)}")
        results[name]["status"] = "ok"
        ok += 1
    except Exception:
        print(f"FAIL {name}: exception")
        traceback.print_exc(limit=3)
        results[name] = {"status": "fail_exception"}
        fail += 1

print(f"\nTOTAL ok={ok} fail={fail} rows_only={rows_only}")
# Optional machine-readable artifact (DRIVE_JSON_OUT=path): the committed
# CORRECTNESS_LOCAL_r{N}.json full-sweep record — gives every registered
# query auditable recent evidence between its (rotating) hard gate rows.
out_path = os.environ.get("DRIVE_JSON_OUT")
if out_path:
    import json

    with open(out_path, "w") as fh:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "total": {"ok": ok, "fail": fail, "rows_only": rows_only},
                "queries": results,
            },
            fh,
            indent=1,
        )
        fh.write("\n")
sys.exit(1 if fail else 0)
