#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by all columns, and
compares values. Exit 0 iff everything matches.
"""
import json
import math
import sys
import time

import duckdb
import pyarrow.parquet as pq
import pandas as pd

# Hard per-oracle DuckDB budget: the round-10 driver gate recorded an
# EMPTY artifact after the full sweep crossed ~17 min (the classifier
# CTE unrolls alone were ~2 min each when DuckDB inlined their CTEs).
# Any single oracle slower than this fails the gate IN-REPO so an
# oracle-cost regression is caught before the driver's gate times out.
# Overridable (ORACLE_CEILING_SEC=30 python3 tools/check_oracle.py ...)
# because wall-clock is machine-sensitive: a loaded box can push the
# same SQL over a fixed bar with zero code regression. Between the
# default ceiling and 2x, the tool WARNS instead of failing — only a
# >=2x overrun (unambiguously a cost regression, not scheduler noise)
# is a hard failure at the default setting.
import os
ORACLE_CEILING_SEC = float(os.environ.get("ORACLE_CEILING_SEC", "10.0"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_kind(dtype) -> str:
    """Coarse dtype class for the type-sensitivity check: the driver's
    hash distinguishes integer from float from everything else (round 6's
    one red row was DuckDB HUGEINT/float64 vs Spark BIGINT with identical
    values), so the replica must too. NULL-bearing int columns come back
    as object/float in pandas depending on the engine, so we only class
    the kinds that provably diverge in the driver's hash."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def dtype_mismatches(s: pd.DataFrame, d: pd.DataFrame) -> list:
    """Columns whose dtype KIND differs between the Spark dump and the
    DuckDB result — int-vs-float (or numeric-vs-other) means the driver
    hashes different byte strings even when every value matches."""
    bad = []
    for c in sorted(set(s.columns) & set(d.columns)):
        ks, kd = dtype_kind(s[c].dtype), dtype_kind(d[c].dtype)
        if ks != kd:
            # 'other' may be a nullable-int masquerading as object; only
            # flag the unambiguous numeric-kind divergences.
            if "other" in (ks, kd):
                continue
            bad.append((c, ks, kd))
    return bad


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to comparable strings
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            # Compare floats at 12 significant digits. The engine aims for
            # bit-identical float results (exact decimal intermediates, see
            # Aggregates.scala), but the driver's gate hashed q1_agg green
            # in round 1 while exact repr() here flagged a 1-ulp diff —
            # a documented-precision compare keeps this tool aligned with
            # the driver rather than stricter than it.
            return f"{v:.12g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written
        # corpora (EdgeCorpus, ScaleCheck) are part-file directories
        p = f"{sf_dir}/{t}.parquet"
        pat = p if os.path.isfile(p) else f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        t0 = time.time()
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        duck_ms = (time.time() - t0) * 1000.0
        if duck_ms > 2.0 * ORACLE_CEILING_SEC * 1000.0:
            print(f"FAIL {name}: oracle cost {duck_ms:.0f} ms exceeds 2x "
                  f"the {ORACLE_CEILING_SEC:.0f} s ceiling — cheapen the SQL "
                  "(MATERIALIZED CTEs / bounded slice) before the driver's "
                  "gate times out")
            failures += 1
            continue
        if duck_ms > ORACLE_CEILING_SEC * 1000.0:
            print(f"WARN {name}: oracle cost {duck_ms:.0f} ms over the "
                  f"{ORACLE_CEILING_SEC:.0f} s ceiling (machine noise or "
                  "a real cost creep — investigate before the next round)")
        kinds = dtype_mismatches(spark_df, duck_df)
        if kinds:
            print(f"FAIL {name}: dtype kind mismatch "
                  + ", ".join(f"{c} spark={ks} duck={kd}"
                              for c, ks, kd in kinds))
            failures += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} "
                  f"duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        if len(s) == 0:  # both empty + same columns: equal by definition
            print(f"PASS {name}: 0 rows ({duck_ms:.0f} ms duckdb)")
            continue
        if not s.equals(d):
            neq = (s != d).any(axis=1)
            idx = list(s.index[neq])[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(s)} rows differ; "
                  f"first diffs:")
            for i in idx:
                print(f"  spark: {s.loc[i].to_dict()}")
                print(f"  duck : {d.loc[i].to_dict()}")
            failures += 1
            continue
        print(f"PASS {name}: {len(s)} rows ({duck_ms:.0f} ms duckdb)")
    # queries with no oracle: rows-only check
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = pq.read_table(p).num_rows
                print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
                if n == 0:
                    failures += 1
            except Exception as e:
                print(f"FAIL {name}: unreadable ({e})")
                failures += 1
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
