"""Driver-mimic: run every queries() entry vs its oracle_sql() in DuckDB,
compare row-count + order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry
from project_gutenberg_full_text_search_spark.session import get_spark
from project_gutenberg_full_text_search_spark.sources.tables import TESTDATA_TABLES


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:10] if s.endswith("00:00:00") else s
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs = entry.queries()
    osql = entry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"ROWS  {name}: {len(got)} rows ({dt:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(osql[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        cg, ce = canon(got), canon(exp)
        if len(cg) != len(ce):
            print(f"FAIL  {name}: rows {len(cg)} != {len(ce)}")
            n_fail += 1
        elif cg != ce:
            diffs = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
            print(f"FAIL  {name}: values differ at {diffs[:3]}")
            for i in diffs[:2]:
                print(f"      got {cg[i]}")
                print(f"      exp {ce[i]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(cg)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
