"""Local mimic of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + column names +
order-insensitive value hash).

Usage: python scripts/check_contract.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append("|".join("<N>" if pd.isna(v) else str(v) for v in tup))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry_mod
    from wbkg.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(pdf)} rows ({dt:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            n_fail += 1
            continue
        problems = []
        if len(pdf) != len(odf):
            problems.append(f"rows {len(pdf)} != {len(odf)}")
        if sorted(pdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(pdf.columns)} != {sorted(odf.columns)}")
        if not problems and value_hash(pdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            merged = pdf.merge(odf, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(pdf)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
