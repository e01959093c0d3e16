"""Driver-style correctness check for selected catalog queries: runs
QUERIES[k] on Spark and ORACLES[k] on DuckDB over the same sf dir,
compares row count, column names, and a sorted value hash.

Usage: python bench/check_oracle.py <sf_dir> [query ...]   (default: all)
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _hash_frame(pdf) -> str:
    import pandas as pd
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    from open_bus_gtfs_etl_spark.plans.queries import ORACLES, QUERIES
    from open_bus_gtfs_etl_spark.session import get_spark

    names = sys.argv[2:] or [k for k in QUERIES if k in ORACLES]
    spark = get_spark(app_name="check", master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed = []
    for k in names:
        if k not in ORACLES:
            print(f"{k}: no oracle (rows-only)")
            continue
        sp = QUERIES[k](spark, sf_dir).toPandas()
        ora = con.execute(ORACLES[k]).df()
        ok_rows = len(sp) == len(ora)
        ok_cols = sorted(sp.columns) == sorted(ora.columns)
        ok_hash = ok_cols and _hash_frame(sp) == _hash_frame(ora)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{k}: {status} spark_rows={len(sp)} oracle_rows={len(ora)} "
              f"cols={ok_cols} hash={ok_hash}")
        if status == "FAIL":
            failed.append(k)
    spark.stop()
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all green")


if __name__ == "__main__":
    main()
