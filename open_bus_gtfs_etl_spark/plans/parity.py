"""Local emulation of the driver's correctness gate: run each Spark
query and its DuckDB oracle on the same sf dir, compare row count,
column names, and order-insensitive values. Used by the test suite and
by hand while iterating.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", f"{v:.10g}")
    if isinstance(v, bool):
        return ("b", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return v


def compare(spark_df, con, sql: str) -> dict:
    """Returns {'match': bool, 'detail': str}."""
    s_cols = sorted(spark_df.columns)
    s_rows = [tuple(_norm_cell(r[c]) for c in s_cols) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols_raw = [d[0] for d in res.description]
    d_all = res.fetchall()
    d_cols = sorted(d_cols_raw)
    idx = [d_cols_raw.index(c) for c in d_cols]
    d_rows = [tuple(_norm_cell(row[i]) for i in idx) for row in d_all]

    if s_cols != d_cols:
        return {"match": False, "detail": f"columns spark={s_cols} duckdb={d_cols}"}
    if len(s_rows) != len(d_rows):
        return {"match": False, "detail": f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}"}
    s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
    if s_sorted != d_sorted:
        diff = [
            (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
        ][:3]
        return {"match": False, "detail": f"values differ, first diffs: {diff}"}
    return {"match": True, "detail": f"{len(s_rows)} rows"}
