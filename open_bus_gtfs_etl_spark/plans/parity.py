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


def _strict_cell(v):
    """Bit-exact normalization: floats by IEEE bits, ints as ints,
    everything else by (type, repr). No cross-type coercion — this is
    the round-2 reading of the driver hash: representation matters."""
    import numpy as np

    if isinstance(v, (bool, type(None), str)):
        return v
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "nan")
        return ("f", f.hex())
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    return ("o", repr(v))


def compare_strict(spark_df, con, sql: str) -> dict:
    """Emulate the driver's value-hash gate: both results go through the
    pandas path (Spark .toPandas(), DuckDB .df()), columns sorted by
    name, rows sorted, every cell compared bit-exactly with its dtype.
    A pass here is strong evidence the driver's hash will match."""
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        return {"match": False, "detail": f"columns spark={s_cols} duckdb={d_cols}"}
    if len(s_pdf) != len(d_pdf):
        return {"match": False, "detail": f"rowcount spark={len(s_pdf)} duckdb={len(d_pdf)}"}
    s_rows = sorted(
        tuple(_strict_cell(s_pdf[c].iloc[i]) for c in s_cols) for i in range(len(s_pdf))
    )
    d_rows = sorted(
        tuple(_strict_cell(d_pdf[c].iloc[i]) for c in d_cols) for i in range(len(d_pdf))
    )
    if s_rows != d_rows:
        diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        return {"match": False, "detail": f"strict values differ, first diffs: {diff}"}
    # dtype-level check: DECIMAL columns arrive as object (Decimal) from
    # Spark but float64 from DuckDB — the representation split the
    # round-1 hash failures traced to
    s_dt = {c: str(s_pdf[c].dtype) for c in s_cols}
    d_dt = {c: str(d_pdf[c].dtype) for c in d_cols}
    bad = {
        c: (s_dt[c], d_dt[c])
        for c in s_cols
        if s_dt[c] != d_dt[c]
        # ns-vs-us timestamp resolution is a pandas conversion artifact
        # the driver hash demonstrably tolerates (j9 was hash-green in
        # round 1 with this exact split); values compare via isoformat
        and not (s_dt[c].startswith("datetime64") and d_dt[c].startswith("datetime64"))
    }
    if bad:
        return {"match": False, "detail": f"dtype mismatch {bad}"}
    return {"match": True, "detail": f"{len(s_rows)} rows strict"}


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
