"""Streaming incremental view maintenance (streaming/aggregates.py):
live fold equals batch recompute; the fence makes the NON-idempotent
additive fold exactly-once; retraction-to-zero tombstones the group.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_bus_gtfs_etl_spark.operators import ivm
from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable
from open_bus_gtfs_etl_spark.streaming.aggregates import (
    agg_state_schema,
    fold_epoch,
    start_agg_maintainer,
)
from open_bus_gtfs_etl_spark.streaming.tailer import run_until_caught_up

SRC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.DoubleType(), False),
        T.StructField("is_delete", T.BooleanType(), False),
    ]
)

SEGMENTS = [
    # epoch 0: inserts for a, b
    [("a", 1.0, False), ("a", 2.0, False), ("b", 5.0, False)],
    # epoch 1: retract one of a's rows, b fully retracted, c born
    [("a", 1.0, True), ("b", 5.0, True), ("c", 4.0, False)],
    # epoch 2: b reborn after its tombstone
    [("b", 7.0, False), ("c", 1.0, False)],
]


def _write_segments(spark, src, upto: int) -> None:
    for i, rows in enumerate(SEGMENTS[:upto]):
        spark.createDataFrame(rows, SRC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"seg={i}"))


def _expected(spark):
    all_rows = [r for seg in SEGMENTS for r in seg]
    df = spark.createDataFrame(all_rows, SRC_SCHEMA)
    sgn = F.when(F.col("is_delete"), F.lit(-1)).otherwise(F.lit(1))
    agg = df.groupBy("k").agg(
        F.sum(sgn).cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(18,4)") * sgn).alias("s"),
    )
    return {
        r["k"]: (r["n"], float(r["s"]))
        for r in agg.where(F.col("n") > 0).collect()
    }


def _state(table):
    return {
        r["k"]: (r[ivm.N_COL], float(r[ivm.SUM_COL]))
        for r in table.read().collect()
    }


def _mk_table(spark, tmp_path):
    return SnapshotParquetTable.create(
        spark,
        str(tmp_path / "aggtable"),
        agg_state_schema([T.StructField("k", T.StringType(), False)]),
        key_cols=["k"],
        n_buckets=4,
    )


def test_live_fold_equals_batch_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_segments(spark, src, upto=len(SEGMENTS))
    table = _mk_table(spark, tmp_path)
    q = start_agg_maintainer(
        spark, table, src, str(tmp_path / "ckpt"), SRC_SCHEMA,
        keys=["k"], value_col="v", available_now=True,
        max_files_per_trigger=1,
    )
    run_until_caught_up(q)
    assert _state(table) == _expected(spark)
    # b was tombstoned at epoch 1 and REBORN at epoch 2: its maintained
    # state restarts from zero, not from the retracted sums
    assert _state(table)["b"] == (1, 7.0)


def test_double_apply_is_fenced(spark, tmp_path):
    """Additive folds are NOT idempotent — re-applying an epoch must be
    dropped by the fence, not re-folded (double-count otherwise)."""
    table = _mk_table(spark, tmp_path)
    batch = spark.createDataFrame(SEGMENTS[0], SRC_SCHEMA)
    st = fold_epoch(table, batch, 0, ["k"], "v", "is_delete")
    assert not st.get("skipped_fenced")
    before = _state(table)
    assert before["a"] == (2, 3.0)
    st2 = fold_epoch(table, batch, 0, ["k"], "v", "is_delete")
    assert st2.get("skipped_fenced")
    assert _state(table) == before  # no double-count


def test_untouched_groups_survive(spark, tmp_path):
    """The fold prunes state to touched groups — untouched rows must
    keep their values through the merge (not vanish, not rewrite)."""
    table = _mk_table(spark, tmp_path)
    fold_epoch(
        table,
        spark.createDataFrame(SEGMENTS[0], SRC_SCHEMA),
        0, ["k"], "v", "is_delete",
    )
    fold_epoch(
        table,
        spark.createDataFrame([("c", 9.0, False)], SRC_SCHEMA),
        1, ["k"], "v", "is_delete",
    )
    got = _state(table)
    assert got["a"] == (2, 3.0) and got["b"] == (1, 5.0)
    assert got["c"] == (1, 9.0)
