"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: derive a CDC change feed from the
sf0.001 ``events`` table, replay it through the engine's real
merge-apply kernel into a snapshot-parquet lake table, return the
materialized final state.

``queries()`` / ``oracle_sql()`` — the operator catalog in
``open_bus_gtfs_etl_spark/plans/queries.py``, one entry per
implemented operator family from SURVEY.md §2 plus the
training-data operators (dedup / text quality / embeddings).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from open_bus_gtfs_etl_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC replay through the engine on sf0.001-derived events."""
    from pyspark.sql import functions as F

    from open_bus_gtfs_etl_spark.operators.merge import apply_batch
    from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
    from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # map the events table onto the CDC envelope: key=(user_id→conv_id,
    # k%16→turn_idx), lsn=event_id, delete on 'error'
    feed = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "delete").otherwise("update").alias("op"),
        F.col("ts"),
        F.format_string("conv-%012d", F.col("user_id")).alias("conv_id"),
        F.pmod(F.get_json_object("props", "$.k").cast("int"), F.lit(16)).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("event_type").alias("text"),
        F.lit(None).cast("string").alias("tool"),
    )
    work = tempfile.mkdtemp(prefix="entry_lake_")
    table = SnapshotParquetTable.create(
        spark, os.path.join(work, "lake"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=8,
    )
    apply_batch(table, feed, batch_id=0, stats=False)
    return table.read()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
