"""Per-batch / per-partition lineage + metrics table (SURVEY.md §7 step 7).

The analogue of the reference's ``gtfs_data`` state machine rows
(idempotent_process.py:57-91: started/completed/success/error per date)
combined with its per-loader stats counters (load_stops_to_db.py:51-63,
rolled up at idempotent_process.py:34-54). One row per (batch, bucket)
plus a batch-level row (partition_id = -1), appended as parquet.

The lineage table is itself queryable with plain DataFrame ops — the
reference's "which dates processed successfully" predicate
(idempotent_process.py:97-98) becomes ``where(success)``, and the
newest-first work ordering (W2) becomes ``orderBy(desc(batch_id))``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import LINEAGE_SCHEMA


class LineageLog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def record(self, batch_id: int, stat: dict, error: str | None = None) -> None:
        """Append lineage rows for one merge. ``stat`` is the dict
        returned by ``apply_batch`` / ``LakeTable.merge``."""
        ts = self.spark.sql("select current_timestamp() as t").collect()[0]["t"]
        base = {
            "batch_id": int(batch_id),
            "started_at": ts,
            "completed_at": ts,
            "success": error is None and not stat.get("skipped_fenced", False),
            "error": error,
        }
        rows = []

        def mk(partition_id: int, src: dict) -> dict:
            return {
                **base,
                "partition_id": partition_id,
                # MoR merges report an undifferentiated upsert count
                "rows_inserted": int(
                    src.get("rows_inserted", src.get("inserted", src.get("rows_upserted", 0)))
                    or 0
                ),
                "rows_updated": int(src.get("rows_updated", src.get("updated", 0)) or 0),
                "rows_deleted": int(src.get("rows_deleted", src.get("deleted", 0)) or 0),
                "rows_deduped": int(stat.get("rows_deduped") or 0) if partition_id == -1 else 0,
                "rows_stale_skipped": int(
                    src.get("rows_stale_skipped", src.get("stale_skipped", 0)) or 0
                ),
                "lsn_min": src.get("lsn_min"),
                "lsn_max": src.get("lsn_max"),
            }

        rows.append(mk(-1, stat))
        for bucket, pb in (stat.get("per_bucket") or {}).items():
            rows.append(mk(int(bucket), pb))
        df = self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.root)

    def read(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.root)

    def successful_batches(self) -> set[int]:
        """Batch ids with a successful batch-level row — the skip set
        for newest-first replay (the reference's 'date already
        processed' check, idempotent_process.py:97-98)."""
        from pyspark.sql import functions as F

        try:
            rows = (
                self.read()
                .where(F.col("success") & (F.col("partition_id") == -1))
                .select("batch_id")
                .distinct()
                .collect()
            )
        except Exception:  # noqa: BLE001 - empty log dir
            return set()
        return {int(r.batch_id) for r in rows}

    def last_successful_batch(self) -> int | None:
        """W1/J10 shape: latest successful batch (the as-of 'nearest
        usable snapshot' check, idempotent_process.py:94-104)."""
        from pyspark.sql import functions as F

        rows = (
            self.read()
            .where((F.col("success")) & (F.col("partition_id") == -1))
            .agg(F.max("batch_id").alias("b"))
            .collect()
        )
        return rows[0]["b"] if rows and rows[0]["b"] is not None else None
