"""Streaming incremental view maintenance — a fenced foreachBatch that
folds each micro-batch of an insert/retract stream into a maintained
aggregate table (operators/ivm.py), exactly-once.

Why fencing is LOAD-BEARING here where the transcript tailer's is a
throughput nicety: the LWW merge is naturally idempotent (re-applying
a batch re-selects the same winners), but an additive fold is NOT —
re-applying a delta double-counts it. So a redelivered epoch must be
dropped by the sink's fence, not absorbed by semantics. This reuses
the lake table's per-writer fence + atomic manifest swap verbatim: the
fold result is expressed as a winners frame (op = update, or delete
for groups whose maintained count reached 0 — a tombstone, so stale
rows leave the view exactly as a full recompute would drop them) and
committed through ``table.merge``, whose fence-check/commit is the
same one the CDC replay path proves out (tests/test_merge_replay.py).

Input contract: a RETRACT stream (each row is an insert or a
retraction of a prior insert — Debezium-style before/after images
flatten to this). An UPSERT stream must be converted first (emit a
retraction of the previous image per key); folding upserts additively
would double-count updates, which is exactly the mistake this module's
contract exists to make unrepresentable.

100-TB shape: per micro-batch cost is O(|delta| + |touched groups|) —
the delta's own map-combined partial aggregation, a semi-join that
prunes the stored state to the groups this batch touches (bucketed
base, keys-only build side), and a merge over those groups. The
10^10-row base table is never rescanned.

Reference analogue: the reference rebuilds its daily stats dicts by
reprocessing the whole day whenever anything changes
(load_stops_to_db.py:25,51-63; idempotent_process.py:34-54); this is
the continuous, no-rescan form.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import ivm
from .tailer import stream_writer_id


def agg_state_schema(key_fields: list[T.StructField]) -> T.StructType:
    """User schema for a maintained (count, sum) aggregate table."""
    return T.StructType(
        key_fields
        + [
            T.StructField(ivm.N_COL, T.LongType(), False),
            T.StructField(ivm.SUM_COL, T.DecimalType(28, 4), True),
        ]
    )


def fold_epoch(
    table,
    batch: DataFrame,
    epoch_id: int,
    keys: list[str],
    value_col: str,
    is_delete_col: str,
    writer: str = "default",
) -> dict:
    """Fold ONE micro-batch into the maintained table through the fenced
    merge. Exposed separately from the stream wiring so the
    double-apply fence property is directly testable."""
    if epoch_id <= table.last_committed_batch(writer):
        # cheap pre-check; merge() re-checks under the same fence
        return {"skipped_fenced": True}
    delta = ivm.delta_state(
        batch,
        keys,
        F.col(value_col).cast("decimal(18,4)"),
        F.col(is_delete_col),
    )
    # prune stored state to the groups this batch touches: the fold
    # then costs O(|delta groups|), and untouched groups keep their
    # rows (merge only sees touched keys)
    state = table.read().join(delta.select(*keys), on=keys, how="left_semi")
    folded = ivm.maintain(state, delta, keys, drop_nonpositive=False)
    winners = folded.select(
        *keys,
        F.greatest(F.col(ivm.N_COL), F.lit(0)).alias(ivm.N_COL),
        F.when(F.col(ivm.N_COL) > 0, F.col(ivm.SUM_COL)).alias(ivm.SUM_COL),
        F.when(F.col(ivm.N_COL) > 0, F.lit("update"))
        .otherwise(F.lit("delete"))
        .alias("op"),
        F.lit(int(epoch_id)).alias("lsn"),
        # deterministic: the epoch IS the time axis for state versions
        F.timestamp_seconds(F.lit(int(epoch_id))).alias("ts"),
    )
    return table.merge(winners, epoch_id, writer=writer)


def start_agg_maintainer(
    spark: SparkSession,
    table,
    src_glob: str,
    checkpoint_dir: str,
    schema: T.StructType,
    keys: list[str],
    value_col: str,
    is_delete_col: str = "is_delete",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
    max_retries: int = 2,
    retry_backoff_sec: float = 0.0,
):
    """Tail a retract-stream directory into a maintained aggregate
    table. Offsets live in the checkpoint; the fence lives in the
    table, namespaced by the checkpoint identity (``stream_writer_id``)
    — the same exactly-once split as the transcript tailer."""
    writer_id = stream_writer_id(checkpoint_dir)

    def _apply(batch_df, epoch_id: int) -> None:
        attempt = 0
        while True:
            try:
                fold_epoch(
                    table, batch_df, epoch_id, keys, value_col,
                    is_delete_col, writer=writer_id,
                )
                return
            except Exception:  # noqa: BLE001
                attempt += 1
                if attempt > max_retries:
                    raise
                if retry_backoff_sec:
                    time.sleep(retry_backoff_sec * attempt)

    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_glob)
    out = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        out = out.trigger(availableNow=True)
    return out.start()
