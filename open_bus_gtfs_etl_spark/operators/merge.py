"""Merge-apply kernel: one CDC micro-batch → lake table (SURVEY.md §7 step 2).

Pipeline per batch (the E1 loader loop re-expressed as one DataFrame
program; reference: idempotent_process.py:31-54 runs four keyed upsert
loaders — here there is one generalized keyed upsert):

  1. align the batch to the table schema (schema registry: v1 events
     lack ``tool`` → null; reference analogue: fixed ORM schema absorbs
     inferred CSV schema);
  2. LWW dedup to one winner per key, KEEPING ``op`` on the winner
     (delete must beat older update, lose to newer);
  3. ``LakeTable.merge`` — fenced, copy-on-write, out-of-order-gated;
  4. emit a stats/lineage row per batch (reference: stats dicts summed
     across tasks, idempotent_process.py:34-54 + gtfs_data state row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import KEY_COLS, VALUE_COLS
from .dedup import lww_dedup_agg, lww_dedup_salted


def align_to_schema(batch: DataFrame, stored_schema) -> DataFrame:
    """Add missing columns as typed nulls (late-added-column evolution)."""
    out = batch
    for field in stored_schema.fields:
        if field.name.startswith("_"):
            continue
        if field.name not in out.columns:
            out = out.withColumn(field.name, F.lit(None).cast(field.dataType))
    return out


def apply_batch(
    table,
    batch: DataFrame,
    batch_id: int,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    salted: bool = False,
    n_salts: int = 16,
    stats: bool = True,
    writer: str = "default",
    auto_evolve: bool = True,
) -> dict:
    """Apply one micro-batch of change events to ``table``.

    ``batch`` columns: key cols + value cols + (op, lsn, ts). Returns the
    merge stats dict (plus dedup count when ``stats``). Fencing lives in
    the table, namespaced by ``writer``; a replayed batch_id is a no-op
    end to end.

    ``auto_evolve``: when the batch carries ``schema_ver`` and the table
    lacks a registry-known column, drive the table's DDL forward BEFORE
    merging (otherwise a v1-created table silently discards v2 batches'
    new-column values — the merge projects the manifest's user_cols).
    Steady-state cost is zero: the registry probe runs only while the
    table is actually missing a known column.
    """
    key_cols = key_cols or KEY_COLS
    value_cols = value_cols or VALUE_COLS
    if auto_evolve and "schema_ver" in batch.columns:
        from ..registry import VERSION_ADDED_USER_FIELDS, ensure_table_evolved

        have = {f.name for f in table.stored_schema().fields}
        if any(
            f.name not in have
            for fields in VERSION_ADDED_USER_FIELDS.values()
            for f in fields
        ):
            ensure_table_evolved(table, batch)
    batch = align_to_schema(batch, table.stored_schema())
    payload = [c for c in value_cols if c != "ts"] + ["op", "lsn", "ts"]

    if salted:
        winners = lww_dedup_salted(batch, key_cols, payload, n_salts=n_salts)
    else:
        # carry_stats folds batch-size/lsn-range counters into the same
        # aggregation pass — no second scan of the batch for lineage
        winners = lww_dedup_agg(batch, key_cols, payload, carry_stats=stats)

    st = table.merge(winners, batch_id=batch_id, stats=stats, writer=writer)
    if stats and not st.get("skipped_fenced"):
        n_winners = (
            st["rows_inserted"]
            + st["rows_updated"]
            + st["rows_deleted"]
            + st["rows_stale_skipped"]
            + st.get("rows_delete_noop", 0)
        )
        if "n_source_rows" in st:
            st["rows_deduped"] = st["n_source_rows"] - n_winners
        else:
            st["rows_deduped"] = None
    return st


def replay_wal(
    spark,
    table,
    wal_dir: str,
    segments: list[int],
    salted: bool = False,
    start_batch_id: int | None = None,
    writer: str = "wal",
) -> list[dict]:
    """Batch replay of a WAL segment range through the merge kernel —
    the backfill path (reference R2, load_missing_data.py:16-54: walk a
    date range and re-run the full load per date). Segment id doubles
    as batch id, so replaying an already-applied prefix is fenced out.
    The fence is namespaced under ``writer="wal"`` so a later streaming
    tailer (epoch ids from 0) is never fenced out by replayed segment ids.
    """
    from ..genlog import read_wal_segment

    stats = []
    for seg in segments:
        batch = read_wal_segment(spark, wal_dir, seg)
        st = apply_batch(table, batch, batch_id=seg, salted=salted, writer=writer)
        st["batch_id"] = seg
        stats.append(st)
    return stats
