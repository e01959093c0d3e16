"""Explicit schemas for the engine (FIXTURES.md §1-3).

The reference infers CSV schemas and fixes DB schemas via ORM models
(reference: partridge_helper.py:19-25 inferred side;
load_stops_to_db.py:55-72 fixed side). This engine is explicit
StructType everywhere; schema evolution goes through the registry
(``registry.py``), never through inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- the materialized lake table (BASELINE.json input_hint) ----------------
TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPTS_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

# Engine-internal columns persisted alongside user columns. ``_lsn``/``_ts``
# gate out-of-order cross-batch updates (SURVEY.md §7 "cross-batch
# ordering"); ``_deleted`` keeps tombstones so a late update with an older
# lsn cannot resurrect a deleted key.
INTERNAL_FIELDS = [
    T.StructField("_lsn", T.LongType(), False),
    T.StructField("_ts", T.TimestampType(), False),
    T.StructField("_deleted", T.BooleanType(), False),
]
STORED_TRANSCRIPTS_SCHEMA = T.StructType(TRANSCRIPT_FIELDS + INTERNAL_FIELDS)

KEY_COLS = ["conv_id", "turn_idx"]
VALUE_COLS = ["role", "text", "tool", "ts"]

# --- the CDC / WAL envelope (FIXTURES.md §2) -------------------------------
# schema v1 (no `tool` column; role domain {user, assistant}) — the
# late-added-column evolution case from the north rule.
CHANGE_EVENTS_V1_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("schema_ver", T.IntegerType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

CHANGE_EVENTS_SCHEMA = T.StructType(
    CHANGE_EVENTS_V1_SCHEMA.fields + [T.StructField("tool", T.StringType(), True)]
)

OPS = ("insert", "update", "delete")

# --- lineage / metrics table (FIXTURES.md §3) ------------------------------
# Mirrors the reference's gtfs_data state machine (idempotent_process.py:57-91)
# and its per-loader stats counters (load_stops_to_db.py:51-63).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("rows_inserted", T.LongType(), False),
        T.StructField("rows_updated", T.LongType(), False),
        T.StructField("rows_deleted", T.LongType(), False),
        T.StructField("rows_deduped", T.LongType(), False),
        T.StructField("rows_stale_skipped", T.LongType(), False),
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
    ]
)
