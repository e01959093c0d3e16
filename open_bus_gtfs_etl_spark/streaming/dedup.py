"""Watermarked streaming deduplication — the redelivery shed a CDC
tailer puts IN FRONT of the merge kernel.

The merge kernel is already idempotent per event (LWW by lsn,
operators/dedup.py), so duplicates are a throughput problem, not a
correctness one: an at-least-once transport that redelivers 5% of the
WAL makes every downstream shuffle 5% wider. The reference sheds
re-deliveries the same way at file granularity — the exists-check
before S3 upload (open-bus-gtfs-etl upload_to_s3.py:12-20) and the
"already processed this date" state check (idempotent_process.py:
94-104); this operator is the per-EVENT analogue.

Built on ``dropDuplicatesWithinWatermark``: exact-once per key within
the watermark horizon, with state automatically evicted once the
watermark passes an event's timestamp — the bounded-state contract
that plain streaming ``dropDuplicates`` (which keeps every key seen
FOREVER) cannot give. A duplicate arriving LATER than the watermark
horizon slips through — and is then absorbed by the merge kernel's
LWW gate, which is exactly the two-tier design: cheap
probably-deduped stream, guaranteed-idempotent sink.

Scale notes (100 TB/day): one shuffle on the dedup key (lsn — the
envelope's unique event id); state is |unique events per watermark
window| keys of a few longs each, not payloads, because the state
store keys on the dedup columns only. The watermark delay is the
state-size knob and is REQUIRED — unbounded streaming dedup is
unrepresentable here, same stance as joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    *,
    watermark: str = "30 minutes",
    key_cols: tuple[str, ...] = ("lsn",),
    ts_col: str = "ts",
) -> DataFrame:
    """Drop re-delivered change events (same ``key_cols``) arriving
    within the ``watermark`` horizon of the first delivery. Streaming
    frames get ``dropDuplicatesWithinWatermark`` (bounded state);
    batch frames get plain ``dropDuplicates`` (same result on a
    finite input — the agreement test's oracle)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))
