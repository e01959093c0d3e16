"""Time-window metric plans over the change-event stream: tumbling and
sliding (hop) event-time windows with watermark-driven eviction —
SURVEY §2.10's window matrix alongside the session windows of
``sessions.py``.

Both are thin declarative plans around the built-in ``F.window``: the
streaming and batch formulations share the SAME expression, so the
agreement test (tests/test_windows.py) pins that a windowed metric
computed live equals the batch recomputation once the watermark has
closed every window — the reprocessing-equivalence property a lambda-
free architecture needs.

Reference parity: the reference's only window is the daily file drop
(its tumbling 1-day window, open-bus-gtfs-etl common.py:51-52);
hop windows generalize it for overlapping-freshness metrics.

Scale note (100 TB): one shuffle on the window struct (+key if given);
partial aggregation is map-side combined; hop windows fan each event
into size/slide rows BEFORE the partial agg, so the shuffle still
carries only per-window partial rows, not the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_counts(
    events: DataFrame,
    *,
    size: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-window event counts + lsn bounds. ``slide=None`` → tumbling;
    ``slide`` set → hop (each event in size/slide windows). Works on a
    streaming OR batch frame — the watermark is a no-op in batch, which
    is exactly what makes the live/batch agreement test meaningful."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, size) if slide is None else F.window(ts_col, size, slide)
    )
    return (
        src.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "first_lsn",
            "last_lsn",
        )
    )
