"""Watermarked stream-stream event-time join — the enrichment shape a
CDC feed needs when a second live feed carries late-binding context
(here: tool results arriving within a bounded delay of the turn event
that triggered them).

The reference has no streaming analogue (its joins all probe a static
dict build side, e.g. open-bus-gtfs-etl load_stops_to_db.py:31-46);
this is the genuinely streaming join Spark adds: BOTH sides are
unbounded, so the engine must buffer each side in state and evict by
watermark. Correctness contract, same as windows.py/sessions.py: the
streaming and batch formulations share the SAME join expression, and
the agreement test (tests/test_stream_joins.py) pins live == batch
recomputation once the watermark has passed every event — including
the left-outer null rows, which streaming may only emit after the
watermark proves no match can still arrive.

Scale notes (100 TB/day feeds):
- State is bounded BY CONSTRUCTION, not by hope: the join carries an
  equality key (conv_id) plus a closed event-time range
  (result.ts in [turn.ts, turn.ts + tolerance]), which is exactly the
  pair of conditions Structured Streaming needs to (a) hash-partition
  state by key and (b) compute a state-eviction bound on both sides
  from the watermark. Omit the range and the turn side buffers
  forever — the classic unbounded-state foot-gun this module's
  signature makes unrepresentable (tolerance is required).
- One shuffle per side on conv_id (co-partitioned by the join), same
  as the batch plan; the watermark delay only sizes state, it never
  changes emitted values (the agreement test is the proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_tool_results(
    turns: DataFrame,
    results: DataFrame,
    *,
    watermark: str = "30 minutes",
    tolerance: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each turn event to the tool-result events of the same
    conversation whose event time lands in ``[turn.ts, turn.ts +
    tolerance]``. ``how`` is ``inner`` or ``left_outer`` (turn events
    with no result in the window survive with null result columns —
    emitted in streaming only once the watermark closes the window).

    Works on streaming OR batch frames: watermarks are applied only to
    streaming inputs, and the join expression is identical either way,
    so a batch recomputation over the same files is the oracle.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    t = (turns.withWatermark("ts", watermark) if turns.isStreaming else turns).alias("t")
    r = (
        results.withWatermark("ts", watermark) if results.isStreaming else results
    ).alias("r")
    cond = (
        (F.col("t.conv_id") == F.col("r.conv_id"))
        & (F.col("r.ts") >= F.col("t.ts"))
        & (F.col("r.ts") <= F.col("t.ts") + F.expr(f"INTERVAL {tolerance}"))
    )
    return t.join(r, cond, how).select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.lsn").alias("turn_lsn"),
        F.col("t.ts").alias("turn_ts"),
        F.col("r.result_id").alias("result_id"),
        F.col("r.ts").alias("result_ts"),
    )
