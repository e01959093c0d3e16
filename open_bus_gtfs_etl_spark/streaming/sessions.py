"""Event-time session windows over the change-event stream — the
custom stateful streaming operator beyond LWW dedup (SURVEY §2.10).

Two formulations with identical core semantics, tested for agreement
(tests/test_sessions.py):

- :func:`sessionize` — the built-in ``F.session_window`` gap window.
  The preferred shape at scale: JVM-side state store, watermark-driven
  eviction, whole pipeline stays in Tungsten, and Spark merges
  out-of-order/overlapping sessions natively. Use this unless the
  session state itself needs custom structure.

- :func:`sessionize_stateful` — ``applyInPandasWithState`` with an
  event-time timeout. The extension point for session-level state a
  windowed aggregate cannot express (running custom payloads, e.g.
  distinct-role sets, first/last text snapshots, decayed counters).
  Arrow-batched per key group — never per-row Python. State is five
  long counters per open session, so a 10^8-conversation keyspace
  costs ~4 GB of state store spread across executors.

Semantics shared by both: events for a key belong to one session while
consecutive event times are within ``gap`` of each other;
``session_end`` is last event time + gap (the built-in's convention);
sessions are emitted in append mode once the watermark passes their
end. Events later than the watermark are dropped by the watermark
operator in both plans.

Reference parity: the reference pipeline groups strictly by calendar
day per its daily file drop (open-bus-gtfs-etl gtfs_extractor/
idempotent_process.py:94-104); gap sessions generalize that grouping
to event time, which is what a continuous tailer needs.

Scale note (100 TB): both plans shuffle once on ``conv_id`` into the
stateful operator; hot conversations are bounded by per-key state size
(constant here), not row counts, because counts fold incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("first_lsn", LongType()),
        StructField("last_lsn", LongType()),
    ]
)

# open-session state: event-time bounds in epoch-microseconds plus the
# three folded aggregates — fixed size per key regardless of how many
# events the session absorbed
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("first_lsn", LongType()),
        StructField("last_lsn", LongType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Built-in gap-session aggregation (``F.session_window``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "first_lsn",
            "last_lsn",
        )
    )


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 600,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Gap sessions via ``applyInPandasWithState`` + event-time timeout.

    Per micro-batch and key: sort the key's rows by event time, split
    where the gap exceeds ``gap_seconds``, fold each segment to the
    five-counter state, emit every closed segment, keep the trailing
    segment open in the state store, and arm an event-time timeout at
    ``last event + gap`` so the watermark closes idle sessions. A
    segment that reaches back into the open state (first event within
    gap of the stored last event) merges into it — including extending
    ``session_start`` backward for late-but-in-watermark events, which
    matches the built-in's session-merge behavior.
    """
    gap_us = gap_seconds * 1_000_000

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        closed: list[tuple[int, int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts", kind="mergesort")
            ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()
            lsn = rows["lsn"].astype("int64").to_numpy()

            cur = tuple(state.get) if state.exists else None
            for i in range(len(rows)):
                t, l = int(ts_us[i]), int(lsn[i])
                if cur is not None and t - cur[1] <= gap_us:
                    cur = (
                        min(cur[0], t),
                        max(cur[1], t),
                        cur[2] + 1,
                        min(cur[3], l),
                        max(cur[4], l),
                    )
                else:
                    if cur is not None:
                        closed.append(cur)
                    cur = (t, t, 1, l, l)
            if cur is not None:
                state.update(cur)
                # event-time timeout fires once the watermark passes
                # last event + gap — exactly when the session's window
                # would close under the built-in formulation
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] + gap_us for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                    "first_lsn": [c[3] for c in closed],
                    "last_lsn": [c[4] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events_pdf: pd.DataFrame, gap_seconds: int = 600) -> pd.DataFrame:
    """Pandas oracle: gap sessions over a complete (batch) event set —
    what either streaming formulation must converge to once every
    session has closed."""
    gap_us = gap_seconds * 1_000_000
    out = []
    for conv_id, g in events_pdf.groupby("conv_id"):
        g = g.sort_values("ts", kind="mergesort")
        ts_us = (g["ts"].astype("int64") // 1000).to_numpy()
        lsn = g["lsn"].astype("int64").to_numpy()
        cur = None
        for t, l in zip(ts_us, lsn):
            t, l = int(t), int(l)
            if cur is not None and t - cur[1] <= gap_us:
                cur = (
                    min(cur[0], t), max(cur[1], t), cur[2] + 1,
                    min(cur[3], l), max(cur[4], l),
                )
            else:
                if cur is not None:
                    out.append((conv_id, *cur))
                cur = (t, t, 1, l, l)
        if cur is not None:
            out.append((conv_id, *cur))
    df = pd.DataFrame(
        out,
        columns=["conv_id", "start_us", "last_us", "n_events", "first_lsn", "last_lsn"],
    )
    return pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "session_start": pd.to_datetime(df["start_us"], unit="us"),
            "session_end": pd.to_datetime(df["last_us"] + gap_us, unit="us"),
            "n_events": df["n_events"].astype("int64"),
            "first_lsn": df["first_lsn"].astype("int64"),
            "last_lsn": df["last_lsn"].astype("int64"),
        }
    )
