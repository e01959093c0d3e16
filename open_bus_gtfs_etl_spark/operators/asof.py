"""As-of (backward) join — window formulation for scale.

The equi-join + range-filter as-of plan (plans/queries.py j9_asof) is
oracle-exact but fans out quadratically within the tolerance window for
a pathologically hot partition key (every purchase × every click of the
same user before the groupBy(max) collapses them). This module is the
100×-scale-safe shape: union both sides, ONE shuffle on the partition
key, and a running ``last`` over the event-time ordering — work and
shuffle stay LINEAR in input rows no matter how hot a key is.

Reference parity: the "latest snapshot ≤ target date, reject if the gap
exceeds tolerance" check (idempotent_process.py:94-104) — the same
backward-with-tolerance semantics, lifted to a per-row operator.

Remaining skew note: a hot key's rows still sort within one partition
(window functions need key-clustered input). That is an O(n log n)
sort, not an O(n²) join — for a single key hot enough to overflow one
executor's spill budget, pre-partition by (key, time-bucket) and run
the operator per bucket carrying the previous bucket's last value
forward (the streaming formulation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: Column | None = None,
    out_col: str = "asof_ts",
) -> DataFrame:
    """Every ``left`` row gains ``out_col`` = the greatest ``right_ts``
    with ``right_ts <= left_ts`` (inclusive) for the same ``on`` key —
    null when no such right row exists, or when the nearest one is
    older than ``left_ts - tolerance`` (pass e.g.
    ``F.expr("INTERVAL 1 DAY")``).

    Plan: tagged union (right rows sort BEFORE left rows at equal
    timestamps, making the match inclusive) → one window over
    (key, ts, tag) → ``last(right ts, ignorenulls)`` running value →
    keep the left rows. One hash shuffle on ``on``; no join node at
    all (asserted in tests/test_asof.py).
    """
    l = left.withColumn("_ats", F.col(left_ts)).withColumn("_tag", F.lit(1))
    r = right.select(*on, F.col(right_ts).alias("_ats")).withColumn(
        "_tag", F.lit(0)
    )
    for f in l.schema.fields:
        if f.name not in r.columns:
            r = r.withColumn(f.name, F.lit(None).cast(f.dataType))
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ats"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.last(
        F.when(F.col("_tag") == 0, F.col("_ats")), ignorenulls=True
    ).over(w)
    out = u.withColumn("_asof", running).where(F.col("_tag") == 1)
    gate = F.col("_asof")
    if tolerance is not None:
        gate = F.when(F.col("_asof") >= F.col("_ats") - tolerance, F.col("_asof"))
    return out.withColumn(out_col, gate).drop("_ats", "_tag", "_asof")
