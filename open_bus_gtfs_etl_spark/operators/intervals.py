"""Bucketed range/interval join: point-in-interval matching as an
equi-join instead of a nested-loop.

Catalyst plans a join whose ONLY predicate is non-equi
(``p.ts >= r.lo AND p.ts < r.hi``) as BroadcastNestedLoopJoin — O(|probe|
× |ranges|) comparisons and a broadcast of one whole side, which stops
working the moment the range side outgrows memory. The standard scale
rewrite (same trick DuckDB/Trino apply internally for range joins, and
the time-bucket analogue of IP-prefix lookup joins): overlay a fixed
bucket grid of width ``bucket_seconds`` on the time axis, explode each
range to the buckets it overlaps, map each probe point to its single
bucket, equi-join on the bucket id, and re-check the exact interval
predicate as a residual filter. The join becomes a plain shuffled (or
AQE-broadcast) hash join on a long key; cost is O(|probe| + |ranges| ×
spans) where spans = range_width / bucket_seconds + 1.

Reference analogue: load_missing_data.py:16-54 walks an explicit date
range and matches work items per day — a driver-side loop over a
1-day-bucketed interval containment; here the same containment is one
declarative join.

Choosing ``bucket_seconds``: ≈ the typical range width. Wider buckets
mean fewer replicas per range but more false candidates for the
residual filter to discard; narrower means the reverse. Replication is
bounded and visible: a range never explodes to more than
``width/bucket_seconds + 1`` rows, so unlike LSH-style candidate
generation there is no degenerate-bucket recall issue — coverage is
exact by construction (every qualifying pair shares the probe point's
bucket, because the range covers every bucket it overlaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "_interval_bkt"


def _epoch(col: str):
    """Epoch seconds (floor). TIMESTAMP_NTZ (the parquet default for
    naive timestamps) has no direct long cast — reinterpret through
    TIMESTAMP first; the session TZ is pinned UTC so this is identity."""
    return F.col(col).cast("timestamp").cast("long")


def bucketed_interval_join(
    probe: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` rows to every ``ranges`` row whose half-open
    interval [lo_col, hi_col) contains ``point_col``.

    Timestamps are bucketed on their epoch-second floor; the residual
    filter compares the original (sub-second-exact) values, so bucket
    truncation can only over-generate candidates, never lose a match
    (the hi bucket bound is inclusive for the same reason). Column
    names must be disjoint across the two inputs — the join returns
    both sides' columns.

    ``how``: "inner" (default) or "left" — left keeps probe rows that
    fall in no interval, with null range columns (lookup-join shape).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    overlap = set(probe.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(
            f"probe/ranges column names must be disjoint, both have: {sorted(overlap)}"
        )
    r = ranges.withColumn(
        _BKT,
        F.explode(
            F.sequence(
                F.floor(_epoch(lo_col) / bucket_seconds),
                F.floor(_epoch(hi_col) / bucket_seconds),
            )
        ),
    )
    p = probe.withColumn(_BKT, F.floor(_epoch(point_col) / bucket_seconds))
    contained = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if how == "inner":
        return p.join(r, on=_BKT, how="inner").where(contained).drop(_BKT)
    # left lookup: the residual predicate must ride INSIDE the join
    # condition (a post-join filter would drop the miss⇒null rows),
    # and a probe point matching k>1 buckets is impossible (one bucket
    # per point) so no dedup is needed — but a point may match multiple
    # RANGES, which is the semantics (one output row per containing range)
    joined = p.join(
        r, on=(p[_BKT] == r[_BKT]) & contained, how="left"
    ).drop(_BKT)
    return joined


def bucketed_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval×interval OVERLAP join: every (left, right) pair whose
    half-open intervals [left_lo, left_hi) and [right_lo, right_hi)
    intersect — the general form of ``bucketed_interval_join`` (a point
    is a zero-width interval). Catalyst's native plan for a pure
    overlap predicate is the same O(n·m) nested loop; here BOTH sides
    explode to the bucket grid, the join is an equi-join on the bucket
    id, and the residual re-checks exact overlap.

    Pair dedup without a shuffle: two overlapping intervals share every
    bucket their intersection spans, so a naive bucket join emits the
    pair once per shared bucket. Instead of ``distinct()`` (a second
    full shuffle of the joined output), each pair is OWNED by exactly
    one bucket — the first bucket of the intersection,
    ``floor(greatest(left_lo, right_lo) / W)`` — and only the owning
    bucket's row survives. Coverage stays exact: the intersection is
    non-empty for a qualifying pair, so its first bucket is always a
    bucket both sides exploded to.

    Cost: O(|left|·spans_l + |right|·spans_r) exploded rows and one
    equi-join shuffle on a long key; replication per row is bounded by
    width/bucket_seconds + 1 (choose ``bucket_seconds`` ≈ the typical
    interval width).
    """
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"left/right column names must be disjoint, both have: {sorted(overlap_cols)}"
        )

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            _BKT,
            F.explode(
                F.sequence(
                    F.floor(_epoch(lo) / bucket_seconds),
                    F.floor(_epoch(hi) / bucket_seconds),
                )
            ),
        )

    l = _explode(left, left_lo, left_hi)
    r = _explode(right, right_lo, right_hi)
    overlaps = (F.col(left_lo) < F.col(right_hi)) & (
        F.col(right_lo) < F.col(left_hi)
    )
    owner = F.floor(
        F.greatest(_epoch(left_lo), _epoch(right_lo)) / bucket_seconds
    )
    return (
        l.join(r, on=_BKT, how="inner")
        .where(overlaps & (F.col(_BKT) == owner))
        .drop(_BKT)
    )
