"""bucketed_interval_join / bucketed_overlap_join: equivalence to the
naive nested-loop plan, left-lookup miss⇒null shape, pair-dedup
exactness of the overlap ownership rule, and the plan guarantee that
motivates the operators (equi-join on the bucket key, not
BroadcastNestedLoopJoin).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.operators.intervals import (
    bucketed_interval_join,
    bucketed_overlap_join,
)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _mk(spark):
    t0 = dt.datetime(2024, 1, 1)
    # points every 17 minutes across 3 days, sub-second offsets included
    probe = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=17 * i, microseconds=250_000 * (i % 4)))
         for i in range(250)],
        "pid long, pts timestamp",
    )
    # overlapping ranges of mixed widths (some spanning many buckets,
    # one empty, one zero-width)
    ranges = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=2)),
            (2, t0 + dt.timedelta(hours=1, minutes=30), t0 + dt.timedelta(hours=9)),
            (3, t0 + dt.timedelta(days=1), t0 + dt.timedelta(days=2, hours=3)),
            (4, t0 - dt.timedelta(days=2), t0 - dt.timedelta(days=1)),  # no hits
            (5, t0 + dt.timedelta(hours=5), t0 + dt.timedelta(hours=5)),  # empty
        ],
        "rid long, lo timestamp, hi timestamp",
    )
    return probe, ranges


def _naive(probe, ranges):
    return probe.crossJoin(ranges).where(
        (F.col("pts") >= F.col("lo")) & (F.col("pts") < F.col("hi"))
    )


@pytest.mark.parametrize("bucket_seconds", [900, 3600, 6 * 3600, 7 * 24 * 3600])
def test_inner_matches_nested_loop(spark, bucket_seconds):
    """Coverage is exact at ANY bucket width — width only shifts the
    replication/filter cost tradeoff, never the answer."""
    probe, ranges = _mk(spark)
    got = (
        bucketed_interval_join(probe, ranges, "pts", "lo", "hi", bucket_seconds)
        .select("pid", "rid")
        .toPandas()
        .sort_values(["pid", "rid"])
        .reset_index(drop=True)
    )
    want = (
        _naive(probe, ranges)
        .select("pid", "rid")
        .toPandas()
        .sort_values(["pid", "rid"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) > 0


def test_left_keeps_misses_as_null(spark):
    probe, ranges = _mk(spark)
    out = bucketed_interval_join(
        probe, ranges, "pts", "lo", "hi", 3600, how="left"
    )
    pdf = out.toPandas()
    n_hits = _naive(probe, ranges).count()
    n_missed_points = (
        probe.count()
        - _naive(probe, ranges).select("pid").distinct().count()
    )
    assert len(pdf) == n_hits + n_missed_points
    assert pdf["rid"].isna().sum() == n_missed_points


def test_plan_is_equi_join_not_nested_loop(spark):
    probe, ranges = _mk(spark)
    plan = _formatted(
        bucketed_interval_join(probe, ranges, "pts", "lo", "hi", 3600)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # an equi hash/sort-merge join on the bucket key
    # the naive formulation IS a nested loop (BroadcastNestedLoopJoin,
    # or CartesianProduct when neither side is broadcastable) — the
    # operator exists to remove exactly this node
    naive_plan = _formatted(_naive(probe, ranges))
    assert ("BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan)


def test_disjoint_column_names_required(spark):
    probe, ranges = _mk(spark)
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_interval_join(
            probe, ranges.withColumnRenamed("rid", "pid"),
            "pts", "lo", "hi", 3600,
        )


# ---------------------------------------------------------------------------
# interval × interval overlap
# ---------------------------------------------------------------------------


def _mk_intervals(spark):
    t0 = dt.datetime(2024, 1, 1)
    # left: dense, mixed widths (minutes to days), sub-second bounds
    left = spark.createDataFrame(
        [
            (
                i,
                t0 + dt.timedelta(minutes=37 * i, microseconds=100_000 * (i % 5)),
                t0 + dt.timedelta(minutes=37 * i + 11 + 90 * (i % 7)),
            )
            for i in range(120)
        ],
        "lid long, a_lo timestamp, a_hi timestamp",
    )
    right = spark.createDataFrame(
        [
            (
                j,
                t0 + dt.timedelta(minutes=53 * j),
                t0 + dt.timedelta(minutes=53 * j + 25 + 200 * (j % 3)),
            )
            for j in range(80)
        ]
        # plus a multi-day interval that overlaps MANY left rows across
        # many buckets (the dedup stress case) and a zero-width one
        + [
            (900, t0 + dt.timedelta(hours=2), t0 + dt.timedelta(days=2)),
            (901, t0 + dt.timedelta(hours=5), t0 + dt.timedelta(hours=5)),
        ],
        "rjd long, b_lo timestamp, b_hi timestamp",
    )
    return left, right


def _naive_overlap(left, right):
    return left.crossJoin(right).where(
        (F.col("a_lo") < F.col("b_hi")) & (F.col("b_lo") < F.col("a_hi"))
    )


@pytest.mark.parametrize("bucket_seconds", [600, 3600, 12 * 3600])
def test_overlap_matches_nested_loop(spark, bucket_seconds):
    """Exactly ONE output row per overlapping pair at any bucket width —
    the ownership rule dedups multi-bucket pairs without a distinct()."""
    left, right = _mk_intervals(spark)
    got = (
        bucketed_overlap_join(
            left, right, "a_lo", "a_hi", "b_lo", "b_hi", bucket_seconds
        )
        .select("lid", "rjd")
        .toPandas()
        .sort_values(["lid", "rjd"])
        .reset_index(drop=True)
    )
    want = (
        _naive_overlap(left, right)
        .select("lid", "rjd")
        .toPandas()
        .sort_values(["lid", "rjd"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) > 0
    # no duplicated pairs
    assert not got.duplicated().any()
    # the multi-day interval overlapped many left rows (dedup stressed)
    assert (want["rjd"] == 900).sum() > 30


def test_overlap_plan_is_equi_join(spark):
    left, right = _mk_intervals(spark)
    plan = _formatted(
        bucketed_overlap_join(left, right, "a_lo", "a_hi", "b_lo", "b_hi", 3600)
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan
    naive_plan = _formatted(_naive_overlap(left, right))
    assert (
        "BroadcastNestedLoopJoin" in naive_plan
        or "CartesianProduct" in naive_plan
    )


def test_overlap_disjoint_column_names_required(spark):
    left, right = _mk_intervals(spark)
    with pytest.raises(ValueError, match="disjoint"):
        bucketed_overlap_join(
            left, right.withColumnRenamed("rjd", "lid"),
            "a_lo", "a_hi", "b_lo", "b_hi", 3600,
        )
