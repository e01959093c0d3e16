"""Incremental view maintenance (operators/ivm.py): fold-equals-
recompute, retraction-to-zero group removal, and delta-only cost shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.operators import ivm


def _state_of(spark, rows):
    # rows: (key, n_rows, sum_value)
    df = spark.createDataFrame(rows, "k string, n_rows long, sum_value string")
    return df.select(
        "k",
        "n_rows",
        F.col("sum_value").cast("decimal(28,4)").alias("sum_value"),
    )


def test_fold_equals_recompute(spark):
    """The defining IVM equivalence: maintain(state(base), delta(chg))
    == full aggregate over base + signed changes."""
    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 7.0)], "k string, v double"
    )
    # inserts for a and d; a delete retracting one of c's rows
    chg = spark.createDataFrame(
        [("a", 10.0, False), ("d", 4.0, False), ("c", 7.0, True)],
        "k string, v double, is_del boolean",
    )
    val = F.col("v").cast("decimal(18,4)")
    state = base.groupBy("k").agg(
        F.count("*").cast("bigint").alias(ivm.N_COL),
        F.sum(val).cast("decimal(28,4)").alias(ivm.SUM_COL),
    )
    delta = ivm.delta_state(chg, ["k"], val, F.col("is_del"))
    got = {
        r["k"]: (r[ivm.N_COL], float(r[ivm.SUM_COL]))
        for r in ivm.maintain(state, delta, ["k"]).collect()
    }
    # recompute from scratch: a={1,2,10}, b={5}, c={} (retracted), d={4}
    assert got == {"a": (3, 13.0), "b": (1, 5.0), "d": (1, 4.0)}
    assert "c" not in got  # count reached 0 -> leaves the view


def test_repeated_folds_compose(spark):
    """Maintaining twice equals maintaining the concatenated delta —
    state is a commutative monoid, so micro-batch boundaries are
    invisible (the CDC replay-batching invariant)."""
    state = _state_of(spark, [("a", 2, "3.0"), ("b", 1, "1.0")])
    d1 = spark.createDataFrame(
        [("a", 1.0, False), ("b", 1.0, True)], "k string, v double, is_del boolean"
    )
    d2 = spark.createDataFrame(
        [("a", 2.0, False), ("b", 1.0, False)], "k string, v double, is_del boolean"
    )
    val = F.col("v").cast("decimal(18,4)")

    def fold(st, chg):
        return ivm.maintain(st, ivm.delta_state(chg, ["k"], val, F.col("is_del")), ["k"])

    two_step = fold(fold(state, d1), d2)
    one_step = fold(state, d1.unionByName(d2))
    norm = lambda df: sorted(
        (r["k"], r[ivm.N_COL], float(r[ivm.SUM_COL])) for r in df.collect()
    )
    assert norm(two_step) == norm(one_step)
    # b: 1 - 1 + 1 = 1 row, sum 1.0 - 1.0 + 1.0 = 1.0
    assert ("b", 1, 1.0) in norm(two_step)


def test_delta_only_aggregation(spark):
    """Cost shape: delta_state's plan aggregates the CHANGE frame only
    — partial (map-side combined) aggregation over the delta, and the
    fold's union inputs are both already-aggregated frames."""
    chg = spark.createDataFrame(
        [("a", 1.0, False)] * 10, "k string, v double, is_del boolean"
    )
    d = ivm.delta_state(chg, ["k"], F.col("v").cast("decimal(18,4)"), F.col("is_del"))
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan  # fixed-width buffer, not ObjectHashAggregate
    assert plan.count("Exchange") == 1  # one shuffle: the delta's own
