"""Physical-plan assertions: the optimizations SURVEY.md §4 claims are
'built-in' must actually materialize — filters reach the parquet scan,
column pruning narrows ReadSchema, small dims broadcast, dedup
aggregates partially (map-side combine), top-k avoids a full sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.plans.queries import (
    e1_cosine_topk,
    j3_left_join_null,
    p1_project_filter,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark):
    df = p1_project_filter(spark, SF)
    plan = _formatted(df)
    assert "PushedFilters" in plan
    # pushed predicates on both filter columns
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # pruned read schema: the scan must NOT read unused columns
    read_schema = plan.split("ReadSchema")[1][:500]
    assert "l_returnflag" not in read_schema and "l_tax" not in read_schema


def test_broadcast_join_chosen(spark):
    plan = _plan(j3_left_join_null(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_dedup_has_partial_aggregation(spark):
    """The LWW dedup must run as partial + final hash aggregation —
    the map-side combine IS the skew defense at 100 TB."""
    from open_bus_gtfs_etl_spark.genlog import generate_events
    from open_bus_gtfs_etl_spark.operators.dedup import lww_dedup_agg

    ev = generate_events(spark, 1000, seed=1)
    w = lww_dedup_agg(
        ev, ["conv_id", "turn_idx"], ["role", "text", "op", "lsn", "ts"]
    )
    plan = _plan(w)
    # max_by(struct) currently plans as SortAggregate; what matters for
    # skew is the PARTIAL phase before the exchange (map-side combine)
    assert "partial_max_by" in plan, "expected partial (map-side) aggregation"
    assert plan.count("Aggregate") >= 2, "expected partial+final aggregation"


def test_topk_uses_take_ordered(spark):
    plan = _plan(e1_cosine_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan, "top-k must not globally sort"


def test_whole_stage_codegen_active(spark):
    df = p1_project_filter(spark, SF)
    assert "codegen id" in _formatted(df)
