"""LWW dedup: the three implementations agree and match brute force."""

from __future__ import annotations

from open_bus_gtfs_etl_spark.genlog import generate_events
from open_bus_gtfs_etl_spark.operators.dedup import (
    lww_dedup_agg,
    lww_dedup_argmax_join,
    lww_dedup_salted,
    lww_dedup_window,
)

KEYS = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool", "op", "lsn", "ts"]


def _norm(rows):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.op, r.lsn, r.ts) for r in rows
    )


def test_implementations_agree(spark):
    df = generate_events(spark, 5000, n_conv=50, skew_s=1.4, seed=3, dup_rate=0.05)
    a = _norm(lww_dedup_agg(df, KEYS, PAYLOAD).collect())
    w = _norm(lww_dedup_window(df, KEYS).select(*KEYS, *PAYLOAD).collect())
    s = _norm(lww_dedup_salted(df, KEYS, PAYLOAD, n_salts=8).collect())
    x = _norm(lww_dedup_argmax_join(df, KEYS, PAYLOAD).collect())
    assert a == w == s == x
    # exactly one row per key
    keys = [t[:2] for t in a]
    assert len(keys) == len(set(keys))


def test_payload_without_ordering_cols(spark):
    """Regression: the caller's payload need not include lsn/ts — the
    argmax join used to project them away before its tie-break window
    ordered by ts (AnalysisException); all four plans must resolve and
    agree when the payload is text-only."""
    df = generate_events(spark, 3000, n_conv=30, seed=7, dup_rate=0.05)
    slim = ["role", "text", "tool"]

    def norm(rows):
        return sorted((r.conv_id, r.turn_idx, r.role, r.text, r.tool) for r in rows)

    a = norm(lww_dedup_agg(df, KEYS, slim).collect())
    w = norm(lww_dedup_window(df, KEYS).select(*KEYS, *slim).collect())
    s = norm(lww_dedup_salted(df, KEYS, slim, n_salts=4).collect())
    x = norm(lww_dedup_argmax_join(df, KEYS, slim).collect())
    assert a == w == s == x


def test_winner_is_max_lsn(spark):
    df = generate_events(spark, 2000, n_conv=20, seed=9, dup_rate=0)
    pdf = df.toPandas()
    expected = {}
    for r in pdf.sort_values(["lsn", "ts"]).itertuples():
        expected[(r.conv_id, r.turn_idx)] = r.lsn
    got = {
        (r.conv_id, r.turn_idx): r.lsn
        for r in lww_dedup_agg(df, KEYS, PAYLOAD).collect()
    }
    assert got == expected


def test_delete_kept_in_winner(spark):
    """Dedup happens BEFORE branch split: the op column survives on the
    winner so a delete beats an older update and loses to a newer one."""
    rows = [
        (1, "insert", "c-1", 0, "user", "v1"),
        (2, "delete", "c-1", 0, None, None),
        (3, "insert", "c-2", 0, "user", "v1"),
        (4, "update", "c-2", 0, "user", "v2"),
    ]
    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame(
            rows, "lsn long, op string, conv_id string, turn_idx int, role string, text string"
        )
        .withColumn("ts", F.timestamp_seconds(F.col("lsn")))
        .withColumn("tool", F.lit(None).cast("string"))
    )
    got = {
        (r.conv_id, r.turn_idx): r.op
        for r in lww_dedup_agg(df, KEYS, PAYLOAD).collect()
    }
    assert got == {("c-1", 0): "delete", ("c-2", 0): "update"}


def test_argmax_lsn_cluster_matches_window_form(spark):
    """The bucket-clustered argmax_lsn tie-break (round-6 fused plan)
    returns the same winner set as the per-lsn rank form and as the
    reference window dedup, and its output bucket column matches the
    bucket expression."""
    from pyspark.sql import functions as F

    from open_bus_gtfs_etl_spark.operators.dedup import lww_dedup_argmax_lsn
    from open_bus_gtfs_etl_spark.sources.lake import BUCKET_COL, bucket_expr

    df = generate_events(spark, 5000, n_conv=50, skew_s=1.4, seed=3, dup_rate=0.05)
    plain = lww_dedup_argmax_lsn(df, KEYS, PAYLOAD)
    clustered = lww_dedup_argmax_lsn(
        df, KEYS, PAYLOAD,
        cluster_expr=bucket_expr(KEYS[0], 16), cluster_col=BUCKET_COL,
        cluster_partitions=16,
    )
    w = _norm(lww_dedup_window(df, KEYS).select(*KEYS, *PAYLOAD).collect())
    assert _norm(plain.collect()) == w
    rows = clustered.collect()
    assert _norm(rows) == w
    # the carried bucket column is the bucket expression of the key
    recomputed = clustered.withColumn(
        "_expect", bucket_expr(KEYS[0], 16)
    ).where(F.col(BUCKET_COL) != F.col("_expect"))
    assert recomputed.count() == 0


def test_argmax_lsn_cluster_plan_single_payload_exchange(spark):
    """Plan pin for the fused tie-break: the window rides the bucket
    repartition (no exchange of its own), so between the broadcast
    join-back and the output there is exactly ONE hash-partitioning
    exchange, and no WindowGroupLimit (the lag form must not trigger
    the rank-limit rewrite, whose partial phase re-sorts the payload
    map-side)."""
    from open_bus_gtfs_etl_spark.operators.dedup import lww_dedup_argmax_lsn
    from open_bus_gtfs_etl_spark.sources.lake import BUCKET_COL, bucket_expr

    df = generate_events(spark, 2000, n_conv=50, seed=5, dup_rate=0.05)
    out = lww_dedup_argmax_lsn(
        df, KEYS, PAYLOAD,
        cluster_expr=bucket_expr(KEYS[0], 8), cluster_col=BUCKET_COL,
        cluster_partitions=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange carries the payload (the bucket repartition
    # the write reuses); the second hashpartitioning in the plan is the
    # winner-stats aggregation's keys+longs shuffle below the broadcast
    assert plan.count("Exchange hashpartitioning(_bucket") == 1, plan
    assert "hashpartitioning(lsn" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "WindowGroupLimit" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
