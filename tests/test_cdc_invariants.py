"""Cross-operator CDC invariants: the three m* shapes over the same
change feed must agree with each other, independent of the DuckDB
oracles — m1 (LWW final state), m3 (snapshot diff), m4 (SCD2 history)
are three views of one fold, so each pair implies an algebraic
identity:

1. m4's current versions ARE m1's final state (same keys, same winner
   event ids).
2. Applying m3's diff to snapshot A reproduces snapshot B: inserts and
   updates land their new_event_id, deletes remove the key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.plans.queries import (
    m1_cdc_final_state,
    m3_snapshot_diff,
    m4_scd2_history,
)

SF = "/root/testdata/sf0.001"


def _key_event_set(df, event_col):
    return {
        (r["user_id"], r["turn"], r[event_col])
        for r in df.select("user_id", "turn", event_col).collect()
    }


def test_scd2_current_equals_final_state(spark):
    """m4 WHERE is_current must equal m1 on (key, winner event_id) —
    the history's open versions are exactly the materialized state."""
    final_state = _key_event_set(m1_cdc_final_state(spark, SF), "event_id")
    current = _key_event_set(
        m4_scd2_history(spark, SF).where(F.col("is_current") == 1), "event_id"
    )
    assert current == final_state
    assert len(final_state) > 0


def test_snapshot_diff_replays_a_to_b(spark):
    """Folding m3's change feed into snapshot A must yield snapshot B
    (the defining property of a minimal diff)."""
    cutoff = "2024-01-16 00:00:00"
    ev = spark.read.parquet(f"{SF}/events.parquet")

    def snap(src):
        from pyspark.sql import Window as W

        turn = F.pmod(
            F.get_json_object("props", "$.k").cast("int"), F.lit(16)
        ).alias("turn")
        op = F.when(F.col("event_type") == "error", "delete").otherwise("upsert")
        s = src.select("user_id", turn, op.alias("op"), "ts", "event_id")
        w = W.partitionBy("user_id", "turn").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            s.withColumn("rn", F.row_number().over(w))
            .where((F.col("rn") == 1) & (F.col("op") != "delete"))
            .select("user_id", "turn", "event_id")
        )

    a = _key_event_set(snap(ev.where(F.col("ts") < cutoff)), "event_id")
    b = _key_event_set(snap(ev), "event_id")
    diff = m3_snapshot_diff(spark, SF).collect()
    assert len(diff) > 0

    replayed = dict(((u, t), e) for (u, t, e) in a)
    for r in diff:
        key = (r["user_id"], r["turn"])
        if r["change_op"] == "delete":
            assert replayed.pop(key) == r["old_event_id"]
        elif r["change_op"] == "insert":
            assert key not in replayed
            replayed[key] = r["new_event_id"]
        else:  # update
            assert replayed[key] == r["old_event_id"]
            replayed[key] = r["new_event_id"]
    assert {(u, t, e) for (u, t), e in replayed.items()} == b
