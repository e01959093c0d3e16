"""Exact order statistics (operators/stats.py): nearest-rank semantics
and the integer-ceil rank arithmetic that a float ceil gets wrong.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.operators.stats import exact_quantiles


def test_nearest_rank_integer_ceil(spark):
    """n=20, values 1..20: ceil(0.95·20) must be rank 19 → value 19.
    The float trap: 0.95 in binary is 0.95000000000000000622…, so
    ceil(0.95 * 20.0) = ceil(19.000000000000004) = 20 — the integer
    formula (n·95 + 99) DIV 100 = 19 is immune."""
    df = spark.range(1, 21).select(
        F.lit("g").alias("grp"),
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("tb"),
    )
    row = exact_quantiles(df, "grp", "v", "tb", [25, 75, 95]).collect()[0]
    assert row["p25"] == 5.0
    assert row["p75"] == 15.0
    assert row["p95"] == 19.0  # float ceil would select 20.0


def test_single_row_group_all_quantiles_equal(spark):
    df = spark.createDataFrame([("g", 7.5, 1)], ["grp", "v", "tb"])
    row = exact_quantiles(df, "grp", "v", "tb", [25, 95]).collect()[0]
    assert row["p25"] == 7.5 and row["p95"] == 7.5


def test_partition_invariance(spark):
    """Same input under adversarial partitioning → identical quantiles
    (nearest-rank is a function of the total order, not of physical
    layout — the determinism contract approx_percentile lacks)."""
    import random

    rnd = random.Random(7)
    rows = [("a" if i % 3 else "b", float(rnd.randrange(1000)), i)
            for i in range(500)]
    df1 = spark.createDataFrame(rows, ["grp", "v", "tb"])
    df2 = spark.createDataFrame(list(reversed(rows)), ["grp", "v", "tb"]).repartition(13)
    q1 = {r["grp"]: (r["p25"], r["p75"], r["p95"])
          for r in exact_quantiles(df1, "grp", "v", "tb", [25, 75, 95]).collect()}
    q2 = {r["grp"]: (r["p25"], r["p75"], r["p95"])
          for r in exact_quantiles(df2, "grp", "v", "tb", [25, 75, 95]).collect()}
    assert q1 == q2


def test_nearest_rank_matches_numpy_definition(spark):
    """Randomized cross-check vs an independent Python nearest-rank
    implementation (sorted list, index ceil(pct·n/100)−1) across group
    sizes 1..40 — pinning the rank arithmetic, not just one n."""
    import math
    import random

    rnd = random.Random(11)
    rows, want = [], {}
    for g in range(1, 41):
        vals = [round(rnd.uniform(0, 100), 3) for _ in range(g)]
        for i, v in enumerate(vals):
            rows.append((f"g{g:02d}", v, i))
        s = sorted(vals)
        want[f"g{g:02d}"] = {
            pct: s[math.ceil(pct * g / 100) - 1] for pct in (25, 75, 95)
        }
    df = spark.createDataFrame(rows, ["grp", "v", "tb"])
    out = exact_quantiles(df, "grp", "v", "tb", [25, 75, 95])
    for r in out.collect():
        w = want[r["grp"]]
        assert (r["p25"], r["p75"], r["p95"]) == (w[25], w[75], w[95]), r["grp"]
