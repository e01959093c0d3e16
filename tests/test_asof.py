"""Window-formulation as-of join: equivalence with the join plan,
no-join plan shape, tolerance gating, and hot-key skew safety.

The join plan (j9_asof) fans out purchases × clicks per user inside
the tolerance window; the window plan (j9b / operators/asof.py) is one
shuffle + running last — linear for arbitrarily hot users.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.operators.asof import asof_backward
from open_bus_gtfs_etl_spark.plans.queries import j9_asof, j9b_asof_window

SF = "/root/testdata/sf0.001"


def _collect_map(df):
    return {r.event_id: r.last_click_ts for r in df.collect()}


def test_window_plan_matches_join_plan_on_testdata(spark):
    assert _collect_map(j9b_asof_window(spark, SF)) == _collect_map(
        j9_asof(spark, SF)
    )


def test_window_plan_has_no_join_node(spark):
    plan = (
        j9b_asof_window(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan


def _synth(spark, n_users, clicks_per_user, purchases_per_user, seed):
    """Synthetic clicks+purchases, deterministic, with exact python
    oracle computed alongside."""
    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    clicks, purchases = [], []
    eid = 0
    for u in range(n_users):
        cts = sorted(
            t0 + dt.timedelta(seconds=rng.randrange(0, 200_000))
            for _ in range(clicks_per_user)
        )
        for ts in cts:
            clicks.append((u, ts))
        for _ in range(purchases_per_user):
            eid += 1
            purchases.append((eid, u, t0 + dt.timedelta(seconds=rng.randrange(0, 220_000))))
    tol = dt.timedelta(days=1)
    want = {}
    by_user = {}
    for u, ts in clicks:
        by_user.setdefault(u, []).append(ts)
    for eid_, u, pts in purchases:
        cands = [c for c in by_user.get(u, []) if c <= pts and c >= pts - tol]
        want[eid_] = max(cands) if cands else None
    p = spark.createDataFrame(purchases, "event_id long, user_id long, ts timestamp")
    c = spark.createDataFrame(clicks, "user_id long, ts timestamp")
    return p, c, want


def test_asof_backward_exact_vs_python_oracle(spark):
    p, c, want = _synth(spark, n_users=25, clicks_per_user=12,
                        purchases_per_user=6, seed=7)
    got = asof_backward(
        p, c, on=["user_id"], tolerance=F.expr("INTERVAL 1 DAY"),
        out_col="last_click_ts",
    )
    assert {r.event_id: r.last_click_ts for r in got.collect()} == want


def test_asof_backward_hot_user_skew(spark):
    """One pathologically hot user (2000 clicks × 200 purchases would
    be 400k joined pairs under the join plan) — the window plan stays
    linear and exact."""
    p, c, want = _synth(spark, n_users=1, clicks_per_user=2000,
                        purchases_per_user=200, seed=11)
    got = asof_backward(
        p, c, on=["user_id"], tolerance=F.expr("INTERVAL 1 DAY"),
        out_col="last_click_ts",
    )
    assert {r.event_id: r.last_click_ts for r in got.collect()} == want


def test_asof_tolerance_and_tie_semantics(spark):
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    c = spark.createDataFrame(
        [(1, t0), (2, t0 - dt.timedelta(days=2))],
        "user_id long, ts timestamp",
    )
    p = spark.createDataFrame(
        [
            (10, 1, t0),                          # tie: click at SAME instant counts
            (11, 2, t0),                          # nearest click 2 days old → gated to null
            (12, 3, t0),                          # no clicks at all → null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r.event_id: r.last_click_ts
        for r in asof_backward(
            p, c, on=["user_id"], tolerance=F.expr("INTERVAL 1 DAY"),
            out_col="last_click_ts",
        ).collect()
    }
    assert got == {10: t0, 11: None, 12: None}
