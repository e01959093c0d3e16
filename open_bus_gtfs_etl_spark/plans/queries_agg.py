"""Aggregation and window families (a*/w*) of the driver-contract
query catalog.

Mechanically split out of plans/queries.py (round 5) to keep files
reviewable; naming conventions and the determinism rules for the
value-hash gate are documented in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .base import _t  # noqa: F401



# --------------------------------------------------------------------------
# A — aggregations (SURVEY §2.4, A1-A6)
# --------------------------------------------------------------------------

def a1_outcome_rollup(spark, sf_dir):
    """A1: per-outcome-class counters + sums, partial+final agg (the
    stats dicts, load_stops_to_db.py:51-63; rollup idempotent_process.py:34-54).
    TPC-H Q1 shape."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


A1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def a5_distinct_counts(spark, sf_dir):
    """A2+A5: existence/count checks + exact dedup counts (reference
    count<1 checks idempotent_process.py:97; set-dedup
    load_stops_to_db.py:73-81)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_distinct_text"),
        (F.count("*") - F.count_distinct(F.md5("text"))).alias("n_dupes"),
    )


A5_SQL = """
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_distinct_text,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
FROM documents
"""


def a6_all_over_group(spark, sf_dir):
    """A6: all()-over-group gate (reference: date valid iff all 4 files
    present & big enough, update_gtfs_data_db.py:35-45)."""
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.expr("bool_and(l_quantity < 45)").alias("all_small"),
        F.count("*").alias("n_items"),
    )
    return per_order.groupBy("all_small").agg(
        F.count("*").alias("n_orders"), F.sum("n_items").alias("n_lineitems")
    )


A6_SQL = """
SELECT all_small, COUNT(*) AS n_orders, CAST(SUM(n_items) AS BIGINT) AS n_lineitems
FROM (
  SELECT l_orderkey, bool_and(l_quantity < 45) AS all_small, COUNT(*) AS n_items
  FROM lineitem GROUP BY l_orderkey
) GROUP BY all_small
"""




# --------------------------------------------------------------------------
# W — windows / ordering (SURVEY §2.5, W1-W5)
# --------------------------------------------------------------------------

def w1_top1_per_key(spark, sf_dir):
    """W1: latest row per key (reference order_by desc limit 1,
    idempotent_process.py:98-99) via row_number window rank."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


W1_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def w2_topk_per_group(spark, sf_dir):
    """Top-K per group (newest-first work ordering generalized, W2)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            F.col("rn").cast("long").alias("rn"),
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total"),
        )
    )


W2_SQL = """
SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn <= 3
"""


def w3_session_starts(spark, sf_dir):
    """W3 analogue: stateful gap scan via lag — count session starts per
    user (gap > 1 hour), the weekly-thinning/retention scan shape
    (cleanup_dated_paths.py:42-49)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    is_start = F.when(gap.isNull() | (gap > 3600), 1).otherwise(0)
    return (
        ev.withColumn("is_start", is_start)
        .groupBy("user_id")
        .agg(F.sum("is_start").alias("n_sessions"), F.count("*").alias("n_events"))
    )


W3_SQL = """
SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 3600 THEN 1 ELSE 0 END AS is_start
  FROM (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
) GROUP BY user_id
"""


def w5_running_sum(spark, sf_dir):
    """Running aggregate over a stable total order (the incremental
    state-accumulation shape)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


W5_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_total
FROM orders
"""


def w6_turn_latency(spark, sf_dir):
    """Inter-event latency per user via lag() — the turn-gap /
    time-between-events analytic a transcript pipeline runs on every
    conversation (reference analogue: the newest-first date walk of
    idempotent_process.py:133-138 reasons about gaps between dated
    runs). Exact integer microseconds (no float time math); first
    event per user keeps -1 so the output schema stays non-null for
    the hash gate. Ordering is total: (ts, event_id) — lag is only
    deterministic under a total order. 100-TB shape: one shuffle on
    user_id, no join."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet; unix_micros needs TIMESTAMP —
    # the cast is a no-op shift under the session's pinned UTC tz.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(F.lag("event_id").over(w), F.lit(-1)).alias("prev_event_id"),
        F.coalesce(us - F.lag(us).over(w), F.lit(-1)).alias("gap_us"),
    )


W6_SQL = """
SELECT event_id, user_id,
       coalesce(lag(event_id) OVER w, -1) AS prev_event_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def a7_exact_median(spark, sf_dir):
    """Exact per-group median via the window formulation (row_number
    against the partition count, average of the middle one/two values)
    — NOT percentile()/quantile_cont(), whose interpolation internals
    are engine-specific; this shape is deterministic on any engine and
    is how exact order statistics are computed at scale anyway (a
    single-pass sort within the group's partition, no global sort).
    The middle-value average goes through DECIMAL per catalog rules."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    n = F.count(F.lit(1)).over(W.partitionBy("event_type"))
    ranked = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
        F.row_number().over(w).alias("rn"),
        n.alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / F.lit(2))
    hi = F.floor((F.col("n") + 2) / F.lit(2))
    return (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("median_value")
        )
    )


A7_SQL = """
WITH r AS (
  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS median_value
FROM r
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY event_type
"""


def a8_rollup(spark, sf_dir):
    """ROLLUP grouping sets over (event_type, day): per-type-per-day,
    per-type, and grand-total rows in one pass — the multi-level
    metrics rollup shape. Spark plans grouping sets as a single Expand
    + one aggregation, so it costs one shuffle regardless of the number
    of levels. The rolled-up levels' NULL markers are coalesced to a
    '(all)' sentinel at the output boundary: mixed None/str columns
    break any sorted-comparison path (including the driver's hash
    gate), and the data itself has no null event_type/day so the
    sentinel is unambiguous (with nullable dimensions you'd emit
    grouping() flags instead)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.date_format("day", "yyyy-MM-dd"), F.lit("(all)")).alias(
                "day"
            ),
            "n_events",
            "sum_value",
        )
    )


A8_SQL = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(strftime(day, '%Y-%m-%d'), '(all)') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events)
GROUP BY ROLLUP(event_type, day)
"""


def a9_pivot(spark, sf_dir):
    """PIVOT event_type counts into columns per user — the wide-format
    feature matrix a per-entity ML export produces. The pivot value
    list is EXPLICIT (never inferred): inference needs an extra job to
    collect the distinct values and makes the output schema
    data-dependent — both wrong at 100 TB. Missing combinations fill
    with 0 so the schema is non-null for the hash gate."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


A9_SQL = """
SELECT user_id,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
FROM events GROUP BY user_id
"""


def w7_rank_family(spark, sf_dir):
    """The remaining §2.5 rank functions in one window: rank,
    dense_rank, percent_rank over a tie-heavy ordering. Ties are
    MANUFACTURED exactly (floor(value) — integer, engine-identical)
    so rank vs dense_rank actually diverge and the result stays
    deterministic: with a tied ordering every tie gets the same rank,
    so each output row is fixed regardless of intra-tie order (ntile
    is excluded for exactly that reason — it splits ties
    arbitrarily). percent_rank divides small exact integers, IEEE-
    identical in both engines."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.floor("value").cast("long")
    w = W.partitionBy("event_type").orderBy(F.col("val_bucket").desc())
    return (
        ev.select("event_id", "event_type", bucket.alias("val_bucket"))
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .withColumn("drnk", F.dense_rank().over(w).cast("long"))
        .withColumn("prnk", F.round(F.percent_rank().over(w), 6))
    )


W7_SQL = """
SELECT event_id, event_type, val_bucket,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 6) AS prnk
FROM (
  SELECT event_id, event_type,
         CAST(FLOOR(value) AS BIGINT) AS val_bucket
  FROM events
)
WINDOW w AS (PARTITION BY event_type ORDER BY val_bucket DESC)
"""


def a10_cube(spark, sf_dir):
    """CUBE grouping sets over (event_type, day): all four grouping
    combinations in one pass — like a8's ROLLUP, Spark plans this as a
    single Expand + ONE aggregation shuffle regardless of the number
    of sets (2^k output groups but the input is read once). Same
    '(all)' sentinel rule as a8 (mixed None/str columns break sorted
    comparison paths)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce(F.date_format("day", "yyyy-MM-dd"), F.lit("(all)")).alias(
                "day"
            ),
            "n_events",
            "sum_value",
        )
    )


A10_SQL = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(strftime(day, '%Y-%m-%d'), '(all)') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, date_trunc('day', ts) AS day, value FROM events)
GROUP BY CUBE(event_type, day)
"""


def w8_ntile_deciles(spark, sf_dir):
    """ntile(10) quantile bucketing over a total order — the windowed
    quantile assignment a curation pipeline uses to split a corpus
    into equal-count quality tiers. The ORDER BY is made total with the
    key tie-break (ties would otherwise make ntile nondeterministic).
    Scale note, stated honestly: a global ntile window plans as a
    single-partition sort — correct but a deliberate scale smell; the
    100-TB path is two-phase (sample approximate decile boundaries,
    then a map-side bucket assignment) and is IMPLEMENTED as
    w8b_ntile_sampled below, plan-pinned to keep every sort off the
    full table. This entry exists for the exact operator's semantics;
    the aggregation after it reduces the single-partition output
    immediately."""
    orders = _t(spark, sf_dir, "orders")
    deciled = orders.select(
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        "o_totalprice",
        F.ntile(10)
        .over(W.orderBy("o_totalprice", "o_orderkey"))
        .cast("bigint")
        .alias("decile"),
    )
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("sum_price"),
        F.max("o_totalprice").alias("max_price"),
    )


W8_SQL = """
SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       MAX(o_totalprice) AS max_price
FROM (SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders)
GROUP BY decile
"""


def w8b_ntile_sampled(spark, sf_dir):
    """The 100-TB decile bucketing w8's docstring promises: two-phase
    sampled-boundary ntile, no global sort anywhere. Phase 1 takes a
    DETERMINISTIC ~6% sample (the t8 LCG — ((key*1103515245+12345)
    mod 2^31) mod 100 < 6, shared verbatim with the oracle so the
    "randomness" is part of the contract, like d5/d6/e2), ranks ONLY
    the sample (the single-partition window is bounded by the sample
    size, not the corpus — at a fixed rate you'd cap it with a
    second-level rate at extreme scale), and keeps the 9 boundary rows
    at ranks floor(i*n/10), i=1..9. Phase 2 broadcasts the sorted
    boundary array back and assigns bucket = 1 + #(boundaries < value)
    as a pure map-side expression — no shuffle touches the full table
    until the final 10-group aggregate. Buckets are approximately
    equal-count (sampling error), NOT exactly — that is the trade the
    scale path makes, and both engines compute the identical
    approximation. Ties sit in the lower bucket (strict <); when the
    sample has <10 rows duplicate boundary ranks collapse (set
    semantics), identically in both engines. Same int64-overflow
    caveat as stratified_hash_sample for 10^10+ keys.

    Reference scope: beyond-reference curation operator (the reference
    has no quantile bucketing; nearest is its full-table pandas loads,
    gtfs_extractor/extractor.py)."""
    orders = _t(spark, sf_dir, "orders")
    lcg = F.pmod(
        F.pmod(
            F.col("o_orderkey") * F.lit(1103515245) + F.lit(12345),
            F.lit(2147483648),
        ),
        F.lit(100),
    )
    sample = orders.filter(lcg < F.lit(6)).select("o_totalprice", "o_orderkey")
    n_df = sample.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        sample.select(
            "o_totalprice",
            F.row_number()
            .over(W.orderBy("o_totalprice", "o_orderkey"))
            .alias("r"),
        )
        .crossJoin(F.broadcast(n_df))
        .filter(
            F.expr(
                "array_contains(transform(sequence(1, 9),"
                " i -> CAST(floor(i * n / 10.0) AS BIGINT)), r)"
            )
        )
    )
    bounds = ranked.agg(
        F.sort_array(F.collect_list("o_totalprice")).alias("bs")
    )
    assigned = orders.crossJoin(F.broadcast(bounds)).select(
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        "o_totalprice",
        (
            F.lit(1)
            + F.size(
                F.filter("bs", lambda b: b < F.col("o_totalprice"))
            )
        )
        .cast("bigint")
        .alias("decile"),
    )
    return assigned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("sum_price"),
        F.max("o_totalprice").alias("max_price"),
    )


W8B_SQL = """
WITH sample AS (
  SELECT o_totalprice, o_orderkey FROM orders
  WHERE ((o_orderkey * 1103515245 + 12345) % 2147483648) % 100 < 6
),
ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
         COUNT(*) OVER () AS n
  FROM sample
),
bounds AS (
  SELECT o_totalprice AS b FROM ranked
  WHERE EXISTS (SELECT 1 FROM range(1, 10) t(i)
                WHERE CAST(floor(i * n / 10.0) AS BIGINT) = r)
)
SELECT decile, COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS sum_price,
       MAX(o_totalprice) AS max_price
FROM (
  SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS price, o_totalprice,
         CAST(1 + (SELECT COUNT(*) FROM bounds WHERE b < o.o_totalprice)
              AS BIGINT) AS decile
  FROM orders o
)
GROUP BY decile
"""


def a11_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the general form a8's ROLLUP and a10's
    CUBE are shorthands of: an arbitrary, non-hierarchical set of
    grouping combinations ((status, priority), (status), ()) in ONE
    pass. Spark plans all three through the same Expand node + a
    single aggregation shuffle, so k sets cost one extra projected
    copy per set, never k scans. Same '(all)' sentinel rule as
    a8/a10."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_a11")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders_a11
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


A11_SQL = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def w9_locf_gap_fill(spark, sf_dir):
    """Calendar-spine densification + last-observation-carried-forward
    — the time-series repair pass a metrics/feature pipeline runs over
    an irregular event feed: build each user's full daily spine between
    their first and last active day (F12's sequence+explode, per key),
    left-join the observed daily aggregate, and fill gaps with the most
    recent prior observation via last(ignorenulls) over an unbounded
    preceding frame.

    100-TB shape: the spine explode is per-key-bounded (span days, no
    cross joins); the observed-day aggregate, the spine join, and the
    LOCF window all cluster on user_id, so Catalyst reuses one
    exchange for the join and window stages. The daily mean divides a
    DECIMAL sum by an exact count and rounds at the boundary (shared-
    double rule)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            (
                F.sum(F.col("value").cast("decimal(18,6)"))
                / F.count(F.lit(1))
            ).cast("double"),
            6,
        ).alias("day_value")
    )
    spine = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    locf = F.last("day_value", ignorenulls=True).over(
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # day leaves as TIMESTAMP on both sides: a raw DATE crosses the
    # two engines' pandas paths as date-object vs datetime64 and the
    # driver hash sees different isoformats (f3 formats for the same
    # reason)
    return joined.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        (~F.col("day_value").isNull()).alias("observed"),
        locf.alias("filled_value"),
    )


W9_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         round(CAST(SUM(CAST(value AS DECIMAL(18,6))) / COUNT(*) AS DOUBLE), 6)
             AS day_value
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL '1 day'))::DATE AS day
  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1)
)
SELECT s.user_id, CAST(s.day AS TIMESTAMP) AS day,
       d.day_value IS NOT NULL AS observed,
       last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


def w10_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: longest consecutive-day activity streak per
    user. The canonical island trick — day minus row_number (in days)
    is constant within a consecutive run — turns streak detection into
    two window passes + a rollup with NO self-join or recursion (w3
    detects gaps over raw timestamps; this groups the runs themselves).

    100-TB shape: distinct-days, the island window, and both rollups
    all cluster on user_id, so the plan is one shuffle on (user_id,
    day) for the distinct + windows that reuse user_id partitioning;
    streak length never needs the raw events again."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    islands = days.select(
        "user_id", "day", F.date_sub(F.col("day"), rn).alias("island")
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("streak_len").cast("bigint").alias("n_active_days"),
    )


W10_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), islands AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INT) AS island
  FROM days
), streaks AS (
  SELECT user_id, island, COUNT(*) AS streak_len
  FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(streak_len) AS BIGINT) AS n_active_days
FROM streaks GROUP BY user_id
"""


def a12_stats_moments(spark, sf_dir):
    """Statistical moment aggregates (stddev, Pearson correlation) per
    group — the moments a curation pipeline reads before setting
    quality thresholds. Determinism: built-in stddev/corr stream a
    running-update formula whose float result is summation-order-
    dependent (not reproducible across engines OR across Spark
    retries), so both sides instead accumulate EXACT decimal power
    sums (Σx, Σx², Σy, Σy², Σxy — order-independent by exactness)
    in one pass and evaluate the identical closed-form double
    expression on top. Scale shape: one partial-aggregated shuffle of
    six decimals per group, no second scan, no window."""
    li = _t(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(18,4)")
    pdc = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(qd).alias("_sq"),
        F.sum(qd * qd).alias("_sqq"),
        F.sum(pdc).alias("_sp"),
        F.sum(pdc * pdc).alias("_spp"),
        F.sum(qd * pdc).alias("_sqp"),
    )
    n = F.col("n_rows").cast("double")
    sq, sqq = F.col("_sq").cast("double"), F.col("_sqq").cast("double")
    sp, spp = F.col("_sp").cast("double"), F.col("_spp").cast("double")
    sqp = F.col("_sqp").cast("double")
    stddev_qty = F.sqrt((sqq - sq * sq / n) / (n - F.lit(1.0)))
    corr = (n * sqp - sq * sp) / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))
    return agg.select(
        "l_returnflag",
        "n_rows",
        F.round(stddev_qty, 6).alias("stddev_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


A12_SQL = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       round(sqrt((sqq - sq * sq / CAST(n_rows AS DOUBLE)) / (CAST(n_rows AS DOUBLE) - 1.0)), 6) AS stddev_qty,
       round((CAST(n_rows AS DOUBLE) * sqp - sq * sp)
             / sqrt((CAST(n_rows AS DOUBLE) * sqq - sq * sq)
                    * (CAST(n_rows AS DOUBLE) * spp - sp * sp)), 6) AS corr_qty_price
FROM sums
"""


def a13_exact_quantiles(spark, sf_dir):
    """Exact per-group quantiles (p25/p75/p95) via the NEAREST-RANK
    definition — value at row_number == ceil(q·n) — generalizing a7's
    median shape. percentile()/quantile_cont() interpolate with
    engine-specific float internals; nearest-rank is pure integer rank
    selection, deterministic on any engine. The ceil is INTEGER
    arithmetic ((n·q_pct + 99) DIV 100), never float — 0.95·n in
    binary float lands epsilon above exact integers and flips the
    ceil. Scale shape: one partition-local sort per group (the same
    work any exact order statistic costs), one row per group out; no
    global sort, no second scan — the three ranks are selected in the
    same pass and pivoted by conditional aggregation."""
    from ..operators.stats import exact_quantiles

    ev = _t(spark, sf_dir, "events")
    return exact_quantiles(ev, "event_type", "value", "event_id", [25, 75, 95])


A13_SQL = """
WITH ranked AS (
  SELECT event_type, value AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       MAX(CASE WHEN rn = (n * 25 + 99) // 100 THEN v END) AS p25,
       MAX(CASE WHEN rn = (n * 75 + 99) // 100 THEN v END) AS p75,
       MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) AS p95
FROM ranked
WHERE rn = (n * 25 + 99) // 100
   OR rn = (n * 75 + 99) // 100
   OR rn = (n * 95 + 99) // 100
GROUP BY event_type
"""


def a14_column_profile(spark, sf_dir):
    """One-scan data-profiling rollup — exact distinct count and null
    count per column, emitted LONG (col_name, n_distinct, n_null) —
    the schema-drift / cardinality monitor a CDC pipeline runs against
    every landed batch. All three distinct aggregates ride ONE scan
    (Spark plans multi-distinct as a single Expand + two-level agg, so
    the cost is one pass regardless of column count, where the naive
    per-column profiler rescans k times); the wide 1-row aggregate is
    reshaped by stack() on the driver-side single row. The profiled
    frame includes a null-able derived column (JSON k extraction) so
    the null counter is exercised, not trivially zero."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
    )
    wide = d.agg(
        F.countDistinct("event_type").alias("nd1"),
        F.sum(F.isnull("event_type").cast("long")).alias("nn1"),
        F.countDistinct("user_id").alias("nd2"),
        F.sum(F.isnull("user_id").cast("long")).alias("nn2"),
        F.countDistinct("k_int").alias("nd3"),
        F.sum(F.isnull("k_int").cast("long")).alias("nn3"),
    )
    return wide.selectExpr(
        "stack(3, 'event_type', nd1, nn1, 'user_id', nd2, nn2, 'k_int', nd3, nn3) "
        "AS (col_name, n_distinct, n_null)"
    )


A14_SQL = """
WITH d AS (
  SELECT event_type, user_id,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
  FROM events
)
SELECT 'event_type' AS col_name,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
FROM d
UNION ALL
SELECT 'user_id', CAST(COUNT(DISTINCT user_id) AS BIGINT),
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM d
UNION ALL
SELECT 'k_int', CAST(COUNT(DISTINCT k_int) AS BIGINT),
       CAST(SUM(CASE WHEN k_int IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM d
"""


def w12_range_frame_rolling(spark, sf_dir):
    """Event-TIME range-frame rolling aggregate — per user, at each
    event, the sum and count of the user's events in the trailing
    3600-second window measured on the TIMESTAMP axis (RANGE frame),
    not on row offsets (ROWS — w5's shape): with irregular event
    spacing the two frames answer different questions, and the
    range-frame one is what rate limiting / rolling-QPS monitors need.
    Both engines order by epoch SECONDS (exact bigints) so the frame
    boundary arithmetic is integer, never interval/calendar logic;
    value sums ride DECIMAL. Ties on the same second are fine: RANGE
    includes ALL peer rows of the boundary second in both engines by
    definition. One shuffle on user_id; the frame scan is the
    partition-local running-window pass any time-decay feature costs."""
    ev = _t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").alias("epoch_s")
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", "user_id", epoch, F.col("value").cast("decimal(18,4)").alias("_v")
    ).select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.sum("_v").over(w).cast("double").alias("sum_1h"),
    )


W12_SQL = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
FROM (SELECT event_id, user_id, epoch(ts)::BIGINT AS epoch_s, value FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def w13_funnel_subsequence(spark, sf_dir):
    """Ordered funnel (view → click → purchase as a SUBSEQUENCE per
    user): a click counts only with a view strictly before it, a
    purchase only with a qualifying click strictly before it. The
    textbook plan is three passes (agg first-view, join back, agg
    first-qualifying-click, join back, …) — three shuffles of the fact
    table. This plan is ONE exchange: qualification is existential, so
    two stacked MAX-flag windows over the same (user_id | ts, event_id)
    sort ('seen a view among preceding rows', 'seen a qualifying click
    among preceding rows') decide every row, and the final per-stage
    distinct-user counts aggregate the flags. Strict precedence via the
    ROWS UNBOUNDED PRECEDING..1 PRECEDING frame; (ts, event_id) makes
    the order total, so ties are impossible rather than tolerated.
    Reference analogue: the staged existence gates of
    idempotent_process.py:94-104 (process only after download, upload
    only after process) — the same subsequence contract, per user
    instead of per date."""
    ev = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_view = (F.col("event_type") == "view").cast("int")
    st = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("_seen_view", F.coalesce(F.max(is_view).over(w), F.lit(0)))
        .withColumn(
            "_click_q",
            ((F.col("event_type") == "click") & (F.col("_seen_view") == 1)).cast("int"),
        )
    )
    st = st.withColumn(
        "_seen_click_q", F.coalesce(F.max("_click_q").over(w), F.lit(0))
    )
    purchase_q = (F.col("event_type") == "purchase") & (F.col("_seen_click_q") == 1)
    return st.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).cast("bigint").alias("stage1_users"),
        F.countDistinct(F.when(F.col("_click_q") == 1, F.col("user_id")))
        .cast("bigint")
        .alias("stage2_users"),
        F.countDistinct(F.when(purchase_q, F.col("user_id")))
        .cast("bigint")
        .alias("stage3_users"),
    )


W13_SQL = """
WITH st AS (
  SELECT user_id, event_type, ts, event_id,
         COALESCE(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_view
  FROM events
), st2 AS (
  SELECT user_id, event_type,
         CASE WHEN event_type = 'click' AND seen_view = 1 THEN 1 ELSE 0 END AS click_q,
         COALESCE(MAX(CASE WHEN event_type = 'click' AND seen_view = 1
                           THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seen_click_q
  FROM st
)
SELECT
  CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT)
    AS stage1_users,
  CAST(COUNT(DISTINCT CASE WHEN click_q = 1 THEN user_id END) AS BIGINT)
    AS stage2_users,
  CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' AND seen_click_q = 1
                           THEN user_id END) AS BIGINT) AS stage3_users
FROM st2
"""


def a15_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct count with a CHECKED error bound —
    the sketch aggregate every 100-TB cardinality job leads with
    (per-partition sketches merge associatively; the shuffle carries
    one ~KB sketch per group instead of the distinct-key set that
    count_distinct's two-phase Expand plan shuffles). The sketch VALUE
    is engine-specific (Spark HLL++ vs DuckDB's HLL disagree by
    design), so the oracle-checked contract is the ERROR BOUND, not
    the estimate: the query computes both approx_count_distinct(rsd=
    0.02) and the exact distinct per group and emits whether the
    estimate landed within 5% (2.5 sigma — a bound the sketch must
    clear on any corpus), plus the exact count the oracle reproduces.
    A red row here means the sketch's accuracy contract broke, which
    is precisely what a per-batch cardinality monitor wants to alarm
    on. Scale note: the exact count exists only to audit the sketch at
    test scale — production runs the sketch alone."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_exact"),
            F.approx_count_distinct("user_id", 0.02).alias("_n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("_n_approx") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(0.05)
            ).alias("within_5pct"),
        )
    )


A15_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
"""


def a16_approx_quantile_bound(spark, sf_dir):
    """Approximate p95 with a CHECKED rank-error band — a15's contract
    pattern applied to quantiles (the latency/size-distribution monitor
    next to a15's cardinality monitor). percentile_approx's sketch
    value is engine-specific, but its guarantee is not: with accuracy
    A the returned value's RANK is within n/A of the target. The query
    audits that guarantee against the EXACT nearest-rank values at the
    ±1% rank band edges (a13's integer-ceil machinery, so the band
    itself is oracle-reproducible): band edges ⌈0.94n⌉ and ⌈0.96n⌉,
    sketch run at accuracy 1000 (±0.1% rank) — a 10× margin the sketch
    must clear on any data. Scale shape: ONE per-group sort pass
    (the window) feeding both the band-edge selection and the sketch
    aggregate — no second scan; at production scale the sketch runs
    alone (mergeable, one ~KB state per group through the shuffle)
    and the exact band exists only for the audit."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type", "value", "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_type")
        ).alias("n"),
    )
    lo_rn = F.expr("GREATEST(1, (n * 94 + 99) DIV 100)")
    hi_rn = F.expr("LEAST(n, (n * 96 + 99) DIV 100)")
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == lo_rn, F.col("value"))).alias("p95_lo"),
            F.max(F.when(F.col("rn") == hi_rn, F.col("value"))).alias("p95_hi"),
            F.percentile_approx("value", 0.95, 1000).alias("_p95_sketch"),
        )
        .select(
            "event_type",
            "p95_lo",
            "p95_hi",
            (
                (F.col("_p95_sketch") >= F.col("p95_lo"))
                & (F.col("_p95_sketch") <= F.col("p95_hi"))
            ).alias("within_band"),
        )
    )


A16_SQL = """
WITH ranked AS (
  SELECT event_type, value AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       MAX(CASE WHEN rn = GREATEST(1, (n * 94 + 99) // 100) THEN v END) AS p95_lo,
       MAX(CASE WHEN rn = LEAST(n, (n * 96 + 99) // 100) THEN v END) AS p95_hi,
       TRUE AS within_band
FROM ranked
GROUP BY event_type
"""
