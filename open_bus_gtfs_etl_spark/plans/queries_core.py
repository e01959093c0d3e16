"""Projections, scalar functions, joins, set ops and streaming-shaped
analytics (p*/f*/j*/u*/s*) of the driver-contract query catalog.

Mechanically split out of plans/queries.py (round 5) to keep files
reviewable; naming conventions and the determinism rules for the
value-hash gate are documented in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .base import _t  # noqa: F401



# --------------------------------------------------------------------------
# P — projections / filters / predicates (SURVEY §2.2, P1-P6)
# --------------------------------------------------------------------------

def p1_project_filter(spark, sf_dir):
    """P1+P2: column pruning + pushed-down predicates (reference:
    load_stops_to_db.py:48-50 projection; :34 date filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_shipdate") < "1997-01-01") & (F.col("l_quantity") > 45))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("qty"),
            F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price"),
        )
    )


P1_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INT) AS qty,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
"""


def p2_null_safe_cast(spark, sf_dir):
    """P4+F8: cast-with-null-on-failure (reference int() casts with
    debug policy, load_stop_times_to_db.py:86-110)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_int"),
        F.when(F.col("value") < 0, None).otherwise(F.col("value")).alias("value_nonneg"),
    ).where(k.isNotNull())


P2_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       CASE WHEN value < 0 THEN NULL ELSE value END AS value_nonneg
FROM events
WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
"""


def p3_topk_limit(spark, sf_dir):
    """P6+W ordering: deterministic limit (reference --limit debug flag,
    load_stop_times_to_db.py:75-76, made deterministic by total order)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total"),
        )
    )


P3_SQL = """
SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""




# --------------------------------------------------------------------------
# F — scalar functions (SURVEY §2.7, F1-F13)
# --------------------------------------------------------------------------

def f1_regexp_extract(spark, sf_dir):
    """F1 analogue: substring extraction between markers + failure-as-
    null (reference parse_stop_desc, load_stops_to_db.py:12-18)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_tok"),
        F.size(F.regexp_extract_all("text", F.lit(r"merge"), 0)).cast("long").alias("n_merge"),
    )


F1_SQL = """
SELECT doc_id,
       COALESCE(regexp_extract(text, '^([a-z]+)', 1), '') AS first_tok,
       CAST(len(regexp_extract_all(text, 'merge')) AS BIGINT) AS n_merge
FROM documents
"""


def f2_split_part(spark, sf_dir):
    """F2 analogue: 3-way split with positional extraction (reference
    route_desc.split('-'), load_routes_to_db.py:41-45)."""
    p = _t(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.element_at(toks, 1).alias("adjective"),
        F.element_at(toks, 2).alias("noun"),
        F.when(F.size(toks) == 2, F.lit("ok")).otherwise(F.lit("bad")).alias("parse_status"),
    )


F2_SQL = """
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS adjective,
       split_part(p_name, ' ', 2) AS noun,
       CASE WHEN len(string_split(p_name, ' ')) = 2 THEN 'ok' ELSE 'bad' END AS parse_status
FROM part
"""


def f3_date_arith(spark, sf_dir):
    """F6+F11+F13: date parse/arithmetic/formatting (reference
    parse_date_str common.py:33-39; timedelta math idempotent_process.py:101;
    dated-path templating common.py:51-72)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("dated_path"),
    )


F3_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
       strftime(o_orderdate, '%Y/%m/%d') AS dated_path
FROM orders
"""


def f4_json(spark, sf_dir):
    """F9: JSON decode + aggregate over extracted field (reference JSON
    staging rows, load_stop_times_to_db.py:111,126)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


F4_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def f6_sequence_explode(spark, sf_dir):
    """F12: date/int-range generation + explode (reference
    iterate_last_dates, idempotent_process.py:20-22)."""
    r = _t(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.explode(F.sequence(F.lit(0), F.col("r_regionkey"))).alias("i"),
    ).select("r_regionkey", F.col("i").cast("long").alias("i"))


F6_SQL = """
SELECT r_regionkey, CAST(unnest(generate_series(0, r_regionkey)) AS BIGINT) AS i
FROM region
"""


def f7_string_funcs(spark, sf_dir):
    """F5+F7+F10: padding/formatting/concat (reference zfill
    load_stop_times_to_db.py:27; key concat :120)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.length("c_name").cast("long").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
    )


F7_SQL = """
SELECT c_custkey,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
       concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
       CAST(length(c_name) AS BIGINT) AS name_len,
       upper(c_mktsegment) AS seg_upper
FROM customer
"""




# --------------------------------------------------------------------------
# J — joins (SURVEY §2.3, J1-J11)
# --------------------------------------------------------------------------

def j1_merge_branch_split(spark, sf_dir):
    """J1/M1: the MERGE matched/not-matched split as a left join +
    outcome counter (reference upsert branch, load_stops_to_db.py:55-72)."""
    o = _t(spark, sf_dir, "orders")
    tgt = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0).select("c_custkey")
    j = o.join(tgt, o.o_custkey == tgt.c_custkey, "left_outer")
    outcome = F.when(F.col("c_custkey").isNotNull(), "update").otherwise("insert")
    return j.select(outcome.alias("outcome")).groupBy("outcome").agg(
        F.count("*").alias("n")
    )


J1_SQL = """
SELECT CASE WHEN c.c_custkey IS NOT NULL THEN 'update' ELSE 'insert' END AS outcome,
       COUNT(*) AS n
FROM orders o
LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 0) c
  ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def j2_group_collect(spark, sf_dir):
    """J2/A4: join + group-collect to a set (reference dict-of-sets
    mot_ids_by_code, load_stops_to_db.py:39-46)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations"))
    )


J2_SQL = """
SELECT r.r_name,
       array_to_string(list_sort(list(DISTINCT n.n_name)), ',') AS nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def j3_left_join_null(spark, sf_dir):
    """J3: lookup left join with miss ⇒ null (reference routes⟕agency
    via .get, load_routes_to_db.py:46)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_regionkey") < 3)
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_outer").select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    )


J3_SQL = """
SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
FROM nation n LEFT JOIN (SELECT * FROM region WHERE r_regionkey < 3) r
  ON n.n_regionkey = r.r_regionkey
"""


def j4_inner_drop_count(spark, sf_dir):
    """J4: inner join with counted drops (reference trips⋈routes missing-
    route skip + stat, load_trips_to_db.py:39,51-52)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").where(F.col("s_suppkey") % 3 == 0).select("s_suppkey")
    j = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left_outer")
    return j.agg(
        F.sum(F.when(F.col("s_suppkey").isNotNull(), 1).otherwise(0)).alias("n_matched"),
        F.sum(F.when(F.col("s_suppkey").isNull(), 1).otherwise(0)).alias("n_dropped"),
    )


J4_SQL = """
SELECT CAST(SUM(CASE WHEN s.s_suppkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM lineitem l
LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 3 = 0) s
  ON l.l_suppkey = s.s_suppkey
"""


def j5_semi(spark, sf_dir):
    """Left-semi (EXISTS) — the matched side of the MERGE rewrite."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


J5_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
"""


def j6_anti(spark, sf_dir):
    """Left-anti (NOT EXISTS) — the not-matched side of the MERGE rewrite."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


J6_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def j7_two_hop(spark, sf_dir):
    """J7: two-hop lookup join + rollup (reference stop_id→mot_id→
    gtfs_stop_id chain, load_stop_times_to_db.py:48-58)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(rev).alias("revenue"), F.count("*").alias("n_items"))
        .select("c_mktsegment", F.col("revenue").cast("double").alias("revenue"), "n_items")
    )


J7_SQL = """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def j8_chain4_threshold(spark, sf_dir):
    """J9+A3: 4-table FK-chain join + count + threshold gate (reference
    validation join num_ride_stops>1000, update_gtfs_data_db.py:114-122)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .join(c, n.n_nationkey == c.c_nationkey)
        .join(o, c.c_custkey == o.o_custkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .where(F.col("n_orders") > 10)
    )


J8_SQL = """
SELECT r.r_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM region r
JOIN nation n ON r.r_regionkey = n.n_regionkey
JOIN customer c ON n.n_nationkey = c.c_nationkey
JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY r.r_name HAVING COUNT(*) > 10
"""


def j9_asof(spark, sf_dir):
    """J10: as-of backward join with tolerance (reference check_date:
    latest snapshot ≤ target, reject if gap > 10 days,
    idempotent_process.py:94-104). Here: for each purchase, the latest
    click by the same user within the preceding 1 day."""
    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (p.user_id == c.c_user)
        & (c.c_ts <= p.ts)
        & (c.c_ts >= p.ts - F.expr("INTERVAL 1 DAY"))
    )
    return (
        p.join(c, cond, "left_outer")
        .groupBy("event_id")
        .agg(F.max("c_ts").alias("last_click_ts"))
    )


J9_SQL = """
SELECT p.event_id, MAX(c.ts) AS last_click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 DAY
GROUP BY p.event_id
"""


def j9b_asof_window(spark, sf_dir):
    """The SAME as-of semantics as j9 (checked against the SAME oracle
    SQL) through the scale-safe window plan: tagged union + running
    last-click per user — one hash shuffle, NO join node, linear work
    for arbitrarily hot users (j9's equi-join + range filter fans out
    purchases × clicks within the tolerance window before its groupBy
    collapses them — quadratic for a pathological user). Equivalence on
    skewed inputs is property-tested in tests/test_asof.py."""
    from ..operators.asof import asof_backward

    ev = _t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    res = asof_backward(
        p, c, on=["user_id"], tolerance=F.expr("INTERVAL 1 DAY"),
        out_col="last_click_ts",
    )
    # j9's oracle groups by event_id (a duplicated purchase event_id
    # collapses to one row) — mirror that on the already-reduced frame
    return res.groupBy("event_id").agg(
        F.max("last_click_ts").alias("last_click_ts")
    )


def u1_set_ops(spark, sf_dir):
    """§2.6 set operations as a driver-checked query (the engine uses
    unionByName/exceptAll in genlog and registry alignment; this pins
    their semantics against ANSI EXCEPT ALL / INTERSECT ALL / UNION
    ALL): BUILDING-segment customers split into those without orders
    (exceptAll) and with orders (intersectAll), tagged, unioned, and
    rolled up per nation."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nation")
    )
    b = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", F.col("c_nationkey").cast("long").alias("nation"))
    )
    tagged = a.exceptAll(b).withColumn("tag", F.lit("without_orders")).unionByName(
        a.intersectAll(b).withColumn("tag", F.lit("with_orders"))
    )
    return tagged.groupBy("nation", "tag").agg(F.count("*").alias("n_customers"))


U1_SQL = """
WITH a AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation
  FROM customer WHERE c_mktsegment = 'BUILDING'
),
b AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation
  FROM customer WHERE c_mktsegment = 'BUILDING'
    AND c_custkey IN (SELECT o_custkey FROM orders)
),
tagged AS (
  SELECT *, 'without_orders' AS tag FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
  UNION ALL
  SELECT *, 'with_orders' AS tag FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
)
SELECT nation, tag, COUNT(*) AS n_customers FROM tagged GROUP BY nation, tag
"""




# --------------------------------------------------------------------------
# S — streaming-shaped analytics (SURVEY §2.10)
# --------------------------------------------------------------------------

def s1_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour window aggregate (the daily-file-as-window
    analogue; engine metrics query shape)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )


S1_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def s2_session_window(spark, sf_dir):
    """Gap-session aggregation with the built-in ``F.session_window``
    (1-hour gap) in batch mode — the same operator the streaming
    sessionizer uses (`streaming/sessions.py:sessionize`), here
    driver-checkable against a lag+cumsum gap-session SQL oracle.
    ``session_end`` is last event + gap (the built-in's convention).
    100-TB shape: one shuffle on user_id; session merge is JVM-side."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


S2_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) > 3600
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 1 HOUR AS session_end,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
"""


def s3_sliding_window(spark, sf_dir):
    """Sliding event-time window (10-minute size, 5-minute slide) —
    each event lands in exactly two overlapping windows via the
    built-in F.window, the hop-window shape streaming metrics use.
    The oracle reproduces the window set arithmetically (each event's
    two containing window starts on the shared 5-minute grid — Spark's
    epoch-aligned grid and DuckDB's time_bucket grid coincide because
    5 minutes divides a day). Money-sum goes through DECIMAL
    internally (order-independent, exact) and is cast to double at the
    boundary per the catalog determinism rules."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


S3_SQL = """
WITH x AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
           AS window_start,
         value
  FROM events
)
SELECT window_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM x GROUP BY 1
"""




# --------------------------------------------------------------------------
# Round-4 additions: range join, quantile bucketing, grouping sets,
# edit-distance near-dup
# --------------------------------------------------------------------------


def j10_interval_join(spark, sf_dir):
    """Point-in-interval range join, bucketed (operators/intervals.py):
    campaign windows (a 1-in-500 sample of events, each opening a 1-8 h
    window at its timestamp) joined to every event falling inside the
    window — no equi key exists between the two sides, only interval
    containment. Catalyst's native plan for that predicate is
    BroadcastNestedLoopJoin (O(n·m) and a full-side broadcast);
    ``bucketed_interval_join`` rewrites it to an exploded-bucket
    equi-join + residual filter, which shuffles on a long key and
    scales linearly. 4 h buckets ≈ the median window width: a range
    replicates to ≤ 3 bucket rows. The oracle states the same join
    declaratively (DuckDB plans its own IEJoin for it)."""
    from ..operators.intervals import bucketed_interval_join

    ev = _t(spark, sf_dir, "events")
    ranges = (
        ev.where(F.col("event_id") % 500 == 0)
        .select(
            F.col("event_id").alias("campaign_id"),
            F.col("ts").alias("lo"),
            F.expr(
                "ts + make_interval(0, 0, 0, 0, "
                "CAST(CAST(event_id / 500 AS BIGINT) % 7 + 1 AS INT), 0, 0)"
            ).alias("hi"),
        )
    )
    probe = ev.select(F.col("ts").alias("ev_ts"))
    joined = bucketed_interval_join(
        probe, ranges, point_col="ev_ts", lo_col="lo", hi_col="hi",
        bucket_seconds=4 * 3600,
    )
    return joined.groupBy("campaign_id").agg(F.count(F.lit(1)).alias("n_events"))


J10_SQL = """
WITH r AS (
  SELECT event_id AS campaign_id, ts AS lo,
         ts + (CAST(event_id / 500 AS BIGINT) % 7 + 1) * INTERVAL '1 hour' AS hi
  FROM events WHERE event_id % 500 = 0
)
SELECT r.campaign_id, COUNT(*) AS n_events
FROM r JOIN events e ON e.ts >= r.lo AND e.ts < r.hi
GROUP BY r.campaign_id
"""


def j11_interval_overlap(spark, sf_dir):
    """Interval×interval overlap join, bucketed
    (operators/intervals.py:bucketed_overlap_join): maintenance windows
    (1-in-131 sample of events, 3-9 h) joined to every session window
    (1-in-89 sample, 3-15 h) they intersect — the general form of j10's
    point-in-interval containment, and the classic conflict-detection /
    co-occurrence shape. Catalyst's native plan is a nested loop; the
    operator explodes BOTH sides onto a 6 h bucket grid, equi-joins on
    the bucket id, and dedups pair multiplicity with the
    first-overlap-bucket ownership rule instead of a distinct()
    shuffle. The oracle states the same overlap declaratively."""
    from ..operators.intervals import bucketed_overlap_join

    ev = _t(spark, sf_dir, "events")
    sessions = ev.where(F.col("event_id") % 89 == 0).select(
        F.col("event_id").alias("session_id"),
        F.col("ts").alias("s_lo"),
        F.expr(
            "ts + make_interval(0, 0, 0, 0, "
            "CAST((CAST(event_id / 89 AS BIGINT) % 5 + 1) * 3 AS INT), 0, 0)"
        ).alias("s_hi"),
    )
    outages = ev.where(F.col("event_id") % 131 == 0).select(
        F.col("event_id").alias("outage_id"),
        F.col("ts").alias("o_lo"),
        F.expr(
            "ts + make_interval(0, 0, 0, 0, "
            "CAST((CAST(event_id / 131 AS BIGINT) % 3 + 1) * 3 AS INT), 0, 0)"
        ).alias("o_hi"),
    )
    pairs = bucketed_overlap_join(
        sessions, outages,
        left_lo="s_lo", left_hi="s_hi", right_lo="o_lo", right_hi="o_hi",
        bucket_seconds=6 * 3600,
    )
    return pairs.groupBy("outage_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.min("session_id").alias("first_session"),
    )


J11_SQL = """
WITH s AS (
  SELECT event_id AS session_id, ts AS s_lo,
         ts + (CAST(event_id / 89 AS BIGINT) % 5 + 1) * INTERVAL '3 hour' AS s_hi
  FROM events WHERE event_id % 89 = 0
), o AS (
  SELECT event_id AS outage_id, ts AS o_lo,
         ts + (CAST(event_id / 131 AS BIGINT) % 3 + 1) * INTERVAL '3 hour' AS o_hi
  FROM events WHERE event_id % 131 = 0
)
SELECT o.outage_id, COUNT(*) AS n_sessions, MIN(s.session_id) AS first_session
FROM s JOIN o ON s.s_lo < o.o_hi AND o.o_lo < s.s_hi
GROUP BY o.outage_id
"""


def s4_late_event_accounting(spark, sf_dir):
    """Out-of-order-arrival accounting — the monitoring query a CDC
    ingest runs over its own feed (the engine's ooo_rate analogue,
    genlog.py): in per-user ARRIVAL order (event_id is the arrival
    sequence), an event is late when its event time sits below the
    running high-water mark of everything that arrived before it.
    Exactly the watermark bookkeeping Structured Streaming keeps
    internally, expressed as one window pass + one aggregation.

    100-TB shape: a single shuffle on user_id feeds both the window
    and the groupBy (same clustering, Catalyst reuses the exchange);
    the running max is an UnboundedPreceding frame — O(1) per row,
    no per-event re-sort."""
    ev = _t(spark, sf_dir, "events")
    hwm = F.max("ts").over(
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "ts",
        hwm.alias("hwm"),
    )
    # TIMESTAMP_NTZ has no direct long cast — reinterpret through
    # TIMESTAMP first (session TZ pinned UTC, so identity)
    late_sec = (
        F.col("hwm").cast("timestamp").cast("long")
        - F.col("ts").cast("timestamp").cast("long")
    )
    return marked.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("ts") < F.col("hwm"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.max(F.when(F.col("ts") < F.col("hwm"), late_sec))
        .cast("bigint")
        .alias("max_late_sec"),
    )


S4_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ts < hwm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(MAX(CASE WHEN ts < hwm
                     THEN date_diff('second', ts, hwm) END) AS BIGINT)
           AS max_late_sec
FROM marked
GROUP BY user_id
"""


def j12_null_safe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): two event
    samples joined on a NULLABLE extracted key, where the null group
    must match the null group — the semantics a plain equi-join
    silently drops (NULL = NULL is never true) and the reference's
    dict-lookup joins get implicitly (a None key IS a dict key,
    load_stop_times_to_db.py:48-58's .get chains). The F7/'None'
    normalization family makes this a real CDC concern: normalized
    keys are legitimately null and must still pair.

    Scale note: Spark plans eqNullSafe as a HASH join (the key hashes
    as a (isnull, value) pair), so null-safety costs nothing — the
    plan test pins the absence of a nested loop. The null bucket is a
    designed skew hazard at 100 TB (every null row lands in ONE hash
    group on both sides — a null-heavy feed wants the null group
    pre-split or handled as a union branch); here it is one group by
    construction."""
    ev = _t(spark, sf_dir, "events")
    k0 = F.get_json_object("props", "$.k").cast("int").cast("long")
    # the testdata's extracted key is never null — inject nulls
    # DETERMINISTICALLY (k divisible by 10 ⇒ null), mirrored verbatim
    # in the oracle, so the null-matches-null branch actually runs
    k = F.when(k0 % 10 != 0, k0)
    left = ev.where(F.col("event_id") % 7 == 0).select(
        F.col("event_id").alias("l_id"), k.alias("l_k")
    )
    right = (
        ev.where(F.col("event_id") % 11 == 0)
        .select(k.alias("r_k"))
        .groupBy("r_k")
        .agg(F.count(F.lit(1)).alias("r_n"))
    )
    joined = left.join(right, left.l_k.eqNullSafe(right.r_k), "inner")
    return joined.groupBy(
        F.coalesce(F.col("l_k"), F.lit(-1)).alias("k_group")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("r_n").cast("bigint").alias("sum_right_mult"),
    )


J12_SQL = """
WITH k0 AS (
  SELECT event_id,
         CAST(TRY_CAST(json_extract_string(props, '$.k') AS INT) AS BIGINT) AS k0
  FROM events
), kk AS (
  SELECT event_id, CASE WHEN k0 % 10 != 0 THEN k0 END AS k FROM k0
), l AS (
  SELECT event_id AS l_id, k AS l_k FROM kk WHERE event_id % 7 = 0
), r AS (
  SELECT k AS r_k, COUNT(*) AS r_n
  FROM kk WHERE event_id % 11 = 0
  GROUP BY 1
)
SELECT coalesce(l.l_k, -1) AS k_group,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(r.r_n) AS BIGINT) AS sum_right_mult
FROM l JOIN r ON l.l_k IS NOT DISTINCT FROM r.r_k
GROUP BY 1
"""


def u2_unpivot(spark, sf_dir):
    """Wide→long reshape (UNPIVOT / stack) of a per-group metric row
    into (group, metric, value) tuples — the long form metric stores
    and plotting layers consume. Spark's DataFrame.unpivot plans an
    Expand node (k projected copies in one pass over the aggregate,
    which is |groups| rows — never a re-scan of the fact table); the
    oracle spells the same reshape as UNION ALL over a CTE."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["n_rows", "sum_qty", "sum_price"], "metric", "value"
    )


U2_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM wide
UNION ALL SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
"""


def j13_salted_skew_join(spark, sf_dir):
    """Explicitly skew-salted equi-join (operators/skewjoin.py): the
    events fact — whose join key ``event_type`` has single-digit
    cardinality over the whole table, the worst-case hot-key
    distribution — joined to a derived per-type dim (the per-domain
    stats frame a curation pipeline computes in a prior pass). The
    fact rows are salted by ``pmod(xxhash64(event_id), 8)``, the dim
    is exploded into 8 salt replicas, and the join runs on
    ``(event_type, _salt)`` under a shuffle_hash hint — so the hottest
    key's rows spread over 8 reducers instead of crushing one. The
    oracle is the PLAIN join: salting must be row-for-row invisible in
    the result. At test scale a broadcast would of course win — the
    operator exists for dims that outgrow broadcast while the fact key
    stays skewed (AQE's skew split only rescues sort-merge joins);
    plan-pinned: salt in the join keys, dim replicated by explode, no
    BroadcastHashJoin. Output sums go through DECIMAL (a1's
    order-independence rule)."""
    from ..operators.skewjoin import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("type_users")
    )
    joined = salted_join(
        ev, dim, on=["event_type"], salt_cols=["event_id"], n_salts=8
    )
    return joined.groupBy("event_type", "type_users").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


J13_SQL = """
WITH dim AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS type_users
  FROM events GROUP BY event_type
)
SELECT e.event_type, dim.type_users,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events e JOIN dim ON e.event_type = dim.event_type
GROUP BY e.event_type, dim.type_users
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------
