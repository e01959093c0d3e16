"""Driver-contract query catalog: SURVEY.md §2 operators re-expressed
over the driver testdata (/root/testdata/sf*/), each paired with the
ANSI-SQL oracle DuckDB runs on the same parquet views.

Naming convention follows the survey inventory: p* projections/filters,
f* scalar functions, j* joins, a* aggregations, w* windows, m* the
merge/CDC centerpiece, d*/t*/e* the training-data operators (dedup,
text analysis, embeddings), s* streaming-shaped analytics.

Determinism rules for the value-hash gate (round-2 spec: output
schemas contain ONLY bigint, varchar, boolean, date/timestamp and
identically-computed double — never DECIMAL, whose physical
representation differs between the two engines' result paths):
- money/measure aggregates go through DECIMAL casts internally (exact,
  order-independent summation) and are cast to DOUBLE at the output
  boundary — decimal→double is correctly rounded in both engines, so
  equal decimals yield bit-equal doubles;
- DuckDB integer SUM returns HUGEINT (int128) → every integer SUM in
  the oracle SQL is wrapped in CAST(... AS BIGINT) to match Spark;
- ratios divide small exact integers (identical IEEE result in both
  engines); cosine similarity is rounded to 6 decimals on both sides;
- collected sets are sorted and joined to a string;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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


# --------------------------------------------------------------------------
# M — the CDC merge centerpiece in SQL-checkable batch form (SURVEY §2.8)
# --------------------------------------------------------------------------

def _cdc_final_state(ev, pre_partition: bool = False):
    """Shared m1/m2 kernel. ``pre_partition=True`` repartitions on
    user_id BEFORE the window: HashPartitioning(user_id) satisfies the
    window's ClusteredDistribution(user_id, turn) (subset rule), so a
    downstream per-user aggregation reuses the same exchange — one
    shuffle for window + groupBy instead of two."""
    turn = F.pmod(F.get_json_object("props", "$.k").cast("int"), F.lit(16)).alias("turn")
    op = F.when(F.col("event_type") == "error", "delete").otherwise("upsert").alias("op")
    src = ev.select("user_id", turn, op, "ts", "event_id", "event_type", "value")
    if pre_partition:
        src = src.repartition("user_id")
    w = W.partitionBy("user_id", "turn").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    winners = src.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return winners.where(F.col("op") != "delete").select(
        "user_id", "turn", "event_id", "event_type", "value"
    )


def m1_cdc_final_state(spark, sf_dir):
    """The flagship shape: treat events as a change feed keyed on
    (user_id, turn), LWW by (ts, event_id), delete on 'error' events,
    materialize the final state (W4 + M1-M5 + delete branch)."""
    return _cdc_final_state(_t(spark, sf_dir, "events"))


M1_SQL = """
SELECT user_id, turn, event_id, event_type, value FROM (
  SELECT user_id, turn, op, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, turn
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM (
    SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS INT) % 16 AS turn,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
           ts, event_id, event_type, value
    FROM events
  )
) WHERE rn = 1 AND op <> 'delete'
"""


def m8_schema_evolution_cdc(spark, sf_dir):
    """Mixed-schema-version CDC fold, driver-checkable: the north
    rule's late-added-column evolution case expressed as a query. One
    third of the feed (event_id % 3 == 0) arrives in the PRE-EVOLUTION
    envelope — the ``props`` payload column does not exist yet — and
    is aligned to the target schema by the engine's own
    ``align_to_schema`` (operators/merge.py:31: missing columns become
    typed nulls, column order fixed — the same function every merge
    batch passes through, registry.py's batch-side half of evolution).
    The aligned union then runs the m1 LWW fold unchanged: v1 rows
    carry a NULL turn key (their payload predates it) and LWW-collapse
    per user within the NULL-key group, exactly what the oracle
    computes inline. Proves align-then-fold ≡ fold-with-inline-nulls —
    the semantic the streaming multi-version tailer
    (streaming/tailer.py:start_multi_tailer) relies on per batch.
    100-TB shape: alignment is a zero-cost projection (no shuffle,
    no scan widening); the union adds no exchange — both branches
    flow into the same window shuffle."""
    from ..operators.merge import align_to_schema

    ev = _t(spark, sf_dir, "events")
    v1 = ev.filter(F.col("event_id") % 3 == 0).drop("props")
    v2 = ev.filter(F.col("event_id") % 3 != 0)
    aligned = align_to_schema(v1, ev.schema).unionByName(
        align_to_schema(v2, ev.schema)
    )
    return _cdc_final_state(aligned)


M8_SQL = """
SELECT user_id, turn, event_id, event_type, value FROM (
  SELECT user_id, turn, op, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, turn
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM (
    SELECT user_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE CAST(json_extract_string(props, '$.k') AS INT) % 16
           END AS turn,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
           ts, event_id, event_type, value
    FROM events
  )
) WHERE rn = 1 AND op <> 'delete'
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


# --------------------------------------------------------------------------
# D/T/E — training-data pipeline operators (dedup, text, embeddings)
# --------------------------------------------------------------------------

def d1_exact_dedup(spark, sf_dir):
    """Exact dedup: survivor per content hash = min doc_id (hash-groupBy)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.col("text"))).alias("content_hash"))
        .agg(F.min("doc_id").alias("survivor_doc_id"), F.count("*").alias("n_copies"))
    )


D1_SQL = """
SELECT md5(lower(text)) AS content_hash,
       MIN(doc_id) AS survivor_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def d2_ngram_jaccard(spark, sf_dir):
    """N-gram Jaccard near-dup scoring between consecutive doc pairs —
    set ops entirely in columnar array expressions (no UDF).
    int/int division is IEEE-exact and engine-identical.

    The token split is materialized as a column BEFORE shingling so
    codegen evaluates it once per row, not once per element_at (the
    round-1 version paid O(k·n_tokens) splits per row — d2 was the
    slowest headline query purely from that)."""
    from ..operators.textdedup import word_shingles_from_tokens

    d = _t(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id", word_shingles_from_tokens(F.col("toks"), 3).alias("sh")
    )
    a = sh.select("doc_id", F.col("sh").alias("sh_a"))
    b = sh.select((F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_b"))
    j = a.join(b, "doc_id")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "doc_id",
        (F.col("doc_id") + 1).alias("next_doc_id"),
        (inter / union).alias("jaccard"),
    )


D2_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2]
         )) AS sh
  FROM documents
)
SELECT a.doc_id, a.doc_id + 1 AS next_doc_id,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


def t1_quality_score(spark, sf_dir):
    """Text quality metrics: token counts, uniq ratio, stopword ratio,
    mean token length — exact-integer divisions only."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("long")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        (n_uniq.cast("double") / n_tok.cast("double")).alias("uniq_ratio"),
        (stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        (total_len.cast("double") / n_tok.cast("double")).alias("mean_tok_len"),
    )


T1_SQL = """
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
       CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
       CAST(len(list_filter(toks, t -> t IN ('the','a'))) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
       CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE)
         / CAST(len(toks) AS DOUBLE) AS mean_tok_len
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


def t2_langid_heuristic(spark, sf_dir):
    """Marker-token language-ID heuristic + accuracy check vs the label
    column (operator shape: multi-branch predicates over token sets)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    has = lambda t: F.array_contains(toks, t)  # noqa: E731
    pred = (
        F.when(has("the") & has("a"), "en")
        .when(has("spark"), "code")
        .otherwise("unknown")
    )
    return d.select(
        "doc_id", "lang", pred.alias("pred_lang"), (pred == F.col("lang")).alias("is_match")
    )


T2_SQL = """
SELECT doc_id, lang,
       CASE WHEN list_contains(toks, 'the') AND list_contains(toks, 'a') THEN 'en'
            WHEN list_contains(toks, 'spark') THEN 'code'
            ELSE 'unknown' END AS pred_lang,
       (CASE WHEN list_contains(toks, 'the') AND list_contains(toks, 'a') THEN 'en'
             WHEN list_contains(toks, 'spark') THEN 'code'
             ELSE 'unknown' END) = lang AS is_match
FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
"""


def t3_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 over the sorted distinct token set
    (order-insensitive content identity) + group count."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "))
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc_id")
    )


T3_SQL = """
SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS first_doc_id
FROM documents GROUP BY 1
"""


def e1_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 to the vec_id=0 query vector — the ANN
    baseline. Dot/norms in double precision; rounded to 6 dp on both
    sides so last-bit accumulation-order differences can't flip the hash."""
    em = _t(spark, sf_dir, "embeddings")
    q = em.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, qlit, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm_v = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    qn = sum(float(x) * float(x) for x in q) ** 0.5
    cos = F.round(dot / (norm_v * F.lit(qn)), 6)
    return (
        em.where(F.col("vec_id") != 0)
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


E1_SQL_TEMPLATE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       round(
         list_sum(list_transform(generate_series(1, len(e.embedding)),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


# brute-force 3-gram Jaccard over all pairs — the DuckDB oracle for the
# verified-output stage of BOTH LSH dedup pipelines. The candidate
# generation (minhash bands / simhash blocks) prunes WHICH pairs pay the
# exact Jaccard; above the threshold the verified output must equal the
# brute force (the sf0.01 corpus has a wide margin: dup pairs sit at
# j≈0.99, the next band at j≈0.1).
_BRUTE_JACCARD_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2]
         )) AS sh
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) > {thr}
"""


def d3_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH candidates, verified with exact 3-gram
    Jaccard > 0.5. Contract output is the VERIFIED stage — checkable
    against a DuckDB all-pairs brute force (the LSH pruning must lose
    nothing above the threshold on this corpus)."""
    from ..operators import textdedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cand = textdedup.minhash_lsh_candidates(d, num_hashes=32, bands=8)
    return (
        textdedup.jaccard_pairs(d, cand)
        .where(F.col("jaccard") > 0.5)
        .select("id_a", "id_b", "jaccard")
    )


D3_SQL = _BRUTE_JACCARD_SQL.format(thr="0.5")


def d4_simhash_near_dups(spark, sf_dir):
    """SimHash multi-block candidates — 16 blocks of 4 bits keyed on
    every 2-block combination (structural recall radius 16-2 = 14 ≥ the
    hamming ≤ 12 filter: any pair within the filter is GUARANTEED a
    candidate, pigeonhole, no corpus dependence) — verified with exact
    3-gram Jaccard > 0.8. Same oracle shape as d3, different candidate
    generator; the adversarial hamming-9 pair that the old 8×8-bit
    single-block config provably missed is unit-tested in
    tests/test_training_ops.py.

    One remaining disclosed layer: the DuckDB brute force includes
    EVERY pair with jaccard > 0.8, while high jaccard implies hamming
    ≤ 12 only in (tight) concentration — a true pair at hamming ≥ 13
    would be excluded by the FILTER itself, with any candidate scheme.
    On these corpora the margin is wide (dup pairs hamming ≤ 12 at
    j≈0.99, next band j≈0.1) and equality holds at every tested sf."""
    from ..operators import textdedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cand = textdedup.simhash_candidates(
        d, max_hamming=12, n_blocks=16, combo_m=2
    ).select("id_a", "id_b")
    return (
        textdedup.jaccard_pairs(d, cand)
        .where(F.col("jaccard") > 0.8)
        .select("id_a", "id_b", "jaccard")
    )


D4_SQL = _BRUTE_JACCARD_SQL.format(thr="0.8")


def d5_dedup_survivors(spark, sf_dir):
    """Pair→cluster→survivor corpus dedup: the d3 verified pairs
    (exact Jaccard > 0.5) are clustered via iterative min-id label
    propagation (connected components — no GraphFrames, only
    equi-joins), and the min doc_id per cluster survives. The
    reference's set-semantics insert-if-absent
    (load_stops_to_db.py:73-81) lifted to the near-dup graph. Oracle:
    DuckDB recursive CTE over the brute-force all-pairs set.

    Disclosure (same shape as d4's): the Spark side clusters
    MinHash-LSH candidate pairs while the oracle brute-forces every
    pair, so equality is corpus-dependent evidence of the pipeline, not
    a proof of LSH recall — a missed candidate pair would change
    cluster membership (split a cluster / flip a survivor), not just
    drop a pair row. On these corpora the 8-band/32-hash configuration
    recovers every jaccard>0.5 pair at every tested sf."""
    from ..operators import textdedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cand = textdedup.minhash_lsh_candidates(d, num_hashes=32, bands=8)
    pairs = textdedup.jaccard_pairs(d, cand).where(F.col("jaccard") > 0.5)
    return textdedup.dedup_survivors(pairs).select(
        "doc_id", "cluster_id", "is_survivor"
    )


D5_SQL = (
    "WITH RECURSIVE base_pairs AS (" + _BRUTE_JACCARD_SQL.format(thr="0.5") + "),\n"
    """edges AS (
  SELECT id_a AS src, id_b AS dst FROM base_pairs
  UNION
  SELECT id_b, id_a FROM base_pairs
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.src, t.r FROM edges e JOIN reach t ON e.dst = t.id
)
SELECT id AS doc_id, MIN(r) AS cluster_id, (id = MIN(r)) AS is_survivor
FROM reach GROUP BY id
"""
)


def e2_ivf_ann_topk(spark, sf_dir):
    """IVF-bucketed approximate nearest neighbors: vectors are assigned
    to their nearest of 8 deterministic pseudo-random centroids; the
    query probes its top-2 centroid buckets and scores only those
    vectors. Centroids are Python-generated literals shared verbatim by
    the Spark plan and the DuckDB oracle, so both engines compute the
    SAME approximate result — an honestly checkable ANN contract
    (the hyperplane-LSH variant lives in operators/similarity.py with
    recall unit tests; its buckets depend on xxhash64, which the oracle
    cannot reproduce)."""
    from ..operators import similarity

    em = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in em.where(F.col("vec_id") == 0).collect()[0].embedding]
    return similarity.ivf_topk(
        em.where(F.col("vec_id") != 0), q, k=10, n_centroids=8, n_probe=2
    ).select("vec_id", "label", "cos_sim")


def _build_e2_sql(dim: int = 64, n_centroids: int = 8, n_probe: int = 2) -> str:
    """Static IVF oracle: centroid literals are seed-derived (data-
    independent); the query vector and its probe set are computed inside
    the SQL, so one string serves every sf dir."""
    from ..operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_centroids=n_centroids)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    return f"""
WITH cents(cid, c) AS (VALUES
    {cent_rows}
),
q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id = 0
),
probes AS (
  SELECT cid FROM cents, q
  ORDER BY list_sum(list_transform(generate_series(1, len(qv)),
                    i -> qv[i] * c[i])) DESC, cid
  LIMIT {n_probe}
),
emb AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id <> 0
),
assigned AS (
  SELECT vec_id, label, v, cid,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_sum(list_transform(generate_series(1, len(v)),
                             i -> v[i] * c[i])) DESC, cid
         ) AS rn
  FROM emb CROSS JOIN cents
)
SELECT a.vec_id, a.label,
       round(
         list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * q.qv[i]))
         / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
            * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
         6) AS cos_sim
FROM assigned a, q
WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probes)
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


E2_SQL = _build_e2_sql()


def d6_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs, IVF-bucket-restricted with
    MULTI-PROBE (top-2) assignment: vectors land in their two nearest
    seed-derived centroid buckets, candidate pairs are shared-bucket
    pairs (equi-join on cid — ~4n²/k, not n²), exact cosine verifies,
    double-bucket pairs dedup. Top-2 probing closes the single-probe
    centroid-boundary blindness (a planted boundary-straddling pair is
    unit-tested in tests/test_training_ops.py). The centroid literals
    AND the top-2 assignment are shared verbatim with the oracle, so
    the bucket restriction is part of the checkable contract (e2
    style), not a hidden recall loss."""
    from ..operators import similarity

    em = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup_pairs(
        em, threshold=0.465, n_probe=2
    ).select("id_a", "id_b", "cos_sim")


def _build_d6_sql(
    dim: int = 64, n_centroids: int = 8, thr: float = 0.465, n_probe: int = 2
) -> str:
    from ..operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_centroids=n_centroids)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    cos = (
        "list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))"
        " / (sqrt(list_sum(list_transform(a.v, x -> x * x)))"
        " * sqrt(list_sum(list_transform(b.v, x -> x * x))))"
    )
    return f"""
WITH cents(cid, c) AS (VALUES
    {cent_rows}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
assigned AS (
  SELECT vec_id, v, cid,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_sum(list_transform(generate_series(1, len(v)),
                             i -> v[i] * c[i])) DESC, cid
         ) AS rn
  FROM emb CROSS JOIN cents
),
asg AS (SELECT vec_id, v, cid FROM assigned WHERE rn <= {n_probe})
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cos_sim
FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE {cos} > {thr}
"""


D6_SQL = _build_d6_sql()


def t4_token_count(spark, sf_dir):
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    tokenization (letter runs | digit runs | single punctuation — the
    word/number/symbol split every byte-pair tokenizer starts from),
    plus the chars-per-token compression ratio."""
    d = _t(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    ws = F.size(F.split("text", " ")).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).cast("long")
    n_chars = F.length("text").cast("long")
    return d.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        n_chars.alias("n_chars"),
        F.round(
            F.when(bpe > 0, n_chars.cast("double") / bpe.cast("double")), 6
        ).alias("chars_per_token"),
    )


T4_SQL = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(CAST(length(text) AS DOUBLE)
             / NULLIF(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS DOUBLE), 0), 6)
         AS chars_per_token
FROM documents
"""


def t5_repetition_ratio(spark, sf_dir):
    """Duplicate-bigram fraction per document — the within-document
    repetition signal Gopher-style quality filters use (a high
    duplicate-n-gram share marks boilerplate/spam). Pure array
    expressions: bigrams via slice+zip_with (no array indexing, so
    ANSI-safe for 1-token docs where ``slice(toks, 1, 0)`` is empty),
    dup fraction = 1 - distinct/total. Reference parity: the quality
    gates of the reference are exact set-membership checks
    (load_stops_to_db.py:73-81); this is the scale analogue over text.
    100-TB shape: per-row computation only — no shuffle, no join;
    whole-stage-codegen'd."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    nb = F.size(bi).cast("long")
    nu = F.size(F.array_distinct(bi)).cast("long")
    return d.select(
        "doc_id",
        nb.alias("n_bigrams"),
        nu.alias("n_uniq_bigrams"),
        F.when(nb > 0, F.round(F.lit(1.0) - nu.cast("double") / nb.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


T5_SQL = """
WITH b AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
         ) AS bi
  FROM documents
)
SELECT doc_id,
       CAST(len(bi) AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(bi)) AS BIGINT) AS n_uniq_bigrams,
       CASE WHEN len(bi) > 0
            THEN round(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE)
                             / CAST(len(bi) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_bigram_frac
FROM b
"""


def t6_token_dominance(spark, sf_dir):
    """Top-token dominance per document (most frequent token's share of
    all tokens) — the single-token-dominance quality signal; high
    dominance marks degenerate/repetitive text. Relational formulation
    on purpose: explode → partial-agg count → top-1 window, the shape
    that scales to 100 TB (the count groupBy is map-side combined on
    (doc_id, tok); the window partitions by doc_id only after the
    counts collapsed to ~vocab-size rows per doc). Ties break to the
    lexicographically smallest token so the result is deterministic."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.explode(toks).alias("tok"),
    )
    cnt = base.groupBy("doc_id", "n_tokens", "tok").agg(
        F.count(F.lit(1)).alias("top_count")
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("top_count").desc(), F.col("tok").asc()
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_token"),
            "top_count",
            "n_tokens",
            F.round(
                F.col("top_count").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("dominance"),
        )
    )


T6_SQL = """
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
cnt AS (
  SELECT doc_id, n_tokens, tok, count(*) AS top_count
  FROM toks GROUP BY doc_id, n_tokens, tok
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY top_count DESC, tok ASC) AS rn
  FROM cnt
)
SELECT doc_id, tok AS top_token, top_count, n_tokens,
       round(CAST(top_count AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS dominance
FROM r WHERE rn = 1
"""


def x1_multimodal_features(spark, sf_dir):
    """Binary-column decode/featurize plumbing via Arrow mapInPandas.
    The decode is a deterministic stand-in (no codec libs in this
    container), but the whole pipeline — binary payload column, Arrow
    batch iteration, per-batch python work, typed output schema — runs
    for real, and because the payload is the documents' UTF-8 bytes and
    the checksum is sha256, DuckDB can recompute every output cell."""
    from ..operators import multimodal

    media = multimodal.media_from_documents(spark, sf_dir)
    return multimodal.decode_and_featurize(media).select(
        "media_id", "kind", "n_bytes", "payload_sha"
    )


X1_SQL = """
SELECT
  doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT)
    WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes,
  substr(sha256(text), 1, 16) AS payload_sha
FROM documents
"""


def c1_decontamination(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 97 == 0 play the
    held-out benchmark; every other doc is scored by how many of its
    distinct 5-gram shingles appear anywhere in the benchmark set and
    flagged at >=20% overlap (the GPT-3-style n-gram decontamination
    gate). The benchmark shingle set is broadcast — at 100 TB the
    eval side stays bounded while training data grows, so this is the
    structurally correct join. Corpus guarantee used: driver docs have
    >=10 tokens, so every 5-gram shingle is full-width and the Spark
    concat_ws / DuckDB || forms agree (no null-component divergence).
    Reference parity: exact set-membership gate of
    load_stops_to_db.py:73-81 lifted to n-gram granularity."""
    from ..operators.curation import decontaminate

    d = _t(spark, sf_dir, "documents")
    return decontaminate(
        d, F.col("doc_id") % 97 == 0, shingle_k=5, flag_frac=0.2
    )


C1_SQL = """
WITH sh AS (
  SELECT doc_id, doc_id % 97 = 0 AS is_bench,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2] || ' '
                || string_split(text,' ')[i+3] || ' ' || string_split(text,' ')[i+4]
         )) AS sh
  FROM documents
),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE is_bench),
train AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh
          FROM sh WHERE NOT is_bench),
hits AS (
  SELECT t.doc_id, count(*) AS n_overlap
  FROM (SELECT doc_id, unnest(sh) AS s FROM train) t
  JOIN bench USING (s)
  GROUP BY t.doc_id
)
SELECT tr.doc_id, tr.n_shingles,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CAST(coalesce(h.n_overlap, 0) AS DOUBLE)
             / CAST(tr.n_shingles AS DOUBLE), 6) AS contamination_frac,
       CAST(CAST(coalesce(h.n_overlap, 0) AS DOUBLE)
            / CAST(tr.n_shingles AS DOUBLE) >= 0.2 AS BIGINT) AS contaminated
FROM train tr LEFT JOIN hits h USING (doc_id)
"""


def v1_bpe_pair_mining(spark, sf_dir):
    """Top-50 corpus-wide adjacent-token pairs — the first
    merge-candidate table a BPE tokenizer trainer computes. Bigrams
    keep duplicates (frequency mining, not dedup shingling); ties
    break lexicographically so the top-k is a total order. 100-TB
    shape: map-side-combined groupBy + TakeOrdered, no global sort."""
    from ..operators.curation import bpe_pair_counts

    d = _t(spark, sf_dir, "documents")
    return bpe_pair_counts(d, top_k=50)


V1_SQL = """
WITH b AS (
  SELECT list_transform(
           generate_series(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
         ) AS bi
  FROM documents
)
SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
FROM (SELECT unnest(bi) AS pair FROM b)
GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT 50
"""


def t8_stratified_sample(spark, sf_dir):
    """Deterministic per-language sampling: keep 50% of 'en' docs and
    80% of every other language, selected by an LCG hash of doc_id
    shared verbatim with the oracle — reproducible across engines and
    re-runs, which random() sampling is not (the property a resumable
    curation pipeline needs). Pure per-row filter: no shuffle, and the
    bucket expression stays inside whole-stage codegen."""
    from ..operators.curation import stratified_hash_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_hash_sample(d, {"en": 50}, default_rate=80).select(
        "doc_id", "lang", "sample_bucket"
    )


T8_SQL = """
SELECT doc_id, lang,
       CAST((doc_id * 1103515245 + 12345) % 2147483648 % 100 AS BIGINT)
         AS sample_bucket
FROM documents
WHERE (doc_id * 1103515245 + 12345) % 2147483648 % 100
      < CASE WHEN lang = 'en' THEN 50 ELSE 80 END
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


def e3_kmeans_step(spark, sf_dir):
    """One k-means Lloyd iteration over the embeddings table: assign
    every vector to its nearest of 8 shared-literal centroids (the
    same deterministic centroids e2's IVF uses), then recompute each
    centroid as the per-dimension mean of its members — the iterative
    clustering kernel (vector-quantization codebook training) that
    sits under IVF index builds. Long format (cluster_id, dim, mean)
    keeps the output SQL-comparable without array-representation
    hazards. Cross-row float sums are NOT reproducible across engines
    (accumulation order), so components are summed as DECIMAL(27,15)
    — exact and order-independent — and divided in double at the
    boundary. 100-TB shape: posexplode fans out 64× but the groupBy
    on (cluster, dim) is map-side combined down to 8×64 rows; the
    driver-side loop an iterative k-means adds is bounded by
    iterations, not data."""
    from ..operators import similarity

    em = _t(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(64, n_centroids=8)
    assigned = em.select(
        similarity.assign_centroid("embedding", cents).cast("long").alias("cluster_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    comp = assigned.select(
        "cluster_id", F.posexplode("v").alias("dim0", "comp")
    ).select(
        "cluster_id",
        (F.col("dim0") + 1).cast("long").alias("dim"),
        F.col("comp").cast("decimal(27,15)").alias("comp"),
    )
    return comp.groupBy("cluster_id", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum("comp").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("centroid_val"),
    )


def _build_e3_sql(dim: int = 64, n_centroids: int = 8) -> str:
    """Lloyd-step oracle sharing e2's centroid literals verbatim."""
    from ..operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_centroids=n_centroids)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    return f"""
WITH cents(cid, c) AS (VALUES
    {cent_rows}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
assigned AS (
  SELECT vec_id, v, cid,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_sum(list_transform(generate_series(1, len(v)),
                             i -> v[i] * c[i])) DESC, cid
         ) AS rn
  FROM emb CROSS JOIN cents
),
comp AS (
  SELECT CAST(cid AS BIGINT) AS cluster_id,
         CAST(unnest(generate_series(1, len(v))) AS BIGINT) AS dim,
         CAST(unnest(v) AS DECIMAL(27,15)) AS comp
  FROM assigned WHERE rn = 1
)
SELECT cluster_id, dim, COUNT(*) AS n_members,
       round(CAST(SUM(comp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS centroid_val
FROM comp GROUP BY 1, 2
"""


E3_SQL = _build_e3_sql()


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


def m2_render_transcripts(spark, sf_dir):
    """Render each CDC-materialized conversation (m1's final state) as
    a single ordered training-export string — the stable-turn-ordering
    per-turn-equality invariant of the north rule expressed as a query.
    collect_list carries NO ordering guarantee in a distributed run, so
    the collected structs are sort_array'd by the leading turn key
    before rendering; the oracle uses string_agg(... ORDER BY turn).
    100-TB shape: ONE exchange total — the final state is
    pre-partitioned on user_id (HashPartitioning(user_id) satisfies
    the LWW window's ClusteredDistribution(user_id, turn) by the
    subset rule), so the per-user render aggregation reuses the same
    shuffle instead of adding a second; plan-test-pinned."""
    final = _cdc_final_state(_t(spark, sf_dir, "events"), pre_partition=True)
    lines = F.transform(
        F.sort_array(F.collect_list(F.struct("turn", "event_type"))),
        lambda s: F.concat_ws(":", s["turn"].cast("string"), s["event_type"]),
    )
    return final.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.concat_ws(" | ", lines).alias("transcript"),
    )


M2_SQL = """
WITH final AS (
  SELECT user_id, turn, event_type FROM (
    SELECT user_id, turn, op, event_type,
           row_number() OVER (PARTITION BY user_id, turn
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM (
      SELECT user_id,
             CAST(json_extract_string(props, '$.k') AS INT) % 16 AS turn,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
             ts, event_id, event_type
      FROM events
    )
  ) WHERE rn = 1 AND op <> 'delete'
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
       string_agg(CAST(turn AS VARCHAR) || ':' || event_type, ' | '
                  ORDER BY turn) AS transcript
FROM final GROUP BY user_id
"""


def c2_token_chunking(spark, sf_dir):
    """Fixed-size token chunking: split every document into 32-token
    training windows (the sequence-packing precursor — fixed-width
    chunks are what a packing stage consumes). Pure array expressions:
    a sequence of chunk indices exploded per document, each chunk
    sliced from the ONE materialized token array — no re-split per
    chunk, no shuffle at all (per-row fan-out only; at 100 TB the
    chunker is a map-side stage of the tokenize pipeline)."""
    d = _t(spark, sf_dir, "documents")
    size = 32
    base = d.select("doc_id", F.split("text", " ").alias("toks"))
    n = F.size("toks")
    idx = F.sequence(F.lit(0), F.floor((n - 1) / F.lit(size)).cast("int"))
    chunked = base.select(
        "doc_id", "toks", F.explode(idx).alias("chunk_idx")
    )
    chunk = F.slice("toks", F.col("chunk_idx") * size + 1, size)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
    )


C2_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, (len(toks) - 1) // 32)) AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 32], ' ')
         AS chunk_text,
       CAST(len(toks[chunk_idx * 32 + 1 : chunk_idx * 32 + 32]) AS BIGINT)
         AS n_chunk_tokens
FROM c
"""


def c3_quality_filter(spark, sf_dir):
    """The curation DECISION gate (distinct from t1's scoring): apply
    Gopher-style per-row quality thresholds and emit keep/drop with the
    failed checks as an ordered reasons string — a training pipeline
    keeps the drop ledger, not just the survivors (the reference's
    validity gates likewise record why a date was skipped,
    idempotent_process.py:94-104). All signals are per-row array
    expressions (no shuffle): token-count range, unique-token ratio,
    duplicate-bigram fraction, mean token length."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks).cast("long")
    uniq = F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    nb = (n - 1).cast("long")
    bi = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, F.lit(2), F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dupbi = F.lit(1.0) - F.size(F.array_distinct(bi)).cast("double") / nb.cast("double")
    mean_len = (F.length("text") - n + 1).cast("double") / n.cast("double")
    checks = [
        ("too_short", n < 20),
        ("too_long", n > 90),
        ("low_uniq", uniq < 0.55),
        ("repetitive", dupbi > 0.35),
        ("token_len", (mean_len < 2.0) | (mean_len > 8.0)),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in checks]
    )
    return d.select(
        "doc_id",
        (reasons == "").cast("long").alias("keep"),
        reasons.alias("reasons"),
    )


C3_SQL = """
WITH s AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n,
         CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
           AS uniq,
         1.0 - CAST(len(list_distinct(bi)) AS DOUBLE)
               / CAST(len(toks) - 1 AS DOUBLE) AS dupbi,
         CAST(length(text) - len(toks) + 1 AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS mean_len
  FROM (
    SELECT doc_id, text, string_split(text, ' ') AS toks,
           list_transform(
             generate_series(1, len(string_split(text,' ')) - 1),
             i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
           ) AS bi
    FROM documents
  )
)
SELECT doc_id,
       CAST(reasons = '' AS BIGINT) AS keep,
       reasons
FROM (
  SELECT doc_id,
         concat_ws(',',
           CASE WHEN n < 20 THEN 'too_short' END,
           CASE WHEN n > 90 THEN 'too_long' END,
           CASE WHEN uniq < 0.55 THEN 'low_uniq' END,
           CASE WHEN dupbi > 0.35 THEN 'repetitive' END,
           CASE WHEN mean_len < 2.0 OR mean_len > 8.0 THEN 'token_len' END
         ) AS reasons
  FROM s
)
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


def m3_snapshot_diff(spark, sf_dir):
    """Reverse CDC / snapshot reconciliation: diff two materialized
    snapshots of the keyed state (as of a cutoff vs current) back into
    a minimal change feed — insert / update / delete per key. The dual
    of the merge kernel: merge folds events into state, this recovers
    the net events between two states (what a reconciliation or
    downstream re-sync job emits; reference analogue: comparing
    yesterday's loaded date against today's re-download,
    idempotent_process.py:94-104).

    Scale shape: each snapshot's LWW window hash-partitions on the full
    key (user_id, turn) and the FULL OUTER join joins on exactly those
    keys, so the join reuses the windows' output partitioning — no
    third shuffle. At 100 TB the two snapshots are key-bucketed stored
    tables and the whole diff runs shuffle-free on bucketed reads."""
    cutoff = "2024-01-16 00:00:00"
    ev = _t(spark, sf_dir, "events")

    def snap(src):
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

    # both snapshots share the events scan lineage, so each side's
    # columns are renamed before the join (self-join disambiguation)
    a = snap(ev.where(F.col("ts") < cutoff)).select(
        F.col("user_id").alias("a_user_id"),
        F.col("turn").alias("a_turn"),
        F.col("event_id").alias("old_event_id"),
    )
    b = snap(ev).select(
        F.col("user_id").alias("b_user_id"),
        F.col("turn").alias("b_turn"),
        F.col("event_id").alias("new_event_id"),
    )
    j = a.join(
        b,
        (F.col("a_user_id") == F.col("b_user_id"))
        & (F.col("a_turn") == F.col("b_turn")),
        "full_outer",
    )
    change = (
        F.when(F.col("old_event_id").isNull(), "insert")
        .when(F.col("new_event_id").isNull(), "delete")
        .when(F.col("old_event_id") != F.col("new_event_id"), "update")
    )
    return (
        j.select(
            F.coalesce("a_user_id", "b_user_id").alias("user_id"),
            F.coalesce("a_turn", "b_turn").alias("turn"),
            change.alias("change_op"),
            "new_event_id",
            "old_event_id",
        )
        .where(F.col("change_op").isNotNull())
    )


M3_SQL = """
WITH src AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INT) % 16 AS turn,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         ts, event_id
  FROM events
), snap_b AS (
  SELECT user_id, turn, event_id FROM (
    SELECT user_id, turn, op, event_id,
           row_number() OVER (PARTITION BY user_id, turn
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM src
  ) WHERE rn = 1 AND op <> 'delete'
), snap_a AS (
  SELECT user_id, turn, event_id FROM (
    SELECT user_id, turn, op, event_id,
           row_number() OVER (PARTITION BY user_id, turn
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM src WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
  ) WHERE rn = 1 AND op <> 'delete'
)
SELECT user_id, turn, change_op, new_event_id, old_event_id FROM (
  SELECT COALESCE(a.user_id, b.user_id) AS user_id,
         COALESCE(a.turn, b.turn) AS turn,
         CASE WHEN a.event_id IS NULL THEN 'insert'
              WHEN b.event_id IS NULL THEN 'delete'
              WHEN a.event_id <> b.event_id THEN 'update' END AS change_op,
         b.event_id AS new_event_id,
         a.event_id AS old_event_id
  FROM snap_a a FULL OUTER JOIN snap_b b
    ON a.user_id = b.user_id AND a.turn = b.turn
) WHERE change_op IS NOT NULL
"""


def m4_scd2_history(spark, sf_dir):
    """SCD Type-2 version history from the change feed: instead of the
    merge kernel's final state (m1), materialize EVERY version of every
    key with its validity interval — ``valid_from`` = the event's ts,
    ``valid_to`` = the next change's ts (a later upsert OR a delete
    both close the version; null = still current). The other canonical
    lakehouse CDC sink shape next to last-writer-wins upsert: auditable
    history instead of point-in-time state.

    100-TB shape: one exchange — the lead() window partitions on the
    full key; the upsert filter runs after lead so deletes terminate
    versions without surviving as rows. Total order inside a key is
    (ts, event_id), the same LWW tie-break the merge kernel uses."""
    ev = _t(spark, sf_dir, "events")
    turn = F.pmod(
        F.get_json_object("props", "$.k").cast("int"), F.lit(16)
    ).alias("turn")
    op = F.when(F.col("event_type") == "error", "delete").otherwise("upsert")
    src = ev.select("user_id", turn, op.alias("op"), "ts", "event_id")
    w = W.partitionBy("user_id", "turn").orderBy("ts", "event_id")
    versions = src.withColumn("valid_to", F.lead("ts").over(w))
    return versions.where(F.col("op") == "upsert").select(
        "user_id",
        "turn",
        "event_id",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().cast("long").alias("is_current"),
    )


M4_SQL = """
SELECT user_id, turn, event_id, valid_from, valid_to,
       CAST(valid_to IS NULL AS BIGINT) AS is_current
FROM (
  SELECT user_id, turn, op, event_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id, turn
                        ORDER BY ts, event_id) AS valid_to
  FROM (
    SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS INT) % 16 AS turn,
           CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
           ts, event_id
    FROM events
  )
) WHERE op = 'upsert'
"""


def c4_pii_scrub(spark, sf_dir):
    """PII redaction curation op: replace emails, IPv4 addresses and
    phone-shaped numbers with typed placeholders, and emit the per-doc
    match counts (the redaction ledger a compliance pipeline keeps).
    The synthetic corpus carries no PII, so deterministic PII is
    injected from the doc's own columns FIRST — in both engines
    identically — making every regex exercise real matches instead of
    vacuously hashing unchanged text.

    100-TB shape: per-row regexp only — no shuffle, no join, whole-stage
    codegen; the patterns are shared verbatim with the oracle (ASCII
    classes + word boundaries, identical semantics in Java regex and
    RE2)."""
    d = _t(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\b\d{3}-\d{4}\b"
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(injected, email, "<EMAIL>"), ipv4, "<IP>"
        ),
        phone,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(injected, F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(injected, F.lit(ipv4)).cast("long").alias("n_ips"),
        F.regexp_count(injected, F.lit(phone)).cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


C4_SQL = r"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
              || '.0.' || CAST(doc_id % 250 AS VARCHAR)
              || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
         '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS scrubbed
FROM inj
"""


def c5_domain_rebalance(spark, sf_dir):
    """Target-mix corpus rebalancing (domain/language reweighting):
    deterministic per-language downsampling so the kept mix is
    proportional to the target shares, with the binding language kept
    whole (operators/curation.py:domain_rebalance). Rates derive from
    the observed counts; row choice is the shared-LCG bucket at 2^20
    granularity, both identical in the oracle. The corpus is never
    shuffled — the ~|langs|-row rate table broadcasts."""
    from ..operators.curation import domain_rebalance

    targets = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    d = _t(spark, sf_dir, "documents")
    return domain_rebalance(d, targets).select("doc_id", "lang")


C5_SQL = """
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY 1
), t AS (
  SELECT lang, n,
         CASE lang WHEN 'de' THEN 0.15 WHEN 'en' THEN 0.4
                   WHEN 'es' THEN 0.15 WHEN 'fr' THEN 0.15
                   WHEN 'zh' THEN 0.15 END AS tgt
  FROM counts
), r AS (
  SELECT lang,
         CAST(FLOOR(MIN(n / tgt) OVER () * tgt / n * 1048576) AS BIGINT)
           AS thr
  FROM t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE (d.doc_id * 1103515245 + 12345) % 2147483648 % 1048576 < r.thr
"""


def v2_sequence_packing(spark, sf_dir):
    """Sequence packing for training export: pack documents, in a
    deterministic per-shard order, into fixed token-budget training
    sequences (contiguous first-fit — a doc starts in the sequence
    where its shard-local running token count begins). Emits the pack
    manifest per (shard, seq): doc count, token sum, first/last doc.

    100-TB shape: ONE shuffle total — the running-sum window partitions
    on shard, and the (shard, seq_id) aggregation's clustering is
    satisfied by HashPartitioning(shard) (subset rule), so the groupBy
    reuses the window's exchange. Production shards number in the
    thousands, so the window never sees unbounded partitions."""
    budget = 512
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = s.withColumn("cum", F.sum("n_tokens").over(w))
    packed = c.withColumn(
        "seq_id",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(budget)).cast("long"),
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


V2_SQL = """
WITH s AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT shard, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM s
)
SELECT shard, CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c GROUP BY 1, 2
"""


def t9_tfidf(spark, sf_dir):
    """Corpus-level TF-IDF term mining: document frequency + total term
    frequency per token, idf-weighted, top 100 terms. The classic
    two-level aggregation: explode → per-(doc, token) partial count →
    per-token (df, tf) rollup — both map-side combined — then a
    TakeOrdered top-k; the corpus size N enters as one scalar.

    100-TB shape: the explode never materializes (pipelined into the
    partial agg); two key shuffles (token,doc)→(token); top-k is
    TakeOrdered, never a global sort. idf rounded to 6dp on both sides
    (the shared-double rule, module docstring)."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()  # one scalar job, mirrored by the oracle's COUNT(*)
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    per_tok = per_doc.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    idf = F.round(F.log(F.lit(float(n_docs)) / F.col("df").cast("double")), 6)
    weighted = per_tok.select(
        "token",
        "df",
        "total_tf",
        idf.alias("idf"),
        F.round(F.col("total_tf").cast("double") * idf, 6).alias("weight"),
    )
    return weighted.orderBy(F.col("weight").desc(), "token").limit(100)


T9_SQL = """
WITH per_doc AS (
  SELECT token, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY 1, 2
), per_tok AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM(tf) AS BIGINT) AS total_tf
  FROM per_doc GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)
SELECT token, df, total_tf,
       round(ln(n_docs / CAST(df AS DOUBLE)), 6) AS idf,
       round(CAST(total_tf AS DOUBLE)
             * round(ln(n_docs / CAST(df AS DOUBLE)), 6), 6) AS weight
FROM per_tok, n
ORDER BY weight DESC, token
LIMIT 100
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


def w8_ntile_deciles(spark, sf_dir):
    """ntile(10) quantile bucketing over a total order — the windowed
    quantile assignment a curation pipeline uses to split a corpus
    into equal-count quality tiers. The ORDER BY is made total with the
    key tie-break (ties would otherwise make ntile nondeterministic).
    Scale note, stated honestly: a global ntile window plans as a
    single-partition sort — correct but a deliberate scale smell; the
    100-TB path is two-phase (sample approximate decile boundaries,
    then a map-side bucket assignment — t8's stratified-sample shape).
    This entry exists for the operator's semantics; the aggregation
    after it reduces the single-partition output immediately."""
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


def d7_edit_distance_near_dups(spark, sf_dir):
    """Prefix-blocked Levenshtein near-dup pairs: block documents on
    their lowercased 16-char prefix, compare only within blocks, keep
    pairs whose 80-char-prefix edit distance is ≤ 20. Levenshtein is a
    JVM built-in on both engines (identical unit-cost
    insert/delete/substitute semantics), so unlike d3/d4's hash-based
    candidates the oracle shares the EXACT same blocking expression —
    the match is contract, not luck. Blocking recall disclosure (same
    family as d3/d4): a near-dup pair whose edits fall inside the
    first 16 chars lands in different blocks and is out of scope for
    both engines by construction. Scale shape: equi-join on the block
    key, never all-pairs; the O(80×80) DP residual runs only on
    in-block candidates."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 80).alias("head"),
        F.lower(F.substring("text", 1, 16)).alias("blk"),
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("head").alias("head_a"),
        "blk",
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("head").alias("head_b"),
        F.col("blk").alias("blk_b"),
    )
    return (
        a.join(b, (a.blk == b.blk_b) & (a.doc_a < b.doc_b))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("head_a", "head_b").cast("bigint").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 20)
    )


D7_SQL = """
WITH b AS (
  SELECT doc_id, substring(text, 1, 80) AS head,
         lower(substring(text, 1, 16)) AS blk
  FROM documents
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(levenshtein(a.head, c.head) AS BIGINT) AS edit_dist
FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
WHERE levenshtein(a.head, c.head) <= 20
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


def t10_type_token_ratio(spark, sf_dir):
    """Lexical-diversity scoring: per-document type count, hapax count
    (tokens occurring exactly once), and type-token ratio — the cheap
    repetitiveness signal a corpus-quality pass computes next to t5's
    repetition ratio. Two-level aggregation like t9: explode →
    per-(doc, token) count → per-doc rollup, both map-side combined;
    the explode never materializes. TTR divides two small exact
    integers (identical IEEE result in both engines, module
    docstring)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    per_tok = tok.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.round(
            F.count("*").cast("double") / F.sum("cnt").cast("double"), 6
        ).alias("ttr"),
    )


T10_SQL = """
WITH per_tok AS (
  SELECT doc_id, token, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS ttr
FROM per_tok
GROUP BY doc_id
"""


def t11_bigram_topk(spark, sf_dir):
    """Corpus-wide top-100 word bigrams — the n-gram census used for
    contamination screens and BPE-adjacent vocabulary work (v1 mines
    the single best pair; this ranks the distribution's head). The
    bigram array is built with an expression-only transform over the
    token array (no UDF, no self-join on position), exploded straight
    into a map-side-combined count; top-k is TakeOrdered with the
    bigram tie-break, never a global sort.

    The size()<2 guard matters: Spark's sequence(2, size) generates a
    DESCENDING [2,1] when size=1 (auto step -1), which would fabricate
    a reversed pseudo-bigram instead of an empty list."""
    d = _t(spark, sf_dir, "documents")
    bigrams = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) < 2 THEN array() "
                "ELSE transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat_ws(' ', element_at(split(text, ' '), i), "
                "element_at(split(text, ' '), i + 1))) END"
            )
        ).alias("bigram")
    )
    counted = bigrams.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counted.orderBy(F.col("n").desc(), "bigram").limit(100)


T11_SQL = """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT unnest(list_transform(range(2, len(t) + 1),
                               i -> t[i - 1] || ' ' || t[i])) AS bigram
  FROM toks
)
SELECT bigram, COUNT(*) AS n
FROM grams
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 100
"""


def d8_dup_passage_fraction(spark, sf_dir):
    """Cross-corpus duplicated-passage fraction — the sub-document
    dedup signal (RefinedWeb/CCNet's duplicated-n-gram-fraction
    family): chunk each document's token stream into fixed 16-token
    passages (c2's chunking shape), count each passage corpus-wide,
    and report per document the fraction of its passages that occur in
    more than one document. t5 measures repetition WITHIN a document;
    this measures duplication ACROSS the corpus — the signal that
    catches boilerplate and template spam exact dedup (d1, whole-doc
    hash) misses.

    Scale shape: passages shuffle as md5 digests (32-byte fixed keys,
    never the passage text — both engines compute identical md5 hex so
    the compaction is contract, not a recall trade); corpus counts are
    map-side combined; the count⋈passage join is an equi-join on the
    digest; the final per-doc rollup reuses nothing exotic. Passages
    counted per DISTINCT containing doc (a passage repeated inside one
    doc only is t5's business, not d8's)."""
    d = _t(spark, sf_dir, "documents")
    passages = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(split(text, ' ')) / 16.0) "
                "AS INT) - 1), "
                "i -> md5(concat_ws(' ', slice(split(text, ' '), i * 16 + 1, 16))))"
            )
        ).alias("psg"),
    )
    # one row per (passage, containing doc): in-doc repeats collapse
    per_doc_psg = passages.groupBy("psg", "doc_id").agg(
        F.count(F.lit(1)).alias("_n")
    ).drop("_n")
    corpus = per_doc_psg.groupBy("psg").agg(
        F.count(F.lit(1)).alias("n_docs_with")
    )
    marked = per_doc_psg.join(corpus, "psg")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_passages"),
        F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup"),
        F.round(
            F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


D8_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
psgs AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(list_slice(t, i * 16 + 1, i * 16 + 16), ' ')) AS psg
  FROM toks, unnest(range(0, CAST(ceil(len(t) / 16.0) AS BIGINT))) AS u(i)
), corpus AS (
  SELECT psg, COUNT(*) AS n_docs_with FROM psgs GROUP BY psg
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_passages,
       CAST(SUM(CASE WHEN c.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(CAST(SUM(CASE WHEN c.n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
FROM psgs p JOIN corpus c USING (psg)
GROUP BY p.doc_id
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


def m5_changelog_compaction(spark, sf_dir):
    """Net-effect changelog compaction — the Debezium/Kafka-compaction
    shape a CDC relay applies before handing a batch downstream: per
    key, collapse the event run into ONE net operation determined by
    the first and last events (insert→…→delete ⇒ nothing happened;
    insert→…→update ⇒ net insert with the final payload;
    update→…→delete ⇒ net delete; update→…→update ⇒ net update).
    Complements m1 (which materializes final STATE): m5 emits the
    minimal downstream CHANGE set. Op classes derive from event_type
    ('purchase' ⇒ insert, 'error' ⇒ delete, else update) on the same
    (user_id, turn) keys as m1.

    100-TB shape: one shuffle — first and last are taken in a single
    window pass (rn from both ends over one ordering), and the rollup
    reuses the same (user_id, turn)-compatible clustering. 'none' rows
    stay in the output with their event counts so compaction coverage
    is visible (a silent drop would hide feed bugs)."""
    ev = _t(spark, sf_dir, "events")
    turn = F.pmod(F.get_json_object("props", "$.k").cast("int"), F.lit(16)).alias("turn")
    op = (
        F.when(F.col("event_type") == "error", "delete")
        .when(F.col("event_type") == "purchase", "insert")
        .otherwise("update")
        .alias("op")
    )
    src = ev.select("user_id", turn, op, "ts", "event_id", "value")
    w_asc = W.partitionBy("user_id", "turn").orderBy("ts", "event_id")
    w_desc = W.partitionBy("user_id", "turn").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = src.select(
        "user_id",
        "turn",
        "op",
        "value",
        F.row_number().over(w_asc).alias("rn_first"),
        F.row_number().over(w_desc).alias("rn_last"),
    )
    per_key = marked.groupBy("user_id", "turn").agg(
        F.max(F.when(F.col("rn_first") == 1, F.col("op"))).alias("first_op"),
        F.max(F.when(F.col("rn_last") == 1, F.col("op"))).alias("last_op"),
        F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("last_value"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    net = (
        F.when((F.col("first_op") == "insert") & (F.col("last_op") == "delete"), "none")
        .when(F.col("last_op") == "delete", "delete")
        .when(F.col("first_op") == "insert", "insert")
        .otherwise("update")
    )
    return per_key.select(
        "user_id",
        "turn",
        net.alias("net_op"),
        F.when(net != "delete", F.col("last_value")).alias("net_value"),
        "n_events",
    )


M5_SQL = """
WITH src AS (
  SELECT user_id,
         CAST(json_extract_string(props, '$.k') AS INT) % 16 AS turn,
         CASE WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'insert'
              ELSE 'update' END AS op,
         ts, event_id, value
  FROM events
), marked AS (
  SELECT user_id, turn, op, value,
         row_number() OVER (PARTITION BY user_id, turn
                            ORDER BY ts, event_id) AS rn_first,
         row_number() OVER (PARTITION BY user_id, turn
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM src
), per_key AS (
  SELECT user_id, turn,
         MAX(CASE WHEN rn_first = 1 THEN op END) AS first_op,
         MAX(CASE WHEN rn_last = 1 THEN op END) AS last_op,
         MAX(CASE WHEN rn_last = 1 THEN value END) AS last_value,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM marked GROUP BY 1, 2
)
, netted AS (
  SELECT user_id, turn,
         CASE WHEN first_op = 'insert' AND last_op = 'delete' THEN 'none'
              WHEN last_op = 'delete' THEN 'delete'
              WHEN first_op = 'insert' THEN 'insert'
              ELSE 'update' END AS net_op,
         last_value, n_events
  FROM per_key
)
SELECT user_id, turn, net_op,
       CASE WHEN net_op <> 'delete' THEN last_value END AS net_value,
       n_events
FROM netted
"""


def m7_incremental_view_maintenance(spark, sf_dir):
    """Retraction-aware incremental aggregate maintenance
    (operators/ivm.py): the stored view is per-user (count, sum of
    value) over the base partition of events (event_id % 10 != 0); the
    change batch is the other 10%, with 'error' events as signed
    retractions (-1 count, -value sum). The engine aggregates ONLY the
    delta and folds it into the view state — O(|delta| + |groups|),
    never a base rescan — and drops groups whose maintained count
    reaches 0. The oracle is the defining IVM equivalence: a full
    recompute over the signed union of base + delta.

    Reference analogue: the stats dicts rebuilt by reprocessing the
    whole day whenever anything changes (load_stops_to_db.py:25,51-63;
    rollup idempotent_process.py:34-54) — this is the no-rescan form.
    100-TB shape: delta agg is one map-combined keys+longs shuffle over
    the delta; the fold unions two already-aggregated frames (|groups|
    rows). MIN/MAX are deliberately not offered — not self-maintainable
    under deletes (see the module docstring)."""
    from ..operators import ivm

    ev = _t(spark, sf_dir, "events")
    is_delta = F.pmod("event_id", F.lit(10)) == 0
    val = F.col("value").cast("decimal(18,4)")
    state = (
        ev.where(~is_delta)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias(ivm.N_COL),
            F.sum(val).cast("decimal(28,4)").alias(ivm.SUM_COL),
        )
    )
    delta = ivm.delta_state(
        ev.where(is_delta), ["user_id"], val, F.col("event_type") == "error"
    )
    out = ivm.maintain(state, delta, ["user_id"])
    return out.select(
        "user_id",
        ivm.N_COL,
        F.col(ivm.SUM_COL).cast("double").alias(ivm.SUM_COL),
    )


M7_SQL = """
WITH signed AS (
  SELECT user_id,
         CASE WHEN event_id % 10 = 0 AND event_type = 'error'
              THEN -1 ELSE 1 END AS sgn,
         CAST(value AS DECIMAL(18,4)) AS v
  FROM events
)
SELECT user_id,
       CAST(SUM(sgn) AS BIGINT) AS n_rows,
       CAST(SUM(sgn * v) AS DOUBLE) AS sum_value
FROM signed
GROUP BY user_id
HAVING SUM(sgn) > 0
"""


def e4_knn_graph(spark, sf_dir):
    """Batch kNN graph (operators/similarity.py:knn_graph): top-3
    cosine neighbors for EVERY vector under the same IVF multi-probe
    candidate contract as d6/e2 — shared-bucket equi-join candidates,
    exact-cosine per-source top-k via a window rank, centroid literals
    and top-2 assignment shared verbatim with the oracle. e1/e2 answer
    one query vector; e4 is the all-corpus graph embedding dedup and
    diversity sampling consume."""
    from ..operators import similarity

    em = _t(spark, sf_dir, "embeddings")
    return similarity.knn_graph(em, k=3, n_probe=2)


def _build_e4_sql(
    dim: int = 64, n_centroids: int = 8, k: int = 3, n_probe: int = 2
) -> str:
    from ..operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_centroids=n_centroids)
    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(cents)
    )
    cos = (
        "list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))"
        " / (sqrt(list_sum(list_transform(a.v, x -> x * x)))"
        " * sqrt(list_sum(list_transform(b.v, x -> x * x))))"
    )
    return f"""
WITH cents(cid, c) AS (VALUES
    {cent_rows}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
assigned AS (
  SELECT vec_id, v, cid,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_sum(list_transform(generate_series(1, len(v)),
                             i -> v[i] * c[i])) DESC, cid
         ) AS rn
  FROM emb CROSS JOIN cents
),
asg AS (SELECT vec_id, v, cid FROM assigned WHERE rn <= {n_probe}),
cand AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst, {cos} AS _cos
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT src, dst, _cos,
         CAST(row_number() OVER (PARTITION BY src ORDER BY _cos DESC, dst)
              AS BIGINT) AS rank
  FROM cand
)
SELECT src, dst, rank, round(_cos, 6) AS cos_sim
FROM ranked WHERE rank <= {k}
"""


E4_SQL = _build_e4_sql()


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


def t12_length_histogram(spark, sf_dir):
    """Fixed-width histogram of document lengths — the first profile a
    corpus curation pass draws (truncation cliffs, boilerplate spikes).
    Bucketing uses INTEGER division (DIV / //), never float divide+
    floor, so bucket edges are exact in both engines. One partial-
    aggregated shuffle keyed by ~hundreds of buckets; at 100 TB the
    combine step collapses each scan partition to |buckets| rows
    before the exchange."""
    docs = _t(spark, sf_dir, "documents")
    bucket_lo = (F.expr("n_chars DIV 500") * 500).cast("bigint")
    return (
        docs.groupBy(bucket_lo.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


T12_SQL = """
SELECT CAST((n_chars // 500) * 500 AS BIGINT) AS bucket_lo,
       COUNT(*) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY 1
"""


def v3_split_assignment(spark, sf_dir):
    """Deterministic content-hash train/val/test split — the
    reproducibility contract a training pipeline needs: a document
    lands in the same split on every run, on every engine, regardless
    of row order or partitioning, because the split key is
    md5(text) (first 8 hex chars as an unsigned int, mod 1000:
    <900 train, <950 val, else test). Content- (not id-) keyed so
    exact duplicates land in the SAME split and can't leak across the
    boundary. Both engines share the literal expression (Spark
    conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT)). Scale shape:
    embarrassingly parallel map + a 3-group aggregate."""
    from ..operators.curation import split_assignment

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(split_assignment("text", 90, 5).alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


V3_SQL = """
SELECT CASE WHEN h < 900 THEN 'train' WHEN h < 950 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (SELECT n_chars,
             CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000 AS h
      FROM documents)
GROUP BY 1
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


def m6_mor_read_view(spark, sf_dir):
    """Merge-on-read resolution as a standalone query plan: a keyed
    base snapshot (customer) overlaid by a delta of pending updates
    (each customer's latest order re-pricing their balance), resolved
    WITHOUT rewriting or window-scanning the base — the read-side plan
    of the lake layer's MoR backend (sources/lake.py MergeOnRead),
    isolated so the oracle can check its algebra. Shape:
    delta winners ∪ (base ANTI-JOIN delta keys). The window runs over
    the DELTA only (orders per customer); the 100-TB-shaped base is
    touched by one anti-join on the key — broadcastable while the
    delta stays batch-sized — and never shuffles through a window.
    A left-join+coalesce over the base would compute the same rows but
    forces every base row through the join; anti-join lets AQE prune
    entire base partitions when the delta's key range is narrow.
    Money goes through DECIMAL (exact) → DOUBLE at the boundary."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    delta = (
        orders.select(
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("_new"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("_new").cast("double").alias("balance"),
            F.lit("delta").alias("src"),
        )
    )
    untouched = cust.join(delta.select("c_custkey"), "c_custkey", "left_anti").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("balance"),
        F.lit("base").alias("src"),
    )
    return delta.unionByName(untouched)


M6_SQL = """
WITH delta AS (
  SELECT o_custkey AS c_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS balance,
         'delta' AS src
  FROM (
    SELECT o_custkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT * FROM delta
UNION ALL
SELECT c_custkey,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS balance,
       'base' AS src
FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
"""


def d9_containment_pairs(spark, sf_dir):
    """Asymmetric shingle CONTAINMENT dedup — |A∩B| / min(|A|,|B|) over
    distinct 5-token shingles — the doc-in-doc signal Jaccard (d2/d3)
    structurally under-scores: a short document fully quoted inside a
    long one has Jaccard ≈ |short|/|long| (arbitrarily small) but
    containment 1.0. Plan is an INVERTED-INDEX self-join, never
    all-pairs: shingles shuffle as md5 digests (fixed 32-byte keys, not
    text), a document-frequency pass drops singleton shingles (no pair
    can come from them) and stop-shingles occurring in > 100 docs —
    the boilerplate keys whose self-join fan-out is quadratic in df;
    at this corpus the cap never binds (max df = 4) so it is a pure
    scale guard, disclosed: a corpus where it binds under-counts the
    intersection of pairs sharing only boilerplate. Candidate pairs
    group the digest join by (doc_a, doc_b); denominators are FULL
    per-doc distinct-shingle counts, so the reported containment is
    exact for every surfaced pair whose shared shingles survive the df
    band. Both engines share the md5/threshold literals."""
    from ..operators.textdedup import containment_pairs

    d = _t(spark, sf_dir, "documents")
    return containment_pairs(d, shingle_k=5, min_df=2, max_df=100, threshold=0.5)


D9_SQL = """
WITH sh AS (
  SELECT doc_id,
         md5(array_to_string(toks[i:i+4], ' ')) AS psg
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       LATERAL (SELECT unnest(generate_series(1, GREATEST(len(toks) - 4, 1))) AS i)
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
df_band AS (
  SELECT psg FROM sh GROUP BY psg HAVING COUNT(*) BETWEEN 2 AND 100
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN df_band USING (psg) JOIN sh b USING (psg)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE)
             / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 6) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(CAST(inter AS DOUBLE)
            / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE), 6) > 0.5
"""


def e6_embedding_quantize(spark, sf_dir):
    """Deterministic int8 scalar quantization of the embedding corpus —
    the ANN-index storage compressor (4× memory vs float32, the knob
    that decides whether the e2/e4 IVF index fits executor memory at
    100 TB). Codes are q_i = floor(x_i·127/s + 0.5) under ONE global
    scale s = max|x| over the corpus: max-SELECTION is exact (no float
    accumulation), so both engines derive the identical s from their
    own scan and every downstream IEEE op matches bit-for-bit — floor
    is used instead of round() because the two engines' round-half
    conventions differ while floor(x + 0.5) is pure IEEE.

    The parity surface is audit scalars, not the code arrays: exact
    integer Σq and Σq² (a collision-resistant-enough checksum of the
    codes for a fixed dimension count) plus the mean reconstruction
    error — per-element errors rounded to 9 dp and summed as exact
    DECIMAL so the mean is order-independent (the a12/t15 trick).
    Scale shape: one map-combined max pass, the scalar broadcast into
    a second scan's per-row array expressions; nothing shuffles but
    the scalar."""
    e = _t(spark, sf_dir, "embeddings")
    s = e.agg(
        F.max(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
            )
        ).alias("s")
    ).collect()[0]["s"]
    q = lambda x: F.floor(x.cast("double") * 127.0 / F.lit(s) + 0.5)  # noqa: E731
    codes = F.transform("embedding", lambda x: q(x).cast("bigint"))
    err = F.transform(
        "embedding",
        lambda x: F.round(
            F.abs(x.cast("double") - q(x) * F.lit(s) / 127.0), 9
        ).cast("decimal(20,9)"),
    )
    zero = F.lit(0).cast("bigint")
    dzero = F.lit(0).cast("decimal(30,9)")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.aggregate(codes, zero, lambda a, x: a + x).alias("code_sum"),
        F.aggregate(codes, zero, lambda a, x: a + x * x).alias("code_sq_sum"),
        F.round(
            F.aggregate(
                err, dzero,
                # re-cast: decimal + decimal widens the scale-30 acc to
                # (31,9) and aggregate() requires merge type == acc type
                lambda a, x: (a + x).cast("decimal(30,9)"),
            ).cast("double")
            / F.size("embedding"),
            6,
        ).alias("recon_err"),
    )


E6_SQL = """
WITH sc AS (
  SELECT MAX(list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE))))) AS s
  FROM embeddings
)
SELECT vec_id,
       len(embedding) AS n_dims,
       CAST(list_sum(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5) AS BIGINT)))
            AS BIGINT) AS code_sum,
       CAST(list_sum(list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5)
                      * floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5) AS BIGINT)))
            AS BIGINT) AS code_sq_sum,
       round(CAST(list_sum(list_transform(embedding,
            x -> CAST(round(abs(CAST(x AS DOUBLE)
                       - floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5)
                         * sc.s / 127.0), 9) AS DECIMAL(20,9)))) AS DOUBLE)
             / len(embedding), 6) AS recon_err
FROM embeddings, sc
"""


def d10_cross_source_overlap(spark, sf_dir):
    """Cross-SOURCE exact-duplicate overlap matrix — the dataset-mixing
    audit run before combining corpora ("how much of source A is
    already in source B"): for every source pair, the count of distinct
    text digests present in both. d1 dedups the union blindly; this
    attributes the duplication to its source pair, which decides
    whether a new corpus is worth ingesting at all and which side's
    copies to keep (provenance-priority dedup).

    Scale shape: texts collapse to md5 digests immediately (32-byte
    keys shuffle, never the payload), per-(source, digest) distinct is
    one map-combined aggregation, and the pair matrix comes from a
    digest self-join whose fan-out per digest is |sources-containing|²
    — bounded by the source count (a corpus has a handful), never by
    corpus size. Output ordered pairs source_a < source_b."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select("source", F.md5("text").alias("h")).distinct()
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
    )


D10_SQL = """
WITH sh AS (SELECT DISTINCT source, md5(text) AS h FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared_texts
FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""


def t13_hapax_ratio(spark, sf_dir):
    """Hapax-legomena ratio per language — the fraction of the
    vocabulary occurring exactly once, the classic corpus-health /
    OCR-noise signal (a garbled corpus inflates hapax share; a
    template-spam corpus collapses it). Two-level aggregation: token
    counts partial-combine map-side before the (lang, token) shuffle,
    then one |vocab|-sized rollup per language. Ratio divides two
    exact bigints — IEEE-identical in both engines."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    return freq.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.round(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("hapax_ratio"),
    )


T13_SQL = """
WITH freq AS (
  SELECT lang, token, COUNT(*) AS n
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY 1, 2
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
FROM freq
GROUP BY lang
"""


def e5_cluster_quality(spark, sf_dir):
    """Cluster-quality audit over the labeled embeddings — simplified
    silhouette: per label, COHESION (mean cosine of members to their
    own label centroid) and SEPARATION (cosine of the centroid to its
    nearest OTHER centroid). The audit an embedding-dedup / diversity-
    sampling pipeline runs before trusting labels as strata.

    Determinism: centroids are per-dimension means from exact
    DECIMAL(27,15) sums (e3's trick — order-independent where float
    accumulation is not); member cosines fold the 64 dims in array
    order in both engines and round to 6 dp; the cohesion mean sums
    the ROUNDED cosines as DECIMAL(10,6) (exact) before one double
    division. 100-TB shape: the posexplode fan-out map-side-combines
    to |labels|·64 rows; the centroid frame re-joins broadcast; the
    |labels|² separation cross-join is over the tiny centroid frame,
    never members."""
    em = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"),
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    comp = em.select("label", F.posexplode("v").alias("dim0", "c0")).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("c0").cast("decimal(27,15)").alias("comp"),
    )
    cent_long = comp.groupBy("label", "dim").agg(
        (F.sum("comp").cast("double") / F.count(F.lit(1)).cast("double")).alias("cval")
    )
    cent = cent_long.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s["cval"],
        ).alias("c")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    def _norm(a):
        return F.sqrt(_dot(a, a))

    member = em.join(F.broadcast(cent), "label").select(
        "label",
        F.round(
            _dot(F.col("v"), F.col("c")) / (_norm(F.col("v")) * _norm(F.col("c"))), 6
        ).alias("cos"),
    )
    coh = member.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(
            F.sum(F.col("cos").cast("decimal(10,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("cohesion"),
    )
    a = cent.select(F.col("label").alias("label"), F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    sep = (
        a.join(b, F.col("label") != F.col("label_b"))
        .select(
            "label",
            F.round(
                _dot(F.col("ca"), F.col("cb"))
                / (_norm(F.col("ca")) * _norm(F.col("cb"))),
                6,
            ).alias("ccos"),
        )
        .groupBy("label")
        .agg(F.max("ccos").alias("nearest_other_cos"))
    )
    return coh.join(sep, "label").select(
        "label", "n_members", "cohesion", "nearest_other_cos"
    )


E5_SQL = """
WITH emb AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
comp AS (
  SELECT label, i AS dim, CAST(v[i] AS DECIMAL(27,15)) AS comp
  FROM emb, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
),
cent_long AS (
  SELECT label, dim, CAST(SUM(comp) AS DOUBLE) / COUNT(*) AS cval
  FROM comp GROUP BY 1, 2
),
cent AS (
  SELECT label, list(cval ORDER BY dim) AS c FROM cent_long GROUP BY 1
),
member AS (
  SELECT e.label,
         round(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * c[i]))
               / (sqrt(list_sum(list_transform(v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c, x -> x * x)))), 6) AS cos
  FROM emb e JOIN cent USING (label)
),
coh AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
         round(CAST(SUM(CAST(cos AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*), 6) AS cohesion
  FROM member GROUP BY 1
),
sep AS (
  SELECT a.label,
         MAX(round(list_sum(list_transform(generate_series(1, len(a.c)),
                                           i -> a.c[i] * b.c[i]))
                   / (sqrt(list_sum(list_transform(a.c, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.c, x -> x * x)))), 6))
           AS nearest_other_cos
  FROM cent a JOIN cent b ON a.label <> b.label
  GROUP BY 1
)
SELECT label, n_members, cohesion, nearest_other_cos
FROM coh JOIN sep USING (label)
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


def t14_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution — the
    vocabulary-concentration quality signal (low entropy = boilerplate
    or keyword-stuffed spam; complements t5's duplicate-bigram share,
    which only sees ADJACENT repetition). One identity per doc avoids
    materializing probabilities: H = log2(n) − (Σ c·log2 c)/n over the
    per-(doc, token) counts c, so the plan is two stacked aggregations
    (map-side combined) after the explode, no join, no window. Same
    single-space tokenization as t4/t5. log2 is transcendental, so the
    two engines' libm/JVM implementations (and their summation orders)
    legitimately differ by ULPs — like t9's idf, both sides round to
    6 dp, which is the statistic's meaningful precision anyway."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    cnt = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.log2("c")).alias("_clc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.log2("n_tokens") - F.col("_clc") / F.col("n_tokens"), 6
            ).alias("token_entropy"),
        )
    )


T14_SQL = """
WITH tok AS (
  SELECT doc_id, t AS tok
  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
  WHERE t <> ''
), cnt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       round(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS token_entropy
FROM cnt
GROUP BY doc_id
"""


# shared char-bigram extraction: 2-char windows over the text, built
# with an expression-only transform (no UDF); the size guard matters —
# Spark's sequence(1, 0) generates a DESCENDING [1, 0] (auto step -1)
# for 1-char docs instead of an empty list (same pitfall as t11)
_CHAR_BIGRAMS = (
    "CASE WHEN char_length(text) < 2 THEN array() "
    "ELSE transform(sequence(1, char_length(text) - 1), "
    "i -> substring(text, i, 2)) END"
)


def t15_bigram_lm_score(spark, sf_dir):
    """Corpus-trained character-bigram language-model quality score —
    the perplexity-proxy gate of CCNet/Gopher-style pipelines (there a
    pretrained KenLM; here the LM is trained on the corpus itself, so
    the whole op stays self-contained and oracle-reproducible). A doc
    whose character transitions are improbable under the corpus LM
    (binary junk, encoding damage, keyboard mash) scores far below
    prose; unlike t1's ratio heuristics this is a *statistical* quality
    signal.

    Two passes, both scale-shaped:

    1. **Train**: explode char bigrams → map-side-combined count. The
       model is at most |alphabet|² rows — its size is a property of
       the ALPHABET, not the corpus, so it broadcasts at 100 TB just
       as it does at sf0.01 (contrast a word-bigram LM, whose vocab
       grows with the corpus). Add-one smoothing over the observed
       next-char alphabet; log-probs are log2(cnt+1) − log2(ctx+A).
    2. **Score**: explode doc bigrams → broadcast-join the LM →
       per-doc mean log-prob. Every doc bigram is in the LM by
       construction (trained on the same corpus), so the join is inner
       with no OOV branch.

    Cross-engine determinism: per-bigram log-probs are rounded to 6 dp
    and cast to DECIMAL(20,6); the per-doc SUM is then exact decimal
    arithmetic (order-independent), and both engines cast the SAME
    exact decimal to double before the final divide+round — the a12
    power-sum trick applied to logs."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id", F.explode(F.expr(_CHAR_BIGRAMS)).alias("bg")
    )
    cnt = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    # context totals and alphabet size as WINDOWS over cnt, not
    # re-aggregations of grams: cnt is unpersisted lineage, so a
    # groupBy-then-join-back formulation re-derives it and pays THREE
    # extra corpus scans for a model that fits in one task. The global
    # window is safe by the same alphabet bound that makes the LM
    # broadcastable: cnt is ≤ |alphabet|² rows wherever the corpus is.
    w_ctx = Window.partitionBy(F.substring("bg", 1, 1))
    w_all = Window.partitionBy()
    lm = cnt.select(
        "bg",
        F.round(
            F.log2(F.col("c") + 1)
            - F.log2(
                F.sum("c").over(w_ctx)
                + F.size(
                    F.collect_set(F.substring("bg", 2, 1)).over(w_all)
                )
            ),
            6,
        )
        .cast("decimal(20,6)")
        .alias("lp"),
    )
    return (
        grams.join(F.broadcast(lm), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").alias("_slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("_slp").cast("double") / F.col("n_bigrams"), 6
            ).alias("lm_score"),
        )
    )


T15_SQL = """
WITH grams AS (
  SELECT doc_id,
         unnest(list_transform(range(2, length(text) + 1),
                               i -> substr(text, i - 1, 2))) AS bg
  FROM documents
), cnt AS (
  SELECT bg, COUNT(*) AS c FROM grams GROUP BY bg
), ctx AS (
  SELECT substr(bg, 1, 1) AS c1, SUM(c) AS ctx_n FROM cnt GROUP BY c1
), alpha AS (
  SELECT COUNT(DISTINCT substr(bg, 2, 1)) AS a FROM cnt
), lm AS (
  SELECT bg,
         CAST(round(log2(c + 1) - log2(ctx_n + a), 6) AS DECIMAL(20,6)) AS lp
  FROM cnt JOIN ctx ON substr(cnt.bg, 1, 1) = ctx.c1 CROSS JOIN alpha
)
SELECT g.doc_id,
       COUNT(*) AS n_bigrams,
       round(CAST(SUM(lm.lp) AS DOUBLE) / COUNT(*), 6) AS lm_score
FROM grams g JOIN lm ON g.bg = lm.bg
GROUP BY g.doc_id
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


def c6_quantile_trim(spark, sf_dir):
    """Per-group exact-quantile trimming (winsorize-by-rank): keep
    documents whose length sits within their SOURCE's [p10, p90]
    nearest-rank band, then roll up what survived — the outlier gate a
    curation pipeline runs between profiling (a13) and the quality
    decision (c3), with the thresholds computed FROM the data per
    group rather than hand-set. Nearest-rank (integer-ceil) selection
    keeps both engines bit-identical where interpolating percentiles
    are not (a13's determinism argument).

    100-TB shape: the quantile pass is one partition-local sort per
    group (what any exact order statistic costs) and emits ONE ROW PER
    SOURCE — that frame broadcasts back onto the corpus, so the trim
    itself is a scan + broadcast-hash-join + map-side-combined rollup:
    the corpus never shuffles on the group key a second time.
    Plan-pinned in tests/test_plans.py (BroadcastHashJoin + partial
    aggregation)."""
    from ..operators.stats import exact_quantiles

    d = _t(spark, sf_dir, "documents")
    q = exact_quantiles(d, "source", "n_chars", "doc_id", [10, 90])
    return (
        d.join(F.broadcast(q), "source")
        .filter(F.col("n_chars").between(F.col("p10"), F.col("p90")))
        .groupBy("source", "p10", "p90")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


C6_SQL = """
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
), q AS (
  SELECT source,
         MAX(CASE WHEN rn = (n * 10 + 99) // 100 THEN n_chars END) AS p10,
         MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END) AS p90
  FROM ranked
  WHERE rn = (n * 10 + 99) // 100 OR rn = (n * 90 + 99) // 100
  GROUP BY source
)
SELECT d.source, q.p10, q.p90,
       COUNT(*) AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN q ON d.source = q.source
WHERE d.n_chars BETWEEN q.p10 AND q.p90
GROUP BY d.source, q.p10, q.p90
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

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "p1_project_filter": p1_project_filter,
    "p2_null_safe_cast": p2_null_safe_cast,
    "p3_topk_limit": p3_topk_limit,
    "f1_regexp_extract": f1_regexp_extract,
    "f2_split_part": f2_split_part,
    "f3_date_arith": f3_date_arith,
    "f4_json": f4_json,
    "f6_sequence_explode": f6_sequence_explode,
    "f7_string_funcs": f7_string_funcs,
    "j1_merge_branch_split": j1_merge_branch_split,
    "j2_group_collect": j2_group_collect,
    "j3_left_join_null": j3_left_join_null,
    "j4_inner_drop_count": j4_inner_drop_count,
    "j5_semi": j5_semi,
    "j6_anti": j6_anti,
    "j7_two_hop": j7_two_hop,
    "j8_chain4_threshold": j8_chain4_threshold,
    "j9_asof": j9_asof,
    "j9b_asof_window": j9b_asof_window,
    "a1_outcome_rollup": a1_outcome_rollup,
    "a5_distinct_counts": a5_distinct_counts,
    "a6_all_over_group": a6_all_over_group,
    "u1_set_ops": u1_set_ops,
    "w1_top1_per_key": w1_top1_per_key,
    "w2_topk_per_group": w2_topk_per_group,
    "w3_session_starts": w3_session_starts,
    "w5_running_sum": w5_running_sum,
    "m1_cdc_final_state": m1_cdc_final_state,
    "s1_tumbling_window": s1_tumbling_window,
    "s2_session_window": s2_session_window,
    "d1_exact_dedup": d1_exact_dedup,
    "d2_ngram_jaccard": d2_ngram_jaccard,
    "t1_quality_score": t1_quality_score,
    "t2_langid_heuristic": t2_langid_heuristic,
    "t3_fingerprint": t3_fingerprint,
    "e1_cosine_topk": e1_cosine_topk,
    "d3_minhash_lsh": d3_minhash_lsh,
    "d4_simhash_near_dups": d4_simhash_near_dups,
    "d5_dedup_survivors": d5_dedup_survivors,
    "d6_embedding_near_dups": d6_embedding_near_dups,
    "t4_token_count": t4_token_count,
    "t5_repetition_ratio": t5_repetition_ratio,
    "t6_token_dominance": t6_token_dominance,
    "e2_ivf_ann_topk": e2_ivf_ann_topk,
    "x1_multimodal_features": x1_multimodal_features,
    "c1_decontamination": c1_decontamination,
    "v1_bpe_pair_mining": v1_bpe_pair_mining,
    "t8_stratified_sample": t8_stratified_sample,
    "w6_turn_latency": w6_turn_latency,
    "s3_sliding_window": s3_sliding_window,
    "e3_kmeans_step": e3_kmeans_step,
    "a7_exact_median": a7_exact_median,
    "a8_rollup": a8_rollup,
    "a9_pivot": a9_pivot,
    "m2_render_transcripts": m2_render_transcripts,
    "c2_token_chunking": c2_token_chunking,
    "c3_quality_filter": c3_quality_filter,
    "m3_snapshot_diff": m3_snapshot_diff,
    "m4_scd2_history": m4_scd2_history,
    "w7_rank_family": w7_rank_family,
    "a10_cube": a10_cube,
    "c4_pii_scrub": c4_pii_scrub,
    "c5_domain_rebalance": c5_domain_rebalance,
    "c6_quantile_trim": c6_quantile_trim,
    "v2_sequence_packing": v2_sequence_packing,
    "t9_tfidf": t9_tfidf,
    "j10_interval_join": j10_interval_join,
    "w8_ntile_deciles": w8_ntile_deciles,
    "a11_grouping_sets": a11_grouping_sets,
    "d7_edit_distance_near_dups": d7_edit_distance_near_dups,
    "j11_interval_overlap": j11_interval_overlap,
    "s4_late_event_accounting": s4_late_event_accounting,
    "t10_type_token_ratio": t10_type_token_ratio,
    "t11_bigram_topk": t11_bigram_topk,
    "d8_dup_passage_fraction": d8_dup_passage_fraction,
    "w9_locf_gap_fill": w9_locf_gap_fill,
    "j12_null_safe_join": j12_null_safe_join,
    "j13_salted_skew_join": j13_salted_skew_join,
    "w10_activity_streaks": w10_activity_streaks,
    "m5_changelog_compaction": m5_changelog_compaction,
    "e4_knn_graph": e4_knn_graph,
    "a12_stats_moments": a12_stats_moments,
    "u2_unpivot": u2_unpivot,
    "t12_length_histogram": t12_length_histogram,
    "v3_split_assignment": v3_split_assignment,
    "a13_exact_quantiles": a13_exact_quantiles,
    "m6_mor_read_view": m6_mor_read_view,
    "m7_incremental_view_maintenance": m7_incremental_view_maintenance,
    "m8_schema_evolution_cdc": m8_schema_evolution_cdc,
    "d9_containment_pairs": d9_containment_pairs,
    "t13_hapax_ratio": t13_hapax_ratio,
    "e5_cluster_quality": e5_cluster_quality,
    "a14_column_profile": a14_column_profile,
    "w12_range_frame_rolling": w12_range_frame_rolling,
    "w13_funnel_subsequence": w13_funnel_subsequence,
    "t14_token_entropy": t14_token_entropy,
    "t15_bigram_lm_score": t15_bigram_lm_score,
    "a15_approx_distinct": a15_approx_distinct,
    "a16_approx_quantile_bound": a16_approx_quantile_bound,
    "d10_cross_source_overlap": d10_cross_source_overlap,
    "e6_embedding_quantize": e6_embedding_quantize,
}

ORACLES: dict[str, str] = {
    "p1_project_filter": P1_SQL,
    "p2_null_safe_cast": P2_SQL,
    "p3_topk_limit": P3_SQL,
    "f1_regexp_extract": F1_SQL,
    "f2_split_part": F2_SQL,
    "f3_date_arith": F3_SQL,
    "f4_json": F4_SQL,
    "f6_sequence_explode": F6_SQL,
    "f7_string_funcs": F7_SQL,
    "j1_merge_branch_split": J1_SQL,
    "j2_group_collect": J2_SQL,
    "j3_left_join_null": J3_SQL,
    "j4_inner_drop_count": J4_SQL,
    "j5_semi": J5_SQL,
    "j6_anti": J6_SQL,
    "j7_two_hop": J7_SQL,
    "j8_chain4_threshold": J8_SQL,
    "j9_asof": J9_SQL,
    "j9b_asof_window": J9_SQL,
    "a1_outcome_rollup": A1_SQL,
    "a5_distinct_counts": A5_SQL,
    "a6_all_over_group": A6_SQL,
    "u1_set_ops": U1_SQL,
    "w1_top1_per_key": W1_SQL,
    "w2_topk_per_group": W2_SQL,
    "w3_session_starts": W3_SQL,
    "w5_running_sum": W5_SQL,
    "m1_cdc_final_state": M1_SQL,
    "s1_tumbling_window": S1_SQL,
    "s2_session_window": S2_SQL,
    "d1_exact_dedup": D1_SQL,
    "d2_ngram_jaccard": D2_SQL,
    "t1_quality_score": T1_SQL,
    "t2_langid_heuristic": T2_SQL,
    "t3_fingerprint": T3_SQL,
    "e1_cosine_topk": E1_SQL_TEMPLATE,
    "d3_minhash_lsh": D3_SQL,
    "d4_simhash_near_dups": D4_SQL,
    "d5_dedup_survivors": D5_SQL,
    "d6_embedding_near_dups": D6_SQL,
    "t4_token_count": T4_SQL,
    "t5_repetition_ratio": T5_SQL,
    "t6_token_dominance": T6_SQL,
    "e2_ivf_ann_topk": E2_SQL,
    "x1_multimodal_features": X1_SQL,
    "c1_decontamination": C1_SQL,
    "v1_bpe_pair_mining": V1_SQL,
    "t8_stratified_sample": T8_SQL,
    "w6_turn_latency": W6_SQL,
    "s3_sliding_window": S3_SQL,
    "e3_kmeans_step": E3_SQL,
    "a7_exact_median": A7_SQL,
    "a8_rollup": A8_SQL,
    "a9_pivot": A9_SQL,
    "m2_render_transcripts": M2_SQL,
    "c2_token_chunking": C2_SQL,
    "c3_quality_filter": C3_SQL,
    "m3_snapshot_diff": M3_SQL,
    "m4_scd2_history": M4_SQL,
    "w7_rank_family": W7_SQL,
    "a10_cube": A10_SQL,
    "c4_pii_scrub": C4_SQL,
    "c5_domain_rebalance": C5_SQL,
    "c6_quantile_trim": C6_SQL,
    "v2_sequence_packing": V2_SQL,
    "t9_tfidf": T9_SQL,
    "j10_interval_join": J10_SQL,
    "w8_ntile_deciles": W8_SQL,
    "a11_grouping_sets": A11_SQL,
    "d7_edit_distance_near_dups": D7_SQL,
    "j11_interval_overlap": J11_SQL,
    "s4_late_event_accounting": S4_SQL,
    "t10_type_token_ratio": T10_SQL,
    "t11_bigram_topk": T11_SQL,
    "d8_dup_passage_fraction": D8_SQL,
    "w9_locf_gap_fill": W9_SQL,
    "j12_null_safe_join": J12_SQL,
    "j13_salted_skew_join": J13_SQL,
    "w10_activity_streaks": W10_SQL,
    "m5_changelog_compaction": M5_SQL,
    "e4_knn_graph": E4_SQL,
    "a12_stats_moments": A12_SQL,
    "u2_unpivot": U2_SQL,
    "t12_length_histogram": T12_SQL,
    "v3_split_assignment": V3_SQL,
    "a13_exact_quantiles": A13_SQL,
    "m6_mor_read_view": M6_SQL,
    "m7_incremental_view_maintenance": M7_SQL,
    "m8_schema_evolution_cdc": M8_SQL,
    "d9_containment_pairs": D9_SQL,
    "t13_hapax_ratio": T13_SQL,
    "e5_cluster_quality": E5_SQL,
    "a14_column_profile": A14_SQL,
    "w12_range_frame_rolling": W12_SQL,
    "w13_funnel_subsequence": W13_SQL,
    "t14_token_entropy": T14_SQL,
    "t15_bigram_lm_score": T15_SQL,
    "a15_approx_distinct": A15_SQL,
    "a16_approx_quantile_bound": A16_SQL,
    "d10_cross_source_overlap": D10_SQL,
    "e6_embedding_quantize": E6_SQL,
}
