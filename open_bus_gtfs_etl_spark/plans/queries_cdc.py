"""CDC / merge / serving family (m*) of the driver-contract query
catalog -- the engine's centerpiece queries.

Mechanically split out of plans/queries.py (round 5) to keep files
reviewable; naming conventions and the determinism rules for the
value-hash gate are documented in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .base import _t  # noqa: F401



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
