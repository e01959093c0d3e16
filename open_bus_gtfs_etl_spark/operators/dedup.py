"""Last-writer-wins deduplication — the core CDC dedup (SURVEY.md W4).

Reference semantics: re-running a day's load overwrites tracked columns
with the newest file's values, so the later writer wins per natural key
(load_stops_to_db.py:56-61, load_routes_to_db.py:48-56,
load_stop_times_to_db.py:130-137). The CDC generalization orders by
``(lsn, ts)`` and must dedup BEFORE the insert/update/delete branch
split so that a delete beats an older update but loses to a newer one
(SURVEY.md §7 hard parts, "deletes + LWW interplay").

Three equivalent implementations, chosen for scale behavior:

- ``lww_dedup_agg`` (default): ``groupBy(keys).agg(max_by(struct(...),
  struct(lsn, ts)))``. Hash aggregation with MAP-SIDE PARTIAL COMBINE —
  each input partition reduces hot keys locally before the shuffle, so
  a conversation receiving 10^6 updates in one batch ships ~one row per
  upstream partition instead of 10^6 rows to one reducer. This is the
  built-in answer to key skew and the reason agg beats window-rank at
  scale (window requires a full shuffle + sort with no partial reduce).

- ``lww_dedup_window``: the literal reference semantics —
  ``row_number() over (partition by key order by lsn desc, ts desc) = 1``.
  Kept for parity testing and for when the full winning ROW ordering
  matters.

- ``lww_dedup_salted``: explicit two-phase salted plan (SURVEY.md §7
  step 5): phase 1 reduces per ``(key, salt)`` — spreading a hot key
  over ``n_salts`` reducers — phase 2 reduces the ≤ n_salts survivors
  per key. Property-tested identical to the unsalted plans. With the
  agg implementation Spark's partial combine already does this
  implicitly; the explicit form documents the plan and covers engines/
  configs where partial aggregation is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ord_struct(lsn_col: str = "lsn", ts_col: str = "ts") -> F.Column:
    return F.struct(F.col(lsn_col), F.col(ts_col))


def lww_dedup_agg(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    carry_stats: bool = False,
) -> DataFrame:
    """One winner row per key via max_by — partial-aggregating, skew-robust.

    ``carry_stats`` adds per-key ``_n_dups`` / ``_lsn_min`` / ``_lsn_max``
    columns in the SAME aggregation pass, so the merge's lineage counters
    (batch size, lsn range) come for free instead of re-scanning the batch.
    """
    aggs = [
        F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]), _ord_struct(lsn_col, ts_col)
        ).alias("_w")
    ]
    if carry_stats:
        aggs += [
            F.count("*").alias("_n_dups"),
            F.min(lsn_col).alias("_lsn_min"),
            F.max(lsn_col).alias("_lsn_max"),
        ]
    out = df.groupBy(*key_cols).agg(*aggs)
    extra = ["_n_dups", "_lsn_min", "_lsn_max"] if carry_stats else []
    return out.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload_cols], *extra
    )


def lww_dedup_argmax_join(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    carry_stats: bool = False,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Argmax-via-semi-join LWW: phase 1 hash-aggregates only
    ``max(lsn)`` per key (a pure-long buffer → HashAggregate, vs the
    SortAggregate that ``max_by(struct)`` plans to); phase 2 joins the
    winning lsn back to fetch the payload. Wins when the payload is wide
    (text) and duplication is high: the agg shuffle carries keys+longs
    only, never text. Requires lsn to be unique per key occurrence
    (true for a WAL; duplicate deliveries share the lsn AND payload, so
    any one of the tied winner rows is THE winner).

    ``broadcast_keys`` (default on) hints the keys+longs winner frame
    into a broadcast-hash join, so the wide payload side is never
    written to shuffle at all — measured at 16M×1KB events, the static
    sort-merge plan wrote ~1 GB of payload shuffle that AQE could only
    downgrade to a local read. One winner key is ~40 bytes, so the
    broadcast stays executor-friendly up to tens of millions of
    distinct keys per micro-batch; pass False beyond that (or when the
    driver's maxResultSize is tight) to fall back to the shuffle join.

    Duplicate-delivery ties (same key AND lsn, identical payload) are
    broken by a row_number window over ONLY the ~1-per-key post-filter
    winners — never an aggregation buffer holding the payload.
    """
    aggs = [F.max(lsn_col).alias("_max_lsn")]
    if carry_stats:
        aggs += [
            F.count("*").alias("_n_dups"),
            F.min(lsn_col).alias("_lsn_min"),
            F.max(lsn_col).alias("_lsn_max"),
        ]
    winners_lsn = df.groupBy(*key_cols).agg(*aggs)
    if broadcast_keys:
        winners_lsn = F.broadcast(winners_lsn)
    j = df.join(
        winners_lsn,
        on=[*key_cols],
        how="inner",
    ).where(F.col(lsn_col) == F.col("_max_lsn"))
    extra = ["_n_dups", "_lsn_min", "_lsn_max"] if carry_stats else []
    # rank BEFORE the output projection: ts_col need not be (and
    # usually isn't) part of the payload the caller keeps
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).desc())
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*key_cols, *payload_cols, *extra)
    )


def argmax_winner_stats(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    carry_stats: bool = False,
) -> DataFrame:
    """Per-key winning-lsn frame for ``lww_dedup_argmax_lsn``: one row
    per key holding ONLY the winning lsn (plus the lineage counters
    when ``carry_stats``) — the key columns themselves are projected
    away, because under the globally-unique-lsn contract the winning
    lsn alone identifies the winner row. 32 bytes/row (4 longs) vs ~90
    for the keyed frame: the broadcast relation shrinks ~3x and the
    probe-side hash is a single long instead of string+int."""
    aggs = [F.max(lsn_col).alias("_win_lsn")]
    if carry_stats:
        aggs += [
            F.count("*").alias("_n_dups"),
            F.min(lsn_col).alias("_lsn_min"),
            F.max(lsn_col).alias("_lsn_max"),
        ]
    extra = ["_n_dups", "_lsn_min", "_lsn_max"] if carry_stats else []
    return df.groupBy(*key_cols).agg(*aggs).select("_win_lsn", *extra)


def lww_dedup_argmax_lsn(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    carry_stats: bool = False,
    winner_stats: DataFrame | None = None,
    broadcast_keys: bool = True,
    cluster_expr: F.Column | None = None,
    cluster_col: str = "_bucket",
    cluster_partitions: int | None = None,
) -> DataFrame:
    """Argmax LWW for feeds whose lsn is GLOBALLY unique across keys —
    the WAL contract (lsn is the global event id; duplicate deliveries
    share lsn AND payload; see genlog.generate_events).

    Under that contract ``row.lsn == max(lsn) over row's key`` is
    equivalent to ``row.lsn ∈ {winning lsns}``: an lsn belongs to
    exactly one key event, so a row can never match another key's
    winning lsn. The join-back therefore equi-joins on the single
    ``lsn`` long instead of the (string, int) key pair:

    - the broadcast relation carries (``_win_lsn`` + optional counters)
      only — ~32 B/row, ~3x smaller than the keyed winner frame, so the
      driver-serial broadcast build (part of the scaling serial floor)
      shrinks proportionally;
    - the probe side hashes one long per row instead of a ~17-char
      string + int.

    ``winner_stats`` accepts a pre-built (possibly persisted) frame
    from :func:`argmax_winner_stats` so a caller that already counted
    it for the broadcast decision doesn't recompute the aggregation.

    Ties (duplicate deliveries: same key AND lsn, identical payload)
    are broken by a row_number window partitioned by the LSN itself:
    under global uniqueness lsn ⊃ key, so per-lsn rank ≡ per-key rank
    over the survivors, and the exchange/sort compare one long instead
    of a string+int key (measured ~2.4 s cheaper per 16M events at 1
    core than the keyed window). NOT safe when lsn values can repeat
    across keys — use ``lww_dedup_argmax_join`` there (per-key
    uniqueness suffices for it).

    ``cluster_expr`` (guide §2.4 — remove shuffles outright): when the
    caller knows the downstream clustering (the merge's bucket column,
    a pure function of ``key_cols[0]``), the tie-break rides THAT
    exchange instead of adding its own. The survivors are repartitioned
    by the bucket expression (the exchange the bucketed write needs
    anyway), and ties collapse with a ``lag`` window partitioned by
    ``(bucket, *key_cols)``:

    - ``HashPartitioning([bucket])`` is a subset of the window's
      ``ClusteredDistribution([bucket, *keys])``, so the window adds NO
      exchange;
    - after the join-back every surviving row of a key carries that
      key's single winning lsn, so ``lag(lsn) IS NULL`` keeps exactly
      the first row of each (bucket, key) group — same survivor set as
      the per-lsn rank (ties are bit-identical re-deliveries);
    - ``lag`` (an offset window function) deliberately replaces
      ``row_number``: a rank filter triggers Spark's WindowGroupLimit
      insertion, whose partial phase fully sorts the payload on the
      map side to drop ~2% of rows — a bad trade the offset function
      sidesteps;
    - the window's required sort (bucket, keys, ts desc) IS the
      bucketed writer's required order, so the write's
      ``sortWithinPartitions`` collapses into it (plan-verified).

    The output then carries ``cluster_col`` so the merge reuses the
    attribute (and with it the partitioning/ordering metadata) instead
    of recomputing the expression. Net: the winners' payload crosses
    ONE exchange and ONE sort end-to-end instead of two of each.
    """
    if winner_stats is None:
        winner_stats = argmax_winner_stats(
            df, key_cols, lsn_col=lsn_col, carry_stats=carry_stats
        )
    side = F.broadcast(winner_stats) if broadcast_keys else winner_stats
    j = df.join(side, F.col(lsn_col) == F.col("_win_lsn"), "inner")
    extra = ["_n_dups", "_lsn_min", "_lsn_max"] if carry_stats else []
    if cluster_expr is not None:
        j = j.withColumn(cluster_col, cluster_expr)
        if cluster_partitions:
            j = j.repartition(cluster_partitions, F.col(cluster_col))
        else:
            j = j.repartition(F.col(cluster_col))
        w = Window.partitionBy(cluster_col, *key_cols).orderBy(
            F.col(ts_col).desc()
        )
        return (
            j.withColumn("_prev_lsn", F.lag(lsn_col).over(w))
            .where(F.col("_prev_lsn").isNull())
            .select(*key_cols, *payload_cols, *extra, cluster_col)
        )
    w = Window.partitionBy(lsn_col).orderBy(F.col(ts_col).desc())
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*key_cols, *payload_cols, *extra)
    )


def lww_dedup_window_repart(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    carry_stats: bool = False,
) -> DataFrame:
    """Single-payload-shuffle LWW for bootstrap/full-replay batches.

    Explicitly repartitions by the FIRST key column, then ranks within
    key. ``HashPartitioning([k0])`` is a subset of the window's
    ``ClusteredDistribution(key_cols)``, so the rank adds NO second
    exchange — the payload crosses the wire exactly once. Compare
    argmax (``lww_dedup_argmax_join``): keys+longs agg shuffle PLUS a
    driver-serial broadcast build of every winner key PLUS the
    join-back. For a batch that is mostly UNIQUE keys the join-back
    filters almost nothing and the winner frame is as big as the batch
    — this plan deletes both costs. For a high-duplication batch the
    trade inverts: argmax shuffles only the winners' payload, while
    this plan moves every wide input row once (measured 2× slower at
    16M events / 1M keys — see apply_batch's dedup docstring), so it
    is an explicit opt-in, not the default.

    The clustering survives downstream: the merge's bucketed write
    (bucket = f(k0)) can write ``partitionBy(bucket)`` directly from
    these partitions with no bucket repartition (files per bucket ≤
    shuffle partitions — size ``spark.sql.shuffle.partitions`` to the
    batch, not the core count). Steady-state incremental merges keep
    argmax: there the winner set is small, the broadcast is cheap, and
    the target join dominates.

    ``carry_stats`` computes the per-key counters with whole-partition
    window frames over the SAME partitioning (no extra shuffle).
    Skew note: a hot key's rows land in one partition here (sorted,
    not combined) — for pathologically hot keys use the salted or
    argmax plan.
    """
    out = df.repartition(F.col(key_cols[0]))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(lsn_col).desc(), F.col(ts_col).desc()
    )
    sel = out.withColumn("_rn", F.row_number().over(w))
    extra = []
    if carry_stats:
        wu = Window.partitionBy(*key_cols)
        sel = (
            sel.withColumn("_n_dups", F.count("*").over(wu))
            .withColumn("_lsn_min", F.min(lsn_col).over(wu))
            .withColumn("_lsn_max", F.max(lsn_col).over(wu))
        )
        extra = ["_n_dups", "_lsn_min", "_lsn_max"]
    return sel.where(F.col("_rn") == 1).select(
        *key_cols, *payload_cols, *extra
    )


def lww_dedup_window(
    df: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
) -> DataFrame:
    """Reference-literal LWW: rank within key, keep row 1 (W4)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col).desc(), F.col(ts_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_salted(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    lsn_col: str = "lsn",
    ts_col: str = "ts",
    n_salts: int = 16,
) -> DataFrame:
    """Explicit two-phase salted LWW (hot-key spreading) for the
    SORT-plan family.

    Salting is the straggler fix for plans that must SORT a key's rows
    on one reducer (``lww_dedup_window`` / ``_window_repart``): phase 1
    repartitions by (key, salt = lsn % n_salts) — a hot key's rows
    split across n_salts sort shards of hot/n_salts rows each — and
    ranks within the shard; phase 2 re-ranks the ≤ n_salts per-salt
    winners per key (a shuffle of |keys|·n_salts short rows). The
    payload crosses the wire once, same as the unsalted window plan.

    Deliberately NOT a ``max_by(struct)`` aggregation: max_by carries
    an object buffer, so it plans ObjectHashAggregate, which falls back
    to sort-based aggregation once a partition exceeds
    ``spark.sql.objectHashAggregate.sortBased.fallbackThreshold``
    (default 128 groups) — on any real batch that is a guaranteed
    fallback, i.e. the full sort the salting was meant to avoid plus
    per-row struct-buffer copies (measured 2–10× slower than this plan
    and erratic under memory pressure, bench/skew_ab.py). The
    AGGREGATION plan family (``lww_dedup_argmax_join``, the kernel
    default) needs no salting at all: its longs-only partial
    HashAggregate map-side-combines a hot key to ≤ one row per map
    task before the shuffle.

    Ties: duplicate deliveries share lsn AND payload, so they land in
    the same salt shard and either copy is THE winner.
    """
    p1 = df.withColumn("_salt", F.pmod(F.col(lsn_col), F.lit(n_salts)))
    # repartition on (key, salt) satisfies the phase-1 window's
    # required ClusteredDistribution — one exchange, shard-local sort
    p1 = p1.repartition(*[F.col(c) for c in key_cols], F.col("_salt"))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(
        F.col(lsn_col).desc(), F.col(ts_col).desc()
    )
    per_salt = p1.withColumn("_rn", F.row_number().over(w1)).where(F.col("_rn") == 1)
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col(lsn_col).desc(), F.col(ts_col).desc()
    )
    return (
        per_salt.withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") == 1)
        .select(*key_cols, *payload_cols)
    )
