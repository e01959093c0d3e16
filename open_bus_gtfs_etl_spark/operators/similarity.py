"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed
variant (random hyperplane signatures → candidate buckets) is the
scale path: instead of scoring every vector, only vectors sharing a
signature bucket with the query are scored — an equality join, the
Spark-friendly shape. IVF-style coarse quantization would slot in the
same way (bucket = nearest centroid id).

All arithmetic is double-precision array expressions (zip_with +
aggregate) — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_to_query(df: DataFrame, query: list[float], vec_col: str = "embedding") -> DataFrame:
    """Add ``cos_sim`` to every row: brute-force exact scoring."""
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = sum(float(x) * float(x) for x in query) ** 0.5
    v = _to_double(F.col(vec_col))
    cos = dot(v, q) / (l2_norm(v) * F.lit(qn))
    return df.withColumn("cos_sim", cos)


def brute_force_topk(
    df: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit lets Spark run TakeOrdered —
    a per-partition top-k then a driver-side merge of k×partitions rows,
    never a full sort of the corpus."""
    return (
        cosine_to_query(df, query, vec_col)
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ----------------------------------------------------------------- IVF ANN

def ivf_centroids(dim: int, n_centroids: int = 8, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-1, 1)^dim, derived
    from (seed, centroid, component) via sha256 in pure Python — the
    same literals are embeddable in a Spark plan AND an ANSI-SQL oracle,
    which is what makes the IVF contract exactly checkable."""
    import hashlib

    cents = []
    for i in range(n_centroids):
        c = []
        for j in range(dim):
            h = hashlib.sha256(f"ivf:{seed}:{i}:{j}".encode()).digest()
            c.append(int.from_bytes(h[:8], "big") / float(1 << 63) - 1.0)
        cents.append(c)
    return cents


def nearest_centroids(vec: list[float], cents: list[list[float]], n_probe: int) -> list[int]:
    """Indices of the ``n_probe`` nearest centroids by dot product
    (left-to-right float accumulation — the same IEEE result the SQL
    oracle's list_sum produces; ties break to the lower centroid id)."""
    def _dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    scored = sorted((-_dot(vec, c), i) for i, c in enumerate(cents))
    return [i for _, i in scored[:n_probe]]


def assign_centroid(vec_col: str, cents: list[list[float]]) -> F.Column:
    """Per-row nearest-centroid id (argmax dot), ties to the lowest id —
    pure array expressions, identical tie semantics to the SQL oracle's
    row_number() ORDER BY dot DESC, cid."""
    v = _to_double(F.col(vec_col))
    dots = F.array(*[dot(v, F.array(*[F.lit(x) for x in c])) for c in cents])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def assign_centroids_topn(vec_col: str, cents: list[list[float]], n_probe: int) -> F.Column:
    """Per-row TOP-``n_probe`` centroid ids as an array<int>, ordered
    nearest-first, ties to the lowest id. sort_array over
    struct(-dot, cid) sorts by dot DESC then cid ASC — bit-identical
    tie semantics to the oracle's row_number() ORDER BY dot DESC, cid
    with rn <= n_probe. Pure array expressions, still codegen'd."""
    v = _to_double(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(
                (-dot(v, F.array(*[F.lit(x) for x in c]))).alias("nd"),
                F.lit(i).cast("int").alias("cid"),
            )
            for i, c in enumerate(cents)
        ]
    )
    ranked = F.sort_array(scored)
    return F.array(*[F.element_at(ranked, i + 1)["cid"] for i in range(n_probe)])


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
    round_dp: int = 6,
) -> DataFrame:
    """IVF-style approximate top-k: score only vectors assigned to the
    query's ``n_probe`` nearest centroid buckets.

    At corpus scale the assignment is a narrow map over each vector
    (the centroid table is a broadcast-sized literal); the probe filter
    prunes the scan to ~n_probe/n_centroids of the corpus before any
    cosine is paid; top-k runs as TakeOrdered. Recall/cost trade on
    (n_centroids, n_probe) exactly as in a FAISS IVF index."""
    cents = ivf_centroids(len(query), n_centroids, seed)
    probes = nearest_centroids(query, cents, n_probe)
    cand = df.where(assign_centroid(vec_col, cents).isin([int(p) for p in probes]))
    scored = cosine_to_query(cand, query, vec_col).withColumn(
        "cos_sim", F.round("cos_sim", round_dp)
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def hyperplane_signature(
    vec_col: str, dim: int, n_planes: int = 16, seed: int = 5
) -> F.Column:
    """Random-hyperplane LSH signature (long): bit i = sign of the dot
    product with pseudo-random plane i. Planes derive deterministically
    from (seed, plane, component) hashes — no stored model, every
    executor computes the same planes inside codegen."""
    v = _to_double(F.col(vec_col))

    def plane_component(i: int, j: int) -> F.Column:
        h = F.xxhash64(F.lit(seed), F.lit(i), F.lit(j))
        return (F.pmod(h, F.lit(2_000_001)).cast("double") - 1_000_000.0) / 1_000_000.0

    bits = []
    for i in range(n_planes):
        plane = F.array(*[plane_component(i, j) for j in range(dim)])
        d = dot(v, plane)
        bits.append(
            F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).cast("long")
            * F.lit(1 << i).cast("long")
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 5,
    max_candidates: int | None = None,
    dropped: dict | None = None,
) -> DataFrame:
    """Approximate top-k: score only vectors that share an LSH bucket
    with the query in at least one of ``n_tables`` hash tables.

    At corpus scale the signature computation is a narrow map; the
    candidate restriction is a single filter against the query's
    signature vector (computed in ONE driver-side job for all tables,
    not one collect per table); only candidates pay the cosine. Recall
    rises with n_tables, cost with bucket size — the standard knobs.

    ``max_candidates`` bounds the scored set when a degenerate corpus
    floods the query's buckets (take lowest ids, deterministic); the
    truncation is surfaced through ``dropped``, never silent.
    """
    dim = len(query)
    spark = df.sparkSession
    qdf = spark.createDataFrame([(query,)], "q array<double>")
    # all query signatures in one collect
    qsigs = qdf.select(
        *[
            hyperplane_signature("q", dim, n_planes, seed + 1000 * t).alias(f"s{t}")
            for t in range(n_tables)
        ]
    ).collect()[0]
    match = None
    for t in range(n_tables):
        sig = hyperplane_signature(vec_col, dim, n_planes, seed + 1000 * t)
        this = sig == F.lit(qsigs[f"s{t}"])
        match = this if match is None else (match | this)
    cand = df.where(match)
    if max_candidates is not None:
        n = cand.count()
        if n > max_candidates:
            if dropped is not None:
                dropped["n_dropped_candidates"] = n - max_candidates
            cand = cand.orderBy(id_col).limit(max_candidates)
        elif dropped is not None:
            dropped["n_dropped_candidates"] = 0
    return brute_force_topk(cand, query, k, vec_col, id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.465,
    n_centroids: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucket-restricted
    with MULTI-PROBE assignment: every vector lands in its top
    ``n_probe`` seed-derived centroid buckets (``assign_centroids_topn``
    — deterministic literals shared with the SQL oracle), candidate
    pairs are the SHARED-BUCKET pairs (an equi-join on cid — ~n_probe²·
    n²/k work instead of n², the only shape that survives corpus
    scale), candidates are verified with the exact cosine, and pairs
    sharing two buckets are deduplicated.

    ``n_probe=2`` (default) closes the single-probe boundary blindness:
    a true near-dup pair straddling a centroid boundary (top-1
    assignments differ, top-2 sets overlap) is now in scope. Like
    ``ivf_topk``, the remaining restriction is part of the CONTRACT,
    not a hidden recall loss: the oracle applies the identical top-n
    assignment, so both engines compute the same approximate result —
    a pair sharing NO probed bucket is out of scope for both. Returns
    (id_a, id_b, cos_sim) with id_a < id_b, cos_sim rounded to 6
    decimals AFTER the threshold filter.
    """
    cents = ivf_centroids(dim, n_centroids=n_centroids)
    # the L2 norm is a per-VECTOR quantity: compute it once per
    # (vector, probe) row here instead of twice per candidate PAIR in
    # the join output (guide §1.2 — don't compute things you throw
    # away; the norms were ~2/3 of the per-pair flops). Same fold, same
    # operands → bit-identical doubles. The full assignment array
    # (``cids``, n_probe ints) rides along so a pair sharing BOTH
    # probed buckets is emitted from its MINIMUM shared bucket only —
    # each candidate pair is produced exactly once, halving the cosine
    # evaluations the old post-hoc ``distinct`` paid for.
    base = _probe_base(df, cents, n_probe, id_col, vec_col)
    a, b = base.alias("a"), base.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.id") < F.col("b.id"))
            & _min_shared_bucket(),
        )
        # compute the cosine ONCE into a column, then filter/round on
        # the attribute — the previous where(cos)+select(round(cos))
        # form evaluated the full fold twice for every surviving pair
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("_cos"),
        )
        .where(F.col("_cos") > F.lit(threshold))
        .select("id_a", "id_b", F.round("_cos", 6).alias("cos_sim"))
        # pairs are unique by construction now; kept because the oracle
        # is SELECT DISTINCT and the post-threshold set is tiny
        .distinct()
    )


def _probe_base(df, cents, n_probe, id_col, vec_col):
    """(id, v, cids, cid, nrm) — one row per (vector, probed bucket),
    carrying the full probe set and the precomputed L2 norm."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            _to_double(F.col(vec_col)).alias("v"),
            assign_centroids_topn(vec_col, cents, n_probe).alias("cids"),
        )
        .withColumn("cid", F.explode("cids"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )


def _min_shared_bucket() -> F.Column:
    """Join predicate: this bucket is the smallest bucket the two sides
    share — the canonical emission point, so a double-bucket pair joins
    exactly once instead of being collapsed by a later distinct. The
    probe arrays are n_probe ints, so the intersect is O(1) against
    the 64-dim cosine it gates."""
    return F.col("a.cid") == F.array_min(
        F.array_intersect(F.col("a.cids"), F.col("b.cids"))
    )


def knn_graph(
    df: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 2,
) -> DataFrame:
    """Batch kNN GRAPH: top-``k`` cosine neighbors for EVERY vector —
    the all-corpus form of ``ivf_topk``'s single-query search, and the
    workhorse behind embedding-based dedup clustering and
    diversity-aware sampling. Same IVF multi-probe candidate
    restriction as ``embedding_near_dup_pairs`` (shared-bucket
    equi-join, ~n_probe²·n²/c work instead of the n² all-pairs), then
    per-source top-k by exact cosine via a window rank over src.

    The candidate restriction is contract, not hidden recall loss: the
    oracle applies the identical centroid literals and top-n
    assignment, so a neighbor sharing NO probed bucket is out of scope
    for both engines. Ties break on neighbor id; cosine is rounded
    only at the output boundary (ranking compares the engines'
    identical unrounded doubles).

    Scale shape: one equi-join shuffle on cid, a distinct to collapse
    double-bucket candidate pairs, one window shuffle on src — never a
    global sort, never all-pairs.
    """
    from pyspark.sql import Window as W

    cents = ivf_centroids(dim, n_centroids=n_centroids)
    # per-vector norm computed once per (vector, probe) row, not twice
    # per candidate pair; dot unrolled for the known dim — same IEEE
    # fold order, bit-identical; min-shared-bucket emission makes each
    # (src, dst) candidate unique by construction, so the old distinct
    # (a full shuffle of every candidate row) is gone and the cosine
    # runs once per pair instead of once per shared bucket
    # (see embedding_near_dup_pairs)
    base = _probe_base(df, cents, n_probe, id_col, vec_col)
    a, b = base.alias("a"), base.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    cand = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid"))
        & (F.col("a.id") != F.col("b.id"))
        & _min_shared_bucket(),
    ).select(
        F.col("a.id").alias("src"),
        F.col("b.id").alias("dst"),
        cos.alias("_cos"),
    )
    rn = F.row_number().over(
        W.partitionBy("src").orderBy(F.col("_cos").desc(), F.col("dst"))
    )
    return (
        cand.withColumn("rank", rn.cast("bigint"))
        .where(F.col("rank") <= k)
        .select("src", "dst", "rank", F.round("_cos", 6).alias("cos_sim"))
    )
