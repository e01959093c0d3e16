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
) -> DataFrame:
    """Approximate top-k: score only vectors that share an LSH bucket
    with the query in at least one of ``n_tables`` hash tables.

    At corpus scale the signature computation is a narrow map; the
    candidate restriction is a broadcast-able semi-join on (table,
    bucket); only candidates pay the cosine. Recall rises with
    n_tables, cost with bucket size — the standard knobs.
    """
    dim = len(query)
    cand = None
    spark = df.sparkSession
    qdf = spark.createDataFrame([(query,)], "q array<double>")
    for t in range(n_tables):
        sig = hyperplane_signature(vec_col, dim, n_planes, seed + 1000 * t)
        qsig_row = qdf.select(
            hyperplane_signature("q", dim, n_planes, seed + 1000 * t).alias("s")
        ).collect()[0]["s"]
        this = df.where(sig == F.lit(qsig_row))
        cand = this if cand is None else cand.unionByName(this)
    cand = cand.dropDuplicates([id_col])
    return brute_force_topk(cand, query, k, vec_col, id_col)
