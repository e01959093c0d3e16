"""Embedding / similarity / multimodal families (e*/x*) of the
driver-contract query catalog.

Mechanically split out of plans/queries.py (round 5) to keep files
reviewable; naming conventions and the determinism rules for the
value-hash gate are documented in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .base import _t  # noqa: F401

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
