"""Deduplication family (d*: exact, n-gram Jaccard, MinHash-LSH,
SimHash, survivors, edit-distance, passages, containment, overlap)
of the driver-contract query catalog.

Mechanically split out of plans/queries.py (round 5) to keep files
reviewable; naming conventions and the determinism rules for the
value-hash gate are documented in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .base import _t  # noqa: F401



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
    """Pair→cluster→survivor corpus dedup: verified MinHash-LSH pairs
    (exact Jaccard > 0.5 over LSH candidates) are clustered via
    iterative min-id label propagation (connected components — no
    GraphFrames, only equi-joins), and the min doc_id per cluster
    survives. The reference's set-semantics insert-if-absent
    (load_stops_to_db.py:73-81) lifted to the near-dup graph.

    Shared-randomness contract (round-5 upgrade, the d6/e2 pattern):
    the MinHash family here is ``md5lcg`` — md5-derived base hash
    through Carter-Wegman ``(a_i·h + b_i) mod 2^31-1`` with
    coefficients baked from the same seed into BOTH the Spark plan and
    the DuckDB oracle (``_build_d5_sql``), and raw signature-concat
    band buckets. The oracle therefore rebuilds the IDENTICAL candidate
    pair set before verifying and clustering — equality checks the
    whole pipeline including candidate generation, with no
    corpus-dependence caveat."""
    from ..operators import textdedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cand = textdedup.minhash_lsh_candidates(
        d, num_hashes=32, bands=8, hash_family="md5lcg"
    )
    pairs = textdedup.jaccard_pairs(d, cand).where(F.col("jaccard") > 0.5)
    return textdedup.dedup_survivors(pairs).select(
        "doc_id", "cluster_id", "is_survivor"
    )


def _build_d5_sql(
    num_hashes: int = 32, bands: int = 8, seed: int = 7,
    stage: str = "survivors",
) -> str:
    """DuckDB oracle for d5 with the SAME LSH banding as the Spark
    side: identical shingles, identical md5lcg minhash coefficients
    (from ``shared_minhash_coeffs`` — the literals are baked into this
    SQL string at build time), identical raw-concat band buckets →
    identical candidate pairs → exact Jaccard > 0.5 → recursive-CTE
    connected components → min-id survivor per cluster.

    ``stage='cand'`` ends the query at the raw candidate pair set
    instead — used by tests/test_dedup.py to assert the Spark and
    DuckDB candidate sets are IDENTICAL (the contract itself, not just
    the final survivors)."""
    from ..operators.textdedup import _SHARED_P, shared_minhash_coeffs

    rows_per_band = num_hashes // bands
    mins = ",\n         ".join(
        f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {_SHARED_P}))"
        for a, b in shared_minhash_coeffs(num_hashes, seed)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, {key} AS bucket FROM sig".format(
            b=b,
            key=" || ':' || ".join(
                f"sig[{b * rows_per_band + j + 1}]::VARCHAR"
                for j in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    cand_stop = "__CAND_STOP__"
    sql = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
                || ' ' || string_split(text,' ')[i+2]
         )) AS sh
  FROM documents
),
hv AS (
  SELECT doc_id,
         list_transform(sh, s ->
           ('0x' || substr(md5(s),1,15))::BIGINT % {_SHARED_P}) AS hv
  FROM sh
),
sig AS (
  SELECT doc_id,
         [{mins}] AS sig
  FROM hv
),
bands AS (
{band_selects}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
){cand_stop}
base_pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) > 0.5
),
edges AS (
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
    if stage == "cand":
        head, _, _ = sql.partition(cand_stop)
        return head + "\nSELECT id_a, id_b FROM cand"
    return sql.replace(cand_stop, ",")


D5_SQL = _build_d5_sql()


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
