"""Near-duplicate detection operators for document-scale corpora:
exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard.

All are pure DataFrame/array-expression programs — no UDFs — so they
stay inside whole-stage codegen and scale by shuffle on bucket keys:
the LSH family turns O(n²) pair comparison into equality joins on
band/bucket keys, which is the only shape that survives 100 TB.

Degenerate-bucket protection: a bucket holding N near-identical
documents makes the self-join quadratic in N. Both LSH paths accept
``max_bucket_size``; oversized buckets are EXCLUDED from the pair join
and surfaced (never silently) via the ``dropped`` out-param — the
standard recipe is exact-dedup first (collapses identical docs), then
LSH with a cap as the backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def word_shingles_from_tokens(toks: F.Column, k: int = 3) -> F.Column:
    """Distinct k-word shingles from a pre-materialized token array.

    Taking the token ARRAY (not the text) matters for performance: if
    ``split(text)`` is inlined here, codegen re-evaluates the split for
    every element_at — O(k · n_tokens) splits per row. Bind the split
    to a column once and shingling is a single pass.

    Documents shorter than ``k`` tokens yield ONE shingle: the whole
    document (``try_element_at`` nulls the missing positions and
    concat_ws skips them) — plain ``element_at`` would throw
    ArrayIndexOutOfBounds under ANSI mode on the single clamped window
    (found by the hypothesis property test, not by the driver corpora,
    whose docs are all ≥10 tokens). The SQL oracles keep the plain
    ``toks[i] ||`` form, which corpus-guaranteed full windows make
    equivalent.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + F.lit(j)) for j in range(k)]
            ),
        )
    )


def word_shingles(text_col: str, k: int = 3) -> F.Column:
    """Distinct k-word shingles as an array column (expression form;
    prefer materializing the token array and using
    ``word_shingles_from_tokens`` in hot paths)."""
    return word_shingles_from_tokens(_tokens(text_col), k)


def _shingle_frame(df: DataFrame, text_col: str, id_col: str, shingle_k: int) -> DataFrame:
    """(id, sh) with the token split materialized exactly once per row."""
    return df.select(
        F.col(id_col).alias("id"), _tokens(text_col).alias("_toks")
    ).select("id", word_shingles_from_tokens(F.col("_toks"), shingle_k).alias("sh"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content hash group-by: one survivor (min id) per
    normalized content. Partial aggregation makes this a single
    map-combined shuffle of (hash, id) pairs — never the text itself."""
    h = F.md5(F.lower(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("survivor"), F.count("*").alias("n_copies"))
    )


def minhash_signature(shingles: F.Column, num_hashes: int = 32, seed: int = 7) -> F.Column:
    """MinHash signature as an array<long>: for hash function i, the min
    over shingles of xxhash64(shingle, i). Array expression — evaluated
    per row inside codegen, no UDF, no shuffle."""
    def _hash_fn(i: int):
        return lambda s: F.xxhash64(s, F.lit(seed + i))

    return F.array(
        *[F.array_min(F.transform(shingles, _hash_fn(i))) for i in range(num_hashes)]
    )


def _cap_buckets(
    exploded: DataFrame,
    bucket_cols: list[str],
    max_bucket_size: int | None,
    dropped: dict | None,
) -> DataFrame:
    """Exclude buckets larger than ``max_bucket_size`` from the pair
    join, recording how much was dropped (no silent caps). The size
    count is a map-side-combined aggregation over key columns only."""
    if max_bucket_size is None:
        return exploded
    sizes = exploded.groupBy(*bucket_cols).agg(F.count("*").alias("_bsz"))
    kept = exploded.join(
        sizes.where(F.col("_bsz") <= max_bucket_size).select(*bucket_cols),
        bucket_cols,
        "left_semi",
    )
    if dropped is not None:
        over = sizes.where(F.col("_bsz") > max_bucket_size).agg(
            F.count("*").alias("nb"), F.sum("_bsz").alias("nr")
        ).collect()[0]
        dropped["n_dropped_buckets"] = int(over["nb"] or 0)
        dropped["n_dropped_rows"] = int(over["nr"] or 0)
    return kept


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 7,
    max_bucket_size: int | None = None,
    dropped: dict | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate candidate pairs.

    signature → split into ``bands`` bands of ``num_hashes/bands`` rows
    → hash each band to a bucket key → explode → self-equality-join on
    (band, bucket). Two documents collide in some band iff their
    estimated Jaccard is high (probability 1-(1-s^r)^b). The join is an
    equi-join on the bucket key, so Catalyst shuffles only (key, id)
    pairs — the scalable path for corpus-scale near-dup.

    ``max_bucket_size`` drops degenerate buckets (N identical docs go
    quadratic) and reports the drop through ``dropped``.

    Returns (id_a, id_b, n_bands) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    base = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("_toks"))
    sig = minhash_signature(
        word_shingles_from_tokens(F.col("_toks"), shingle_k), num_hashes, seed
    )
    banded = base.select("id", sig.alias("sig"))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ":",
                        *[
                            F.element_at("sig", b * rows_per_band + j + 1).cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    exploded = banded.select("id", F.explode(band_arr).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    exploded = _cap_buckets(exploded, ["band", "bucket"], max_bucket_size, dropped)
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands"))
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Verify candidate pairs with exact shingle Jaccard (the second
    stage of the classic LSH pipeline). Joins text back only for the
    candidate set — linear in candidates, not quadratic in corpus.
    Keeps any extra columns the candidate frame carries (n_bands,
    hamming, ...)."""
    sh = _shingle_frame(df, text_col, id_col, shingle_k)
    extra = [c for c in candidates.columns if c not in ("id_a", "id_b")]
    j = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select("id_a", "id_b", *extra, (inter / union).alias("jaccard"))


_BIT_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]


def simhash(text_col: str = "text", bits: int = 64, seed: int = 11) -> F.Column:
    """64-bit SimHash as a long column: per token, xxhash64 gives the
    bit pattern; the signature bit b is the majority vote over tokens.

    Single-pass formulation: ONE aggregate over the token-hash array
    carries a 64-long vote vector (zip_with against a bit-mask array
    literal), so each token hash is computed and scanned exactly once —
    the round-1 version ran 64 independent aggregates, re-evaluating
    xxhash64 per bit (64× the hashing work)."""
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS[:bits]])
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    hashes = F.transform(_tokens(text_col), lambda t: F.xxhash64(t, F.lit(seed)))
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(h.bitwiseAND(m) != 0, F.lit(1).cast("long")).otherwise(
                F.lit(-1).cast("long")
            ),
        ),
    )
    sig_bits = F.zip_with(
        votes,
        masks,
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        sig_bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def simhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
    seed: int = 11,
    max_bucket_size: int | None = None,
    dropped: dict | None = None,
    combo_m: int = 1,
    sig_col: str | None = None,
) -> DataFrame:
    """SimHash candidate pairs via multi-block combination keys (the
    Manku/Jain/Sarma WWW'07 permuted-table scheme expressed as an
    equi-join): split the 64-bit signature into ``n_blocks`` blocks and
    key each document on every size-``combo_m`` combination of block
    values (C(n_blocks, combo_m) keys per doc, packed into one long).

    STRUCTURAL recall guarantee (pigeonhole): ``h`` differing bits
    corrupt at most ``h`` blocks, leaving ≥ n_blocks − h clean — so any
    pair within hamming distance ≤ ``n_blocks − combo_m`` shares at
    least one clean combination key and is guaranteed a candidate.
    Candidate recall is structural iff
    ``max_hamming ≤ n_blocks − combo_m``; the final exact hamming
    filter (bit_count(xor)) then makes precision exact.

    Scale trade (uniform-signature expectation): keys per doc =
    C(n_blocks, combo_m); expected candidate pairs ≈
    C(n_blocks, combo_m) · n² / 2^(combo_m·64/n_blocks). Larger
    ``combo_m`` buys key selectivity at the cost of explode fan-out:
    (8,1) → radius 7, 8-bit keys, 8/doc; (16,2) → radius 14, 8-bit
    keys, 120/doc; (16,4) → radius 12, 16-bit keys, 1820/doc. Large
    hamming radii are intrinsically expensive for LSH — prefer the
    smallest (n_blocks, combo_m) whose radius covers ``max_hamming``,
    exact-dedup first, and ``max_bucket_size`` as the degenerate-corpus
    backstop. Only equi-joins shuffle, and only (id, key, sig) rows —
    never text.

    ``sig_col``: use a precomputed long signature column instead of
    hashing ``text_col`` (testing / signature reuse across calls).
    Returns (id_a, id_b, hamming).
    """
    from itertools import combinations

    if not 1 <= combo_m < n_blocks:
        raise ValueError(f"combo_m must be in [1, n_blocks), got {combo_m}")
    sig = F.col(sig_col).cast("long") if sig_col else simhash(text_col, seed=seed)
    base = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    block_bits = 64 // n_blocks
    mask = (1 << block_bits) - 1

    def blk_val(i: int) -> F.Column:
        return F.shiftright("sig", i * block_bits).bitwiseAND(F.lit(mask))

    def combo_key(combo: tuple[int, ...]) -> F.Column:
        # pack the m block values into one long — always fits:
        # combo_m · block_bits = combo_m · 64/n_blocks ≤ 64
        key = blk_val(combo[0])
        for i in combo[1:]:
            key = F.shiftleft(key, block_bits) + blk_val(i)
        return key

    combos = list(combinations(range(n_blocks), combo_m))
    keys = F.array(
        *[
            F.struct(F.lit(ci).alias("blk"), combo_key(c).alias("val"))
            for ci, c in enumerate(combos)
        ]
    )
    ex = base.select("id", "sig", F.explode(keys).alias("b")).select(
        "id", "sig", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    ex = _cap_buckets(ex, ["blk", "val"], max_bucket_size, dropped)
    a, b = ex.alias("a"), ex.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(ham <= max_hamming)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.min(ham).alias("hamming"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of the verified near-dup pair graph via
    iterative min-id label propagation — the pair→cluster step corpus
    dedup needs before it can DROP rows (the reference's set-semantics
    insert-if-absent, load_stops_to_db.py:73-81, lifted to the near-dup
    graph). No GraphFrames: plain equi-joins and aggregations.

    Per round each vertex takes ``min(own label, neighbor labels)``;
    labels converge to the component's minimum id in O(diameter)
    rounds, and near-dup clusters are tiny/star-shaped (diameter ≤ a
    few), so 2-3 rounds settle real corpora. Each round is one
    edges⋈labels shuffle — O(E) work, map-side-combined min per vertex.
    Lineage is truncated every round (``localCheckpoint``) so the plan
    stays O(1)-deep instead of growing per iteration; at cluster scale
    point ``spark.sparkContext.setCheckpointDir`` at durable storage
    and swap in ``checkpoint`` for executor-loss recovery.

    Returns (id, component) for every vertex appearing in ``pairs``,
    where component = min id of the connected component. Raises if not
    converged after ``max_iter`` rounds (never returns half-propagated
    labels silently).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min over incoming neighbor labels, then min with own label
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("_n_min"))
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("_n_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter — raise it)"
    )


def dedup_survivors(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Survivor selection over the near-dup pair graph: cluster via
    ``connected_components``, keep the deterministic min-id doc per
    cluster. Returns (doc_id, cluster_id, is_survivor) for every doc in
    the pair graph; docs NOT in any pair are implicitly their own
    survivors (anti-join this frame's non-survivors to drop rows)."""
    comp = connected_components(pairs, id_a, id_b, max_iter)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
    seed: int = 11,
    max_bucket_size: int | None = None,
    dropped: dict | None = None,
) -> DataFrame:
    """Back-compat alias of ``simhash_candidates`` (id_a, id_b, hamming)."""
    return simhash_candidates(
        df, text_col, id_col, max_hamming, n_blocks, seed, max_bucket_size, dropped
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    min_df: int = 2,
    max_df: int = 100,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs:
    |A∩B| / min(|A|, |B|) over distinct ``shingle_k``-token shingles —
    the doc-in-doc signal Jaccard structurally under-scores (a short
    doc fully quoted inside a long one has Jaccard ≈ |short|/|long|
    but containment 1.0). Reference-parity note: the reference's dedup
    guarantee is exact whole-row set membership
    (load_stops_to_db.py:73-81); containment generalizes it to
    sub-document granularity.

    Plan (inverted index, never all-pairs): shingles shuffle as md5
    digests (fixed 32-byte keys, never text); a document-frequency
    band drops singleton shingles (df < ``min_df`` cannot produce a
    pair) and stop-shingles with df > ``max_df`` — the boilerplate
    keys whose self-join fan-out is quadratic in df. Candidates come
    from the digest self-join grouped by (doc_a, doc_b); denominators
    are FULL per-doc distinct-shingle counts, so a surfaced pair's
    containment is exact unless some of its shared shingles fell to
    the df band (under-count, disclosed by the caller's max_df pick).
    Returns (doc_a, doc_b, containment) with containment rounded to 6
    and filtered > ``threshold``.
    """
    sh = (
        _shingle_frame(df, text_col, id_col, shingle_k)
        .select(F.col("id").alias("_id"), F.explode("sh").alias("_s"))
        .select("_id", F.md5("_s").alias("_psg"))
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n_sh"))
    df_band = (
        sh.groupBy("_psg")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter((F.col("_nd") >= min_df) & (F.col("_nd") <= max_df))
        .select("_psg")
    )
    indexed = sh.join(df_band, "_psg")
    a = indexed.select(F.col("_id").alias("doc_a"), "_psg")
    b = indexed.select(F.col("_id").alias("doc_b"), "_psg")
    pairs = (
        a.join(b, "_psg")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("_n_sh").alias("_na"))
    sb = sizes.select(F.col("_id").alias("doc_b"), F.col("_n_sh").alias("_nb"))
    cont = F.round(
        F.col("_inter").cast("double") / F.least("_na", "_nb").cast("double"), 6
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", cont.alias("containment"))
        .filter(F.col("containment") > threshold)
    )
