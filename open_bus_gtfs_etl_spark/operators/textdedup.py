"""Near-duplicate detection operators for document-scale corpora:
exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard.

All are pure DataFrame/array-expression programs — no UDFs — so they
stay inside whole-stage codegen and scale by shuffle on bucket keys:
the LSH family turns O(n²) pair comparison into equality joins on
band/bucket keys, which is the only shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ")


def word_shingles(text_col: str, k: int = 3) -> F.Column:
    """Distinct k-word shingles as an array column."""
    toks = _tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )


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


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate candidate pairs.

    signature → split into ``bands`` bands of ``num_hashes/bands`` rows
    → hash each band to a bucket key → explode → self-equality-join on
    (band, bucket). Two documents collide in some band iff their
    estimated Jaccard is high (probability 1-(1-s^r)^b). The join is an
    equi-join on the bucket key, so Catalyst shuffles only (key, id)
    pairs — the scalable path for corpus-scale near-dup.

    Returns (id_a, id_b, n_bands) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(word_shingles(text_col, shingle_k), num_hashes, seed)
    banded = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
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
    candidate set — linear in candidates, not quadratic in corpus."""
    sh = df.select(F.col(id_col).alias("id"), word_shingles(text_col, shingle_k).alias("sh"))
    j = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select("id_a", "id_b", "n_bands", (inter / union).alias("jaccard"))


def simhash(text_col: str = "text", bits: int = 64, seed: int = 11) -> F.Column:
    """64-bit SimHash as a long column: per token, xxhash64 gives the
    bit pattern; the signature bit b is the majority vote over tokens.
    Pure array expressions: for each bit, sum(±1 per token) > 0."""
    toks = _tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))

    def _vote_fn(bit: int):
        # factory closure: PySpark inspects lambda arity, so default-arg
        # binding (lambda acc, h, b=b: ...) would be mis-read as 3-ary
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_fn(b))
        bit = F.shiftleft(
            F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), b
        )
        out = out.bitwiseOR(bit)
    return out


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
    seed: int = 11,
) -> DataFrame:
    """SimHash near-dup pairs via block permutation: split the 64-bit
    signature into ``n_blocks`` 16-bit blocks; by pigeonhole, any pair
    within hamming distance < n_blocks shares at least one exact block
    → equality join per block, then exact hamming filter via
    bit_count(xor). Again: only equi-joins shuffle."""
    sig = simhash(text_col, seed=seed)
    base = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    block_bits = 64 // n_blocks
    mask = (1 << block_bits) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright("sig", i * block_bits).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for i in range(n_blocks)
        ]
    )
    ex = base.select("id", "sig", F.explode(blocks).alias("b")).select(
        "id", "sig", F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
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
