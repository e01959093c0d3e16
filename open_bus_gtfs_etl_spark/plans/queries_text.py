"""Text-quality, curation and tokenization families (t*/c*/v*) of the
driver-contract query catalog.

Mechanically split out of plans/queries.py (round 5) to keep files
reviewable; naming conventions and the determinism rules for the
value-hash gate are documented in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .base import _t  # noqa: F401

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
