"""Training-corpus curation operators: benchmark decontamination,
BPE-style pair mining, deterministic stratified sampling.

These are the corpus-level gates a training-data pipeline runs after
dedup (textdedup.py) and quality scoring (the t* catalog entries):
drop documents that leak evaluation benchmarks, mine the merge
candidates a BPE tokenizer would learn first, and draw a reproducible
per-stratum sample. Reference parity: the reference's curation
analogue is its exact set-membership gating before load
(load_stops_to_db.py:73-81); decontamination is the same
membership-gate idea lifted to n-gram granularity at corpus scale.

Everything here is pure DataFrame expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textdedup import word_shingles_from_tokens


def decontaminate(
    df: DataFrame,
    bench_pred: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    flag_frac: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: for every training document (rows
    where ``bench_pred`` is false), count how many of its distinct
    k-word shingles appear anywhere in the benchmark set (rows where
    ``bench_pred`` is true), and flag documents whose overlap fraction
    reaches ``flag_frac`` — the GPT-3-style n-gram overlap
    decontamination check.

    100-TB shape: the benchmark side is an eval corpus — bounded and
    tiny relative to training data — so its distinct-shingle set is
    BROADCAST, as the LEFT side-preserving join: every exploded
    training shingle survives, matched or not, so one map-side-combined
    groupBy on (doc_id) both counts the overlap AND keeps zero-overlap
    documents — no second join back to the document list (the naive
    inner-join-then-left-join shape costs an extra doc_id shuffle and a
    sort-merge join; this plan's only exchanges are the benchmark-side
    distinct and the final count). Training shingles are exploded once;
    the token split is materialized before shingling (see
    word_shingles_from_tokens) so codegen runs it once per row.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        bench_pred.alias("_is_bench"),
        F.split(F.col(text_col), " ").alias("_toks"),
    ).select(
        "doc_id",
        "_is_bench",
        word_shingles_from_tokens(F.col("_toks"), shingle_k).alias("_sh"),
    )
    bench_sh = (
        base.filter(F.col("_is_bench"))
        .select(F.explode("_sh").alias("sh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_sh = base.filter(~F.col("_is_bench")).select(
        "doc_id",
        F.size("_sh").cast("long").alias("n_shingles"),
        F.explode("_sh").alias("sh"),
    )
    counted = (
        train_sh.join(F.broadcast(bench_sh), "sh", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("_hit").alias("n_overlap"))
    )
    frac = F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")
    return counted.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round(frac, 6).alias("contamination_frac"),
        (frac >= F.lit(flag_frac)).cast("long").alias("contaminated"),
    )


def bpe_pair_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies, top-k — the first
    merge-candidate table a BPE tokenizer trainer computes. Bigrams
    keep duplicates (frequency mining, unlike the distinct shingles of
    dedup); ties in count break lexicographically so top-k is a total
    order and engine-reproducible.

    100-TB shape: explode → groupBy(pair) is map-side combined (the
    partial aggregate collapses each task to ~vocab² rows before the
    shuffle), and the top-k is TakeOrdered — no global sort.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        df.select(F.explode(bi).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def domain_rebalance(
    df: DataFrame,
    targets: dict[str, float],
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    precision: int = 1 << 20,
) -> DataFrame:
    """Rebalance the corpus to a target stratum mix by deterministic
    downsampling: per-stratum keep rate ``r_s = K * target_s / count_s``
    with ``K = min_s(count_s / target_s)``, so the binding stratum (the
    one scarcest relative to its target share) is kept WHOLE and every
    other stratum is thinned until the kept mix is proportional to
    ``targets``. Strata absent from ``targets`` are dropped entirely.
    The domain/language-reweighting step every pretraining mix spec
    turns into a pipeline op.

    Row selection reuses the stratified-sampling LCG (see
    stratified_hash_sample — shared verbatim with the SQL oracle) at
    ``precision`` granularity: keep iff ``bucket < floor(r_s *
    precision)``. Rates derive only from the observed counts, so the
    sample is reproducible and resumable.

    100-TB shape: the stratum-count aggregate is map-side combined and
    its output is ~|strata| rows, so the rate table BROADCASTS back
    onto the corpus — the data itself is never shuffled, and the filter
    stays codegen'd."""
    tgt = F.lit(None).cast("double")
    for stratum, weight in sorted(targets.items()):
        tgt = F.when(F.col(strata_col) == stratum, F.lit(float(weight))).otherwise(tgt)
    counts = df.groupBy(strata_col).agg(
        F.count("*").cast("double").alias("_n")
    ).withColumn("_t", tgt)
    # K as a 1-row aggregate broadcast-cross-joined onto the ~|strata|
    # rate rows (a partition-less window would funnel through a single
    # partition and warn; same math, better plan)
    kf = counts.agg(F.min(F.col("_n") / F.col("_t")).alias("_k"))
    rates = counts.crossJoin(F.broadcast(kf)).select(
        strata_col,
        F.floor(F.col("_k") * F.col("_t") / F.col("_n") * F.lit(precision))
        .cast("long")
        .alias("_thr"),
    )
    bucket = F.pmod(
        F.pmod(F.col(id_col) * F.lit(1103515245) + F.lit(12345), F.lit(2147483648)),
        F.lit(precision),
    ).cast("long")
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, int],
    *,
    default_rate: int = 100,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff an LCG hash
    of its id lands below the stratum's percentage rate. Reproducible
    across engines and runs (no RNG state), so the sample is stable
    under re-execution and resumable pipelines — the property random()
    sampling lacks.

    The mixer is a 31-bit LCG step ((id * 1103515245 + 12345) mod 2^31)
    shared verbatim with the SQL oracle. Production note: at 10^10+ ids
    the multiply can exceed int64 — there you'd use xxhash64(id) & mask
    instead; the LCG is chosen here because the oracle engine can
    reproduce it exactly, which xxhash64 cannot.

    100-TB shape: a pure per-row filter — no shuffle, pushdown-friendly,
    and the stratum rates are a CASE expression, not a join.
    """
    bucket = F.pmod(
        F.pmod(F.col(id_col) * F.lit(1103515245) + F.lit(12345), F.lit(2147483648)),
        F.lit(100),
    )
    rate = F.lit(default_rate)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.withColumn("sample_bucket", bucket.cast("long")).filter(
        F.col("sample_bucket") < rate
    )


def split_assignment(
    text_col: str = "text",
    train_pct: int = 90,
    val_pct: int = 5,
) -> Column:
    """Deterministic CONTENT-hash train/val/test split column — the
    reproducibility contract a training pipeline needs: a document
    lands in the same split on every run, every engine, every
    partitioning, because the key is md5(text) (first 8 hex chars as
    an unsigned int, mod 1000). Content- (not id-) keyed so exact
    duplicates land in the SAME split and cannot leak across the
    train/eval boundary — the same leak class decontaminate() gates at
    n-gram granularity.

    100-TB shape: a pure per-row expression — no shuffle, no join, no
    state; the split of any row is computable in isolation, which is
    what makes backfills and resharding safe.
    """
    h = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("bigint")
        % 1000
    )
    return (
        F.when(h < train_pct * 10, "train")
        .when(h < (train_pct + val_pct) * 10, "val")
        .otherwise("test")
    )
