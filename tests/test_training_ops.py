"""Training-data operators: dedup family, similarity search, multimodal
plumbing — plus reference-parity scalar functions on the GTFS-shaped
mini-fixture (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.functions import scalars
from open_bus_gtfs_etl_spark.operators import multimodal, similarity, textdedup

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# --------------------------------------------------------------- text dedup

def test_exact_dedup(spark):
    d = _docs(spark)
    out = textdedup.exact_dedup(d)
    assert out.count() == d.select(F.md5(F.lower("text"))).distinct().count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == d.count()


def test_minhash_lsh_finds_planted_dups(spark):
    d = _docs(spark).limit(200)
    # plant near-duplicates: copy of each doc with one appended token
    dup = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" extratoken")).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(dup)
    cand = textdedup.minhash_lsh_candidates(corpus, num_hashes=32, bands=8)
    verified = textdedup.jaccard_pairs(corpus, cand)
    strong = verified.where(F.col("jaccard") > 0.7)
    found = {
        (r.id_a, r.id_b) for r in strong.collect()
    }
    planted = {(r.doc_id, r.doc_id + 100000) for r in d.select("doc_id").collect()}
    recall = len(found & planted) / len(planted)
    assert recall > 0.9, f"LSH recall too low: {recall}"
    # precision of verified-strong pairs against true jaccard is 1.0 by
    # construction (verification stage computes exact jaccard)


def test_minhash_lsh_deterministic(spark):
    d = _docs(spark).limit(100).select("doc_id", "text")
    a = sorted(map(tuple, textdedup.minhash_lsh_candidates(d).collect()))
    b = sorted(map(tuple, textdedup.minhash_lsh_candidates(d).collect()))
    assert a == b


def test_simhash_near_dups(spark):
    d = _docs(spark).limit(150).select("doc_id", "text")
    dup = d.select((F.col("doc_id") + 100000).alias("doc_id"), F.col("text"))
    corpus = d.unionByName(dup)
    pairs = textdedup.simhash_near_dups(corpus, max_hamming=3)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(r.doc_id, r.doc_id + 100000) for r in d.select("doc_id").collect()}
    # exact copies have hamming 0 → every planted pair must be found
    assert planted <= found


def test_simhash_structural_recall_adversarial_pair(spark):
    """A hamming-9 pair with every 8-bit block corrupted: the old
    (n_blocks=8, combo_m=1) config PROVABLY misses it (no shared block
    → no candidate, despite passing the hamming ≤ 12 filter); the d4
    production config (16 blocks, 2-block combination keys, structural
    radius 14) must find it."""
    bits = [0, 1, 8, 16, 24, 32, 40, 48, 56]  # touches all 8 8-bit blocks
    sig_b = sum(1 << b for b in bits)
    df = spark.createDataFrame([(1, 0), (2, sig_b)], "doc_id long, sig long")
    old = textdedup.simhash_candidates(
        df, sig_col="sig", max_hamming=12, n_blocks=8, combo_m=1
    )
    assert old.count() == 0
    new = textdedup.simhash_candidates(
        df, sig_col="sig", max_hamming=12, n_blocks=16, combo_m=2
    )
    rows = new.collect()
    assert len(rows) == 1 and rows[0].hamming == 9


def test_simhash_combo_worst_case_spread_within_radius(spark):
    """Hamming 12 spread over 12 DISTINCT 4-bit blocks — the worst
    placement inside the filter. (16,2) leaves 4 clean blocks ≥ 2, so
    the pair is structurally guaranteed."""
    sig_b = sum(1 << (4 * i) for i in range(12))
    df = spark.createDataFrame([(1, 0), (2, sig_b)], "doc_id long, sig long")
    rows = textdedup.simhash_candidates(
        df, sig_col="sig", max_hamming=12, n_blocks=16, combo_m=2
    ).collect()
    assert len(rows) == 1 and rows[0].hamming == 12


def test_simhash_combo_radius_boundary(spark):
    """Radius formula is exact: 15 errors in 15 distinct 4-bit blocks
    leave 1 clean block < combo_m=2 → outside the (16,2) radius of 14,
    missed; (16,1) has radius 15 and still finds it."""
    sig_b = sum(1 << (4 * i) for i in range(15))
    df = spark.createDataFrame([(1, 0), (2, sig_b)], "doc_id long, sig long")
    miss = textdedup.simhash_candidates(
        df, sig_col="sig", max_hamming=15, n_blocks=16, combo_m=2
    )
    assert miss.count() == 0
    hit = textdedup.simhash_candidates(
        df, sig_col="sig", max_hamming=15, n_blocks=16, combo_m=1
    )
    rows = hit.collect()
    assert len(rows) == 1 and rows[0].hamming == 15


def test_lsh_bucket_cap_degenerate_corpus(spark):
    """Adversarial: 500 identical docs put all rows in one bucket per
    band — quadratic (125k pairs) without a cap. With the cap the join
    completes with zero pairs and the drop is surfaced, never silent."""
    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact text repeated across every single document here").alias("text"),
    )
    dropped = {}
    cand = textdedup.minhash_lsh_candidates(d, max_bucket_size=50, dropped=dropped)
    assert cand.count() == 0
    assert dropped["n_dropped_buckets"] == 8  # one degenerate bucket per band
    assert dropped["n_dropped_rows"] == 500 * 8
    # a mixed corpus: the sane part still pairs up, only the degenerate
    # bucket is excluded
    sane = _docs(spark).limit(100).select("doc_id", "text")
    dup = sane.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    mixed = d.unionByName(sane).unionByName(dup)
    dropped2 = {}
    cand2 = textdedup.minhash_lsh_candidates(mixed, max_bucket_size=50, dropped=dropped2)
    found = {(r.id_a, r.id_b) for r in cand2.collect()}
    planted = {(r.doc_id, r.doc_id + 100000) for r in sane.select("doc_id").collect()}
    assert planted <= found
    assert dropped2["n_dropped_buckets"] >= 8


def test_simhash_bucket_cap(spark):
    d = spark.range(300).select(
        F.col("id").alias("doc_id"), F.lit("identical words everywhere always").alias("text")
    )
    dropped = {}
    pairs = textdedup.simhash_candidates(d, max_bucket_size=20, dropped=dropped)
    assert pairs.count() == 0
    assert dropped["n_dropped_buckets"] == 4 and dropped["n_dropped_rows"] == 300 * 4


# --------------------------------------------------------------- similarity

def test_embedding_near_dup_multi_probe_boundary_pair(spark):
    """A planted centroid-boundary pair: two blends of centroids c_i
    and c_j whose top-1 assignments DIFFER (one leans i, the other j)
    while their top-2 sets overlap and their cosine is ~0.92. Single
    probe is structurally blind to it; n_probe=2 must find it."""
    from open_bus_gtfs_etl_spark.operators.similarity import (
        ivf_centroids,
        nearest_centroids,
    )

    dim, k = 64, 8
    cents = ivf_centroids(dim, n_centroids=k)
    ci, cj = cents[2], cents[5]
    v1 = [0.6 * a + 0.4 * b for a, b in zip(ci, cj)]
    v2 = [0.4 * a + 0.6 * b for a, b in zip(ci, cj)]
    # preconditions asserted, not assumed: top-1 differs, top-2 overlap
    t1, t2 = nearest_centroids(v1, cents, 2), nearest_centroids(v2, cents, 2)
    assert t1[0] != t2[0] and set(t1) & set(t2)
    import math

    d12 = sum(a * b for a, b in zip(v1, v2))
    cos = d12 / (
        math.sqrt(sum(a * a for a in v1)) * math.sqrt(sum(b * b for b in v2))
    )
    assert cos > 0.465
    df = spark.createDataFrame(
        [(1, v1), (2, v2)], "vec_id long, embedding array<double>"
    )
    miss = similarity.embedding_near_dup_pairs(df, threshold=0.465, n_probe=1)
    assert miss.count() == 0
    hit = similarity.embedding_near_dup_pairs(df, threshold=0.465, n_probe=2)
    rows = hit.collect()
    assert len(rows) == 1
    assert (rows[0].id_a, rows[0].id_b) == (1, 2)
    assert abs(rows[0].cos_sim - round(cos, 6)) < 1e-6


def test_brute_force_topk_self_nearest(spark):
    em = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = em.where(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    top = similarity.brute_force_topk(em, [float(x) for x in q], k=5)
    rows = top.collect()
    assert rows[0].vec_id == 7 and abs(rows[0].cos_sim - 1.0) < 1e-9


def test_lsh_topk_approximates_brute_force(spark):
    em = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in em.where(F.col("vec_id") == 7).collect()[0].embedding]
    exact = [r.vec_id for r in similarity.brute_force_topk(em, q, k=10).collect()]
    approx = similarity.lsh_topk(em, q, k=10, n_planes=4, n_tables=8)
    got = [r.vec_id for r in approx.collect()]
    # the query's own vector must collide with itself in every table
    assert exact[0] == got[0] == 7
    # decent overlap with the exact top-10
    assert len(set(exact) & set(got)) >= 3


def test_ivf_topk_matches_bucket_restricted_exact(spark):
    """IVF top-k must equal brute force restricted to the probed
    buckets (definitionally), and overlap decently with the global
    exact top-10 on this corpus."""
    em = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in em.where(F.col("vec_id") == 0).collect()[0].embedding]
    body = em.where(F.col("vec_id") != 0)
    approx = similarity.ivf_topk(body, q, k=10, n_centroids=8, n_probe=2)
    got = [r.vec_id for r in approx.collect()]
    cents = similarity.ivf_centroids(len(q), 8)
    probes = similarity.nearest_centroids(q, cents, 2)
    restricted = body.where(similarity.assign_centroid("embedding", cents).isin(probes))
    exact_restricted = [
        r.vec_id
        for r in similarity.cosine_to_query(restricted, q)
        .withColumn("cos_sim", F.round("cos_sim", 6))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
        .collect()
    ]
    assert got == exact_restricted
    exact_global = [
        r.vec_id for r in similarity.brute_force_topk(body, q, k=10).collect()
    ]
    assert len(set(got) & set(exact_global)) >= 3


def test_lsh_topk_max_candidates_surfaced(spark):
    em = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in em.where(F.col("vec_id") == 7).collect()[0].embedding]
    dropped = {}
    top = similarity.lsh_topk(
        em, q, k=5, n_planes=2, n_tables=4, max_candidates=20, dropped=dropped
    )
    assert top.count() <= 5
    assert dropped.get("n_dropped_candidates", 0) >= 0  # surfaced either way


# --------------------------------------------------------------- multimodal

def test_multimodal_plumbing(spark):
    media = multimodal.synthesize_media(spark, 300)
    got_shape = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    want_shape = [(f.name, f.dataType.simpleString()) for f in multimodal.MEDIA_SCHEMA.fields]
    assert got_shape == want_shape
    feats = multimodal.decode_and_featurize(media)
    rows = feats.collect()
    assert len(rows) == 300
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic across runs (crc-based fake decode)
    again = {r.media_id: r.payload_sha for r in multimodal.decode_and_featurize(media).collect()}
    assert all(again[r.media_id] == r.payload_sha for r in rows)
    plan = multimodal.frame_sample_plan(media, every_ms=5000)
    vids = media.where("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == vids


# ------------------------------------------------- reference-parity scalars

def test_parse_stop_desc_city(spark):
    rows = [
        ("רחוב: הרצל עיר: תל אביב רציף: 3 קומה:",),
        ("עיר:ירושלים רציף:1",),
        ("garbage no markers",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "stop_desc string")
    got = [r.city for r in df.select(scalars.parse_stop_desc_city(F.col("stop_desc")).alias("city")).collect()]
    assert got == ["תל אביב", "ירושלים", None, None]


def test_gtfs_seconds_day_rollover(spark):
    # 25:30:00 on 2023-06-01 Israel time (IDT, UTC+3) = 2023-06-02 01:30 local = 22:30 UTC
    df = spark.createDataFrame([("2023-06-01", 25 * 3600 + 30 * 60)], "d string, s long")
    got = df.select(
        scalars.gtfs_seconds_to_utc_timestamp(F.col("d"), F.col("s")).alias("ts")
    ).collect()[0].ts
    assert (got.month, got.day, got.hour, got.minute) == (6, 1, 22, 30)


def test_time_to_seconds(spark):
    rows = [("08:30",), ("23:59:59",), ("",), ("xx:yy",), (None,)]
    df = spark.createDataFrame(rows, "t string")
    got = [r.s for r in df.select(scalars.time_to_seconds(F.col("t")).alias("s")).collect()]
    assert got == [30600.0, 86399.0, None, None, None]


def test_route_desc_split_and_misc(spark):
    df = spark.createDataFrame([("10021-1-0",), ("bad",)], "route_desc string")
    mkt, d, alt, failed = scalars.split_route_desc(F.col("route_desc"))
    rows = df.select(mkt, d, alt, failed).collect()
    assert tuple(rows[0]) == ("10021", "1", "0", False)
    assert rows[1].route_desc_parse_failed is True
    misc = spark.createDataFrame([("None", "2024-05-05")], "s string, d string").select(
        scalars.none_string_to_null(F.col("s")).alias("ns"),
        scalars.dated_path(F.col("d")).alias("p"),
        scalars.zpad2(F.lit(7)).alias("z"),
    ).collect()[0]
    assert (misc.ns, misc.p, misc.z) == (None, "2024/05/05", "07")


def test_connected_components_chain_and_star(spark):
    """A 5-chain (diameter 4), a star, and a singleton pair must all
    collapse to min-id components; survivor = min doc_id per cluster."""
    pairs = spark.createDataFrame(
        # chain 10-11-12-13-14, star 20-{21,22,23}, pair 30-31
        [(10, 11), (11, 12), (12, 13), (13, 14),
         (20, 21), (20, 22), (20, 23), (30, 31)],
        "id_a long, id_b long",
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_survivor)
        for r in textdedup.dedup_survivors(pairs).collect()
    }
    for v in (10, 11, 12, 13, 14):
        assert out[v] == (10, v == 10)
    for v in (20, 21, 22, 23):
        assert out[v] == (20, v == 20)
    for v in (30, 31):
        assert out[v] == (30, v == 30)


def test_connected_components_direction_independent(spark):
    """Propagation must flow both ways: min id on the FAR end of an
    edge list written high→low still wins."""
    pairs = spark.createDataFrame([(5, 1), (2, 5), (9, 2)], "id_a long, id_b long")
    comp = textdedup.connected_components(pairs).collect()
    assert {r.component for r in comp} == {1}
    assert {r.id for r in comp} == {1, 2, 5, 9}


def test_connected_components_max_iter_raises(spark):
    import pytest

    # diameter 4 cannot converge in 1 round — must raise, never return
    # half-propagated labels
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        textdedup.connected_components(pairs, max_iter=1)


# ----------------------------------------------------------------- curation

def test_decontaminate_planted_leak(spark):
    """A train doc that copies a benchmark doc verbatim scores 100%
    contamination; a token-disjoint doc appears with zero overlap
    (the left join keeps clean docs in the output)."""
    from open_bus_gtfs_etl_spark.operators import curation

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, bench_text),          # benchmark (id % 2 == 0)
        (1, bench_text),          # verbatim leak
        (3, "one two three four five six seven eight nine ten"),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.decontaminate(
        df, F.col("doc_id") % 2 == 0, shingle_k=5, flag_frac=0.2
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_overlap"] == got[1]["n_shingles"] > 0
    assert got[1]["contaminated"] == 1
    assert got[3]["n_overlap"] == 0 and got[3]["contaminated"] == 0


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must be the broadcast side — at scale
    the training explode is unboundedly large and must never be."""
    from open_bus_gtfs_etl_spark.operators import curation

    d = _docs(spark)
    out = curation.decontaminate(d, F.col("doc_id") % 97 == 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bpe_pair_mining_tie_break_deterministic(spark):
    """Equal-count pairs order lexicographically, so top-k is a total
    order (engine-reproducible)."""
    from open_bus_gtfs_etl_spark.operators import curation

    df = spark.createDataFrame(
        [(0, "b c"), (1, "a b"), (2, "c d c d")], "doc_id long, text string"
    )
    got = [(r["pair"], r["pair_count"]) for r in curation.bpe_pair_counts(df, top_k=3).collect()]
    assert got == [("c d", 2), ("a b", 1), ("b c", 1)]


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    from open_bus_gtfs_etl_spark.operators import curation

    d = _docs(spark)
    s1 = curation.stratified_hash_sample(d, {"en": 50}, default_rate=80)
    s2 = curation.stratified_hash_sample(d, {"en": 50}, default_rate=80)
    assert sorted(r["doc_id"] for r in s1.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in s2.select("doc_id").collect()
    )
    bad = s1.filter(
        (F.col("lang") == "en") & (F.col("sample_bucket") >= 50)
        | (F.col("lang") != "en") & (F.col("sample_bucket") >= 80)
    ).count()
    assert bad == 0
    # every stratum actually sampled, none emptied
    langs_in = {r["lang"] for r in d.select("lang").distinct().collect()}
    langs_out = {r["lang"] for r in s1.select("lang").distinct().collect()}
    assert langs_out == langs_in


def test_domain_rebalance_binding_stratum_kept_whole(spark):
    """The stratum scarcest relative to its target gets rate 1.0 (all
    rows survive); strata absent from targets drop entirely; the kept
    mix moves toward the target proportions; and the selection is
    deterministic across runs."""
    from open_bus_gtfs_etl_spark.operators import curation

    rows = (
        [(i, "en") for i in range(900)]
        + [(i + 1000, "de") for i in range(100)]
        + [(i + 2000, "xx") for i in range(50)]
    )
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    # targets 50/50 → binding stratum is de (100/0.5 < 900/0.5):
    # all 100 de rows kept, en thinned to ~100
    out = curation.domain_rebalance(d, {"en": 0.5, "de": 0.5})
    kept = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    assert by_lang.get("de") == 100, "binding stratum must be kept whole"
    assert "xx" not in by_lang, "stratum absent from targets must drop"
    assert 70 <= by_lang.get("en", 0) <= 130, "en must thin toward 100"
    out2 = curation.domain_rebalance(d, {"en": 0.5, "de": 0.5})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )


def test_token_chunking_reassembles_documents(spark):
    """Lossless chunking invariant: re-joining every doc's chunks in
    chunk_idx order reproduces the original text exactly, and chunk
    token counts sum to the doc's token count."""
    from open_bus_gtfs_etl_spark.plans.queries import c2_token_chunking

    chunks = c2_token_chunking(spark, SF)
    rebuilt = chunks.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
        ).alias("rebuilt"),
        F.sum("n_chunk_tokens").alias("n_tok"),
    )
    orig = _docs(spark).select(
        "doc_id", "text", F.size(F.split("text", " ")).cast("long").alias("n_orig")
    )
    bad = (
        rebuilt.join(orig, "doc_id")
        .filter((F.col("rebuilt") != F.col("text")) | (F.col("n_tok") != F.col("n_orig")))
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------- containment

def test_containment_detects_doc_in_doc(spark):
    """A short doc fully quoted inside a long one: Jaccard is
    structurally small (≈ |short|/|long|) but containment must be 1.0
    — the signal d2/d3 cannot surface."""
    long_toks = [f"w{i}" for i in range(100)]
    long_text = " ".join(long_toks)
    short_text = " ".join(long_toks[20:40])  # verbatim 20-token quote
    other = " ".join(f"z{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, other)], ["doc_id", "text"]
    )
    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in textdedup.containment_pairs(df, shingle_k=5).collect()
    }
    assert out == {(1, 2): 1.0}
    # the same pair's Jaccard: 16 shared shingles / 96 union ≈ 0.17
    sh = textdedup.jaccard_pairs(
        df, spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    )
    j = sh.collect()[0].jaccard
    assert j < 0.25, f"expected small jaccard for doc-in-doc, got {j}"


def test_containment_df_band_drops_stop_shingles(spark):
    """A boilerplate shingle present in EVERY doc is excluded by the
    max_df cap: pairs sharing ONLY boilerplate surface nothing."""
    boiler = "b1 b2 b3 b4 b5"
    docs = [(i, boiler + " " + " ".join(f"u{i}_{j}" for j in range(30)))
            for i in range(6)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = textdedup.containment_pairs(
        df, shingle_k=5, min_df=2, max_df=3, threshold=0.0
    )
    # every cross-doc shared shingle involves boilerplate tokens; the
    # df cap (3 < 6 docs) removes them from the index entirely
    assert out.count() == 0


def test_split_assignment_stable_and_leak_free(spark):
    """Content-hash split: (a) invariant under row order/partitioning,
    (b) exact duplicate texts land in the SAME split (no leak)."""
    from open_bus_gtfs_etl_spark.operators.curation import split_assignment

    d = _docs(spark).select("doc_id", "text")
    dup = d.limit(40).select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    corpus = d.unionByName(dup)
    split = split_assignment("text", 90, 5)
    a = {r.doc_id: r.s for r in corpus.select("doc_id", split.alias("s")).collect()}
    b = {
        r.doc_id: r.s
        for r in corpus.repartition(17)
        .sortWithinPartitions(F.desc("doc_id"))
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert a == b, "split must be partition/order-invariant"
    for r in dup.select("doc_id").collect():
        assert a[r.doc_id] == a[r.doc_id - 10_000], "duplicate text split leak"


def test_md5lcg_candidate_set_identical_to_duckdb(spark):
    """The d5 shared-randomness contract at its strongest point: the
    Spark md5lcg LSH CANDIDATE pair set (before any Jaccard verify)
    must be bit-identical to the DuckDB banding CTE built from the same
    coefficients — candidate generation itself is oracle-checked, not
    only the verified output."""
    import duckdb

    from open_bus_gtfs_etl_spark.plans.queries_dedup import _build_d5_sql

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    cand = textdedup.minhash_lsh_candidates(
        d, num_hashes=32, bands=8, hash_family="md5lcg"
    )
    got = {(r.id_a, r.id_b) for r in cand.select("id_a", "id_b").collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = set(map(tuple, con.execute(_build_d5_sql(stage="cand")).fetchall()))
    assert got == want and len(got) > 0


def test_md5lcg_family_matches_xxhash64_recall(spark):
    """Both hash families must verify to the same final pair set on the
    driver corpus (the family changes WHICH candidates pay the exact
    Jaccard, never the verified answer when recall is total)."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")

    def verified(fam):
        cand = textdedup.minhash_lsh_candidates(d, hash_family=fam)
        p = textdedup.jaccard_pairs(d, cand).where(F.col("jaccard") > 0.5)
        return {(r.id_a, r.id_b) for r in p.select("id_a", "id_b").collect()}

    assert verified("md5lcg") == verified("xxhash64")


def test_minhash_unknown_family_rejected(spark):
    import pytest

    d = spark.range(1).select(F.lit("a b c").alias("text"), F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="hash_family"):
        textdedup.minhash_lsh_candidates(d, hash_family="bogus").collect()


def test_sampled_ntile_conserves_and_orders(spark):
    """w8b invariants that hold regardless of sampling error: every
    order lands in exactly one bucket (counts conserve), buckets stay
    in 1..10, and the per-bucket max_price is strictly increasing with
    the bucket id (boundary assignment is monotone by construction)."""
    from open_bus_gtfs_etl_spark.plans.queries import w8b_ntile_sampled

    rows = (
        w8b_ntile_sampled(spark, SF)
        .orderBy("decile")
        .collect()
    )
    total = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == total
    assert all(1 <= r.decile <= 10 for r in rows)
    maxes = [r.max_price for r in rows]
    assert maxes == sorted(maxes) and len(set(maxes)) == len(maxes)
