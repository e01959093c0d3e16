"""Property-based check (hypothesis) of the decontamination operator:
for ANY corpus — arbitrary token streams, arbitrary benchmark split,
docs shorter than the shingle width, duplicated texts — the Spark
overlap counts equal a pure-Python brute force over the same shingle
definition. Complements the fixed-corpus oracle parity of
c1_decontamination (which is corpus evidence, not a proof).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.operators.curation import decontaminate

VOCAB = ["a", "b", "c", "d", "e"]
K = 3


def _shingles(text: str) -> set[str]:
    """Python twin of word_shingles_from_tokens: k-grams over the
    space-split tokens, greatest(n-k+1, 1) windows, missing positions
    silently dropped (concat_ws skips nulls)."""
    toks = text.split(" ")
    n_win = max(len(toks) - (K - 1), 1)
    return {
        " ".join(toks[i : i + K]) for i in range(n_win)
    }


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    docs = []
    for i in range(n):
        toks = draw(
            st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12)
        )
        docs.append((i, " ".join(toks)))
    return docs


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpora())
def test_overlap_counts_match_brute_force(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"])
        for r in decontaminate(
            df, F.col("doc_id") % 3 == 0, shingle_k=K, flag_frac=0.2
        ).collect()
    }
    bench = set().union(
        *[_shingles(t) for i, t in docs if i % 3 == 0] or [set()]
    )
    want = {
        i: (len(_shingles(t)), len(_shingles(t) & bench))
        for i, t in docs
        if i % 3 != 0
    }
    assert got == want


# ------------------------------------------------- containment property

def _shingles_k(text: str, k: int) -> set[str]:
    toks = text.split(" ")
    n_win = max(len(toks) - (k - 1), 1)
    return {" ".join(toks[i : i + k]) for i in range(n_win)}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpora())
def test_containment_matches_brute_force(spark, docs):
    """For ANY corpus, containment_pairs with a non-binding df band
    (max_df >= corpus size) equals the pure-Python brute force over
    the same shingle definition: every pair with
    |A∩B| / min(|A|,|B|) > 0 surfaces with exactly that value."""
    from open_bus_gtfs_etl_spark.operators.textdedup import containment_pairs

    k = 3
    want = {}
    for i, (ida, ta) in enumerate(docs):
        sa = _shingles_k(ta, k)
        for idb, tb in docs[i + 1:]:
            sb = _shingles_k(tb, k)
            inter = len(sa & sb)
            if inter:
                lo, hi = sorted((ida, idb))
                want[(lo, hi)] = round(inter / min(len(sa), len(sb)), 6)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(
            df, shingle_k=k, min_df=2, max_df=len(docs), threshold=0.0
        ).collect()
    }
    assert got == want, f"containment mismatch: {got} vs {want}"
