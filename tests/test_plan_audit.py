"""Global plan-shape invariants over the ENTIRE catalog — the
automated version of the review's anti-pattern scan. Individual
queries get targeted pins in test_plans.py; this sweep guarantees the
invariants hold for every entry, including ones added later.

Invariants:
- no CartesianProduct anywhere (an un-keyed all-pairs join cannot
  survive a 100x scale-up; every pairwise operator must go through a
  bucket/band/digest equi-join);
- no per-row Python UDF eval (BatchEvalPython) anywhere — the catalog
  is expression-only by policy (SURVEY §2.11);
- Arrow-vectorized Python appears ONLY in the disclosed featurizer
  (x1_multimodal_features' mapInPandas);
- GLOBAL-ORDER stages (a SinglePartition exchange feeding a Sort or a
  partition-less Window — the actual scale smell; keyless-aggregate
  SinglePartition exchanges are benign because partial aggregation
  already reduced each partition to one row) appear only in the three
  entries whose docstrings disclose them, so a NEW undisclosed global
  sort fails the suite.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "bench"))

from plan_audit import audit  # noqa: E402

SF = "/root/testdata/sf0.001"

# entries whose docstrings disclose a deliberate global-order stage
GLOBAL_ORDER_ALLOWED = {
    "w8_ntile_deciles",    # exact ntile — the disclosed scale smell
    "w8b_ntile_sampled",   # rank over the LCG SAMPLE only, plan-pinned
    "t15_bigram_lm_score", # partition-less window over the bounded
                           # |alphabet|^2 LM frame (docstring discloses
                           # it is broadcastable at any corpus size)
}


def test_catalog_plan_invariants(spark):
    per_query = audit(spark, SF)
    assert len(per_query) >= 102

    cartesian = [q for q, m in per_query.items() if m["cartesian_products"]]
    assert not cartesian, f"cartesian products in: {cartesian}"

    row_python = [q for q, m in per_query.items() if m["python_row_eval"]]
    assert not row_python, f"per-row Python UDFs in: {row_python}"

    arrow = [q for q, m in per_query.items() if m["python_arrow_eval"]]
    assert arrow == ["x1_multimodal_features"], (
        f"Arrow-Python outside the disclosed featurizer: {arrow}"
    )

    undisclosed = [
        q
        for q, m in per_query.items()
        if m["global_order_stages"] and q not in GLOBAL_ORDER_ALLOWED
    ]
    assert not undisclosed, (
        f"undisclosed global-order stages in: {undisclosed}"
    )
