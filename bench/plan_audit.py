"""Catalog-wide physical-plan audit: build (never execute) every
oracle-paired query and record the plan-shape facts the scale review
cares about — shuffle count, sort count, join strategy, Python-eval
nodes, cartesian products. tests/test_plan_audit.py enforces the
global invariants; this script emits the full per-query artifact so a
reviewer can see the plan shape of all 102 entries at a glance instead
of spot-checking.

Planning is Catalyst/AQE-initial only (no Spark jobs run), so the
sweep costs seconds and is safe to run alongside timed benchmarks.

Usage: python bench/plan_audit.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# node names whose presence/count we record per query
COUNTED = {
    "exchanges": r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)",
    "single_partition_exchanges": r"\bExchange SinglePartition",
    "sorts": r"\bSort \[",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "shuffled_hash_joins": r"\bShuffledHashJoin\b",
    "broadcast_nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "cartesian_products": r"\bCartesianProduct\b",
    # per-row Python UDF eval — the anti-pattern; must be zero everywhere
    "python_row_eval": r"\bBatchEvalPython\b",
    # Arrow-vectorized Python (pandas_udf / mapInPandas) — allowed only
    # where disclosed (x1's featurizer)
    "python_arrow_eval": r"\bArrowEvalPython\b|\bMapInPandas\b",
    "window_nodes": r"\bWindow \[|\bWindowExec\b|\bWindowGroupLimit\b",
    "generates": r"\bGenerate\b",
    "whole_stage_codegen": r"\bWholeStageCodegen\b",
}


def _global_order_stages(plan: str) -> int:
    """Count SinglePartition exchanges that feed a Sort or a
    partition-less Window — a GLOBAL ORDER over whatever flows in, the
    actual scale smell. A SinglePartition exchange under a keyless
    HashAggregate is benign: partial aggregation has already reduced
    each partition to one row before the shuffle."""
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln and i > 0:
            parent = lines[i - 1]
            if re.search(r"\bSort \[|\bWindow \[", parent):
                n += 1
    return n


def audit(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    from open_bus_gtfs_etl_spark.plans.queries import QUERIES

    out: dict[str, dict[str, int]] = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = {
            k: len(re.findall(pat, plan)) for k, pat in COUNTED.items()
        }
        out[name]["global_order_stages"] = _global_order_stages(plan)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "bench", "plan_audit.json")
    )
    from open_bus_gtfs_etl_spark.session import get_spark

    spark = get_spark(
        app_name="plan-audit",
        master="local[2]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    per_query = audit(spark, sf_dir)
    totals = {
        k: sum(q[k] for q in per_query.values())
        for k in [*COUNTED, "global_order_stages"]
    }
    rec = {"sf_dir": sf_dir, "n_queries": len(per_query),
           "totals": totals, "per_query": per_query}
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"n_queries": len(per_query), "totals": totals,
                      "out": out_path}))


if __name__ == "__main__":
    main()
