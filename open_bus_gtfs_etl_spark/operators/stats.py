"""Exact distribution statistics for corpus/metric profiling.

The profile pass a curation pipeline runs before picking thresholds
(length cuts, quality floors): exact order statistics and exact
moments, computed so the SAME number comes out of any engine and any
partitioning — approx_percentile/percentile interpolation internals
and float summation order are engine- and partition-dependent;
nearest-rank selection and exact decimal power sums are not.
Reference-parity note: the reference's stats surface is its row
counters (load_stops_to_db.py:51-63); this generalizes them to the
distribution level without leaving one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    pcts: list[int],
) -> DataFrame:
    """Exact per-group quantiles under the NEAREST-RANK definition:
    the value at row_number == ceil(pct/100 · n) within the group's
    (value, tiebreak) total order. The ceil is INTEGER arithmetic
    ((n·pct + 99) DIV 100) — 0.95·n in binary float lands epsilon
    above exact integers and flips a float ceil to the wrong rank
    (n=20: ceil(0.95·20) must be 19, float gives 20).

    Scale shape: one partition-local sort per group (what any exact
    order statistic costs), all requested ranks selected in the same
    pass and pivoted by conditional aggregation — no global sort, no
    per-pct rescan. Returns one row per group with a ``p{pct}`` double
    column per requested pct.
    """
    w = W.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    n = F.count(F.lit(1)).over(W.partitionBy(group_col))
    ranked = df.select(
        group_col,
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        n.alias("_n"),
    )

    def _rank(pct: int) -> F.Column:
        return F.expr(f"(_n * {pct} + 99) DIV 100")

    keep = None
    for pct in pcts:
        cond = F.col("_rn") == _rank(pct)
        keep = cond if keep is None else (keep | cond)
    return (
        ranked.filter(keep)
        .groupBy(group_col)
        .agg(
            *[
                F.max(F.when(F.col("_rn") == _rank(pct), F.col("_v"))).alias(
                    f"p{pct}"
                )
                for pct in pcts
            ]
        )
    )
