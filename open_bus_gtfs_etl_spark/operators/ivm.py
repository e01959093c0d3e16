"""Incremental view maintenance — fold a change batch into a stored
aggregate WITHOUT rescanning the base table.

The reference maintains its daily aggregates by reprocessing the whole
day's file whenever anything changes (the stats dicts rebuilt per run,
open-bus-gtfs-etl load_stops_to_db.py:25,51-63, rolled up in
idempotent_process.py:34-54) — affordable at file scale, a full rescan
at lake scale. This operator is the CDC answer: keep the aggregate's
MERGEABLE STATE (count + sum per group, the classic commutative
monoid), aggregate ONLY the change batch, and combine the two states.
Flink calls the input shape a retract stream; Materialize computes the
same delta-fold over timely dataflow.

100-TB shape: the only data-sized shuffle is the delta's own partial
aggregation (map-side combined, keys+two-longs rows). The combine step
unions two ALREADY-AGGREGATED frames — |groups| rows, not |base| rows
— and re-groups, so maintaining a 10^10-row base costs O(|delta| +
|groups|), never O(|base|). Deletes are signed retractions (+1/-1
count, +v/-v sum), so the same plan absorbs inserts, deletes, and
(delete+insert) updates; a group whose maintained count reaches 0
leaves the view, exactly as a full recompute would drop it.

Caveat (standard for IVM): only self-maintainable aggregates travel as
state this way — SUM/COUNT/AVG(=sum/count) fold; MIN/MAX are not
maintainable under deletes without keeping per-group multisets, so
they are deliberately NOT offered here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# maintained-state columns: signed row count + signed sum
N_COL = "n_rows"
SUM_COL = "sum_value"


def delta_state(
    changes: DataFrame,
    keys: list[str],
    value: Column,
    is_delete: Column,
) -> DataFrame:
    """Partial-aggregate a change batch into signed (count, sum) state:
    inserts contribute (+1, +value), deletes (-1, -value). One
    map-side-combined shuffle over the delta only."""
    sign = F.when(is_delete, F.lit(-1)).otherwise(F.lit(1))
    return changes.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias(N_COL),
        F.sum(value * sign).cast("decimal(28,4)").alias(SUM_COL),
    )


def maintain(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    drop_nonpositive: bool = True,
) -> DataFrame:
    """Fold a signed delta state into the stored view state. Both
    inputs carry (keys, n_rows, sum_value); by default groups whose
    maintained count is no longer positive are dropped (the view
    semantics). ``drop_nonpositive=False`` keeps them — a SINK needs
    the zero-count groups to emit deletes/tombstones instead of
    silently leaving stale rows (streaming/aggregates.py). The union
    re-aggregation touches |groups| + |delta groups| rows — no
    base-table scan."""
    cols = [*keys, N_COL, SUM_COL]
    merged = (
        state.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*keys)
        .agg(
            F.sum(N_COL).cast("bigint").alias(N_COL),
            F.sum(SUM_COL).cast("decimal(28,4)").alias(SUM_COL),
        )
    )
    if drop_nonpositive:
        merged = merged.where(F.col(N_COL) > 0)
    return merged
