"""Property-based check (hypothesis) of changelog serving: for ANY
event log (arbitrary op mix, duplicates, delivery order, batch cuts)
and ANY sync schedule, a replica maintained purely from
``changes_between`` equals the source, and the diff of ANY retained
snapshot pair composes state(v_i) → state(v_j). The shrinkable-random
complement to the fixed scenarios in test_changelog.py.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.operators.maintenance import sync_replica
from open_bus_gtfs_etl_spark.operators.merge import apply_batch
from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

KEYS = [("c0", 0), ("c0", 1), ("c1", 0), ("c2", 0)]
OPS = ["insert", "update", "delete"]


@st.composite
def scenarios(draw):
    n = draw(st.integers(min_value=1, max_value=18))
    events = [
        {"lsn": i, "op": draw(st.sampled_from(OPS)),
         "key": draw(st.sampled_from(KEYS))}
        for i in range(n)
    ]
    order = draw(st.permutations(range(n)))
    n_batches = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(draw(st.lists(
        st.integers(min_value=0, max_value=n),
        min_size=n_batches - 1, max_size=n_batches - 1,
    )))
    # after each batch: sync the replica or skip (arbitrary cadence)
    syncs = draw(st.lists(st.booleans(), min_size=n_batches, max_size=n_batches))
    return events, order, cuts, syncs


def _batch_df(spark, events, idxs):
    rows = []
    for i in idxs:
        e = events[i]
        lsn, (conv, turn), op = e["lsn"], e["key"], e["op"]
        rows.append((
            lsn, op, conv, turn,
            None if op == "delete" else "user",
            None if op == "delete" else f"text-{lsn}",
        ))
    return (
        spark.createDataFrame(
            rows,
            "lsn long, op string, conv_id string, turn_idx int,"
            " role string, text string",
        )
        .withColumn("ts", F.timestamp_seconds(F.col("lsn")))
        .withColumn("tool", F.lit(None).cast("string"))
    )


def _pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(sc=scenarios())
def test_changelog_replica_and_composition(spark, sc):
    events, order, cuts, syncs = sc
    with tempfile.TemporaryDirectory() as tmp:
        src = SnapshotParquetTable.create(
            spark, f"{tmp}/src", TRANSCRIPTS_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=2,
        )
        dst = SnapshotParquetTable.create(
            spark, f"{tmp}/dst", TRANSCRIPTS_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=3,
        )
        bounds = [0, *cuts, len(order)]
        versions = [src.snapshot_id()]
        for b, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            idxs = order[lo:hi]
            if idxs:
                apply_batch(src, _batch_df(spark, events, idxs), batch_id=b)
            versions.append(src.snapshot_id())
            if syncs[b]:
                sync_replica(src, dst)
        sync_replica(src, dst)  # catch up whatever the schedule skipped
        src_state = _pdf(src.read())
        pd.testing.assert_frame_equal(_pdf(dst.read()), src_state,
                                      check_dtype=False)

        # composition: the diff between the earliest and latest snapshot
        # folds state(v_lo) into state(v_hi)
        v_lo, v_hi = versions[0], versions[-1]
        ch = src.changes_between(v_lo, v_hi).toPandas()
        state = {
            (r.conv_id, r.turn_idx): r
            for r in _pdf(src.read_at(v_lo)).itertuples(index=False)
        }
        for r in ch.to_dict("records"):
            k = (r["conv_id"], r["turn_idx"])
            if r["op"] == "delete":
                state.pop(k, None)
            else:
                state[k] = r
        cols = src.manifest()["user_cols"]
        folded = (
            pd.DataFrame(
                [
                    {c: (getattr(v, c) if not isinstance(v, dict) else v[c])
                     for c in cols}
                    for v in state.values()
                ],
                columns=cols,
            )
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(folded, src_state, check_dtype=False)
