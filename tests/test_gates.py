"""Reference-parity ingestion gates: segment completeness (S8),
plausibility threshold (A3), staleness tolerance (J10), newest-first
work ordering (W2).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from open_bus_gtfs_etl_spark.genlog import generate_events, validate_segment, write_wal
from open_bus_gtfs_etl_spark.operators.merge import (
    StaleResumeError,
    apply_batch,
    replay_wal,
)
from open_bus_gtfs_etl_spark.oracle import fold_events
from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable
from open_bus_gtfs_etl_spark.streaming.lineage import LineageLog


def _mk(spark, tmp_path, name="lake"):
    return SnapshotParquetTable.create(
        spark, str(tmp_path / name), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )


def _final(table):
    return (
        table.read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_truncated_segment_rejected_not_merged(tmp_path, spark):
    ev = generate_events(spark, 3000, n_conv=60, seed=51, seg_size=1000,
                         v2_start_lsn=0)
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)
    ok, _ = validate_segment(wal, segs[0])
    assert ok
    # drop a data file from the middle segment: footer counts no longer
    # match the producer manifest
    seg_dir = os.path.join(wal, "v2", f"seg={segs[1]}")
    victim = [n for n in os.listdir(seg_dir) if n.endswith(".parquet")][0]
    os.remove(os.path.join(seg_dir, victim))
    ok, reason = validate_segment(wal, segs[1])
    assert not ok and "incomplete" in reason

    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lin"))
    stats = replay_wal(spark, table, wal, segs, validate=True, lineage=lineage)
    rejected = [s for s in stats if s.get("rejected")]
    assert len(rejected) == 1 and rejected[0]["batch_id"] == segs[1]
    # the broken segment's rows were NOT merged; the others were
    lin = lineage.read().toPandas()
    bad = lin[(lin.batch_id == segs[1]) & (lin.partition_id == -1)]
    assert len(bad) == 1 and not bad.iloc[0].success
    assert "incomplete" in bad.iloc[0].error
    want = fold_events(ev.where(f"seg <> {segs[1]}").toPandas())
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)


def test_plausibility_gate_records_failure(tmp_path, spark):
    ev = generate_events(spark, 2000, n_conv=40, seed=53, seg_size=1000,
                         v2_start_lsn=0)
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lin"))
    stats = replay_wal(
        spark, table, wal, segs, lineage=lineage, min_plausible_rows=10**6
    )
    assert all(s.get("plausibility_failed") for s in stats if not s.get("skipped_fenced"))
    lin = lineage.read().toPandas()
    assert not lin[lin.partition_id == -1].success.any()


def test_staleness_guard_rejects_resume_hole(tmp_path, spark):
    from pyspark.sql import functions as F

    ev = generate_events(spark, 1000, n_conv=30, seed=57, seg_size=1000,
                         v2_start_lsn=0)
    table = _mk(spark, tmp_path)
    apply_batch(table, ev.drop("seg"), batch_id=0)
    assert table.manifest()["lsn_max"] == 999
    far_future = ev.drop("seg").withColumn("lsn", F.col("lsn") + 10_000_000)
    from open_bus_gtfs_etl_spark.operators.merge import check_resume_gap

    with pytest.raises(StaleResumeError, match="resume gap too large"):
        check_resume_gap(table, far_future, max_lsn_gap=1000)
    # a contiguous batch passes
    nearby = ev.drop("seg").withColumn("lsn", F.col("lsn") + 1000)
    check_resume_gap(table, nearby, max_lsn_gap=1000)


def test_newest_first_replay_matches_oracle_and_skips_done(tmp_path, spark):
    ev = generate_events(spark, 4000, n_conv=80, seed=59, seg_size=1000,
                         v2_start_lsn=0, dup_rate=0.04, ooo_rate=0.04)
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lin"))
    stats = replay_wal(spark, table, wal, segs, newest_first=True, lineage=lineage)
    assert [s["batch_id"] for s in stats] == sorted(segs, reverse=True)
    want = fold_events(ev.toPandas())
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)
    # second sweep: every segment already succeeded → all lineage-skipped
    again = replay_wal(spark, table, wal, segs, newest_first=True, lineage=lineage)
    assert all(s.get("skipped_lineage") for s in again)
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)
