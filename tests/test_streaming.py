"""Streaming tailer: checkpointed offsets, fenced foreachBatch merge,
kill/resume equals uninterrupted run (SURVEY.md §5 items 3-4).
"""

from __future__ import annotations

import pandas as pd

from open_bus_gtfs_etl_spark.genlog import generate_events, write_wal
from open_bus_gtfs_etl_spark.oracle import fold_events
from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable
from open_bus_gtfs_etl_spark.streaming.lineage import LineageLog
from open_bus_gtfs_etl_spark.streaming.tailer import (
    run_until_caught_up,
    start_tailer,
    wal_v2_glob,
)


def _mk(spark, tmp_path, n_buckets=4):
    return SnapshotParquetTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=n_buckets,
    )


def _final(table):
    return (
        table.read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def test_stream_matches_oracle_and_records_lineage(tmp_path, spark):
    # v2-only log so a single fixed-schema stream covers all events
    ev = generate_events(
        spark, 6000, n_conv=120, seed=11, seg_size=1500, v2_start_lsn=0,
        dup_rate=0.05, ooo_rate=0.05,
    )
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lineage"))
    q = start_tailer(
        spark, table, wal_v2_glob(wal), str(tmp_path / "ckpt"),
        lineage=lineage, max_files_per_trigger=4,
    )
    run_until_caught_up(q)
    got = _final(table)
    want = fold_events(ev.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    lin = lineage.read().toPandas()
    assert (lin[lin.partition_id == -1].success).all()
    assert lineage.last_successful_batch() is not None
    # per-bucket rows exist and sum to the batch-level insert counts
    batch0 = lin[lin.batch_id == 0]
    top = batch0[batch0.partition_id == -1].rows_inserted.sum()
    per_bucket = batch0[batch0.partition_id >= 0].rows_inserted.sum()
    assert top == per_bucket


def test_kill_resume_equals_uninterrupted(tmp_path, spark):
    ev = generate_events(
        spark, 5000, n_conv=100, seed=13, seg_size=1000, v2_start_lsn=0
    )
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)

    # uninterrupted reference run
    t_ref = SnapshotParquetTable.create(
        spark, str(tmp_path / "lake_ref"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    q = start_tailer(spark, t_ref, wal_v2_glob(wal), str(tmp_path / "ck_ref"))
    run_until_caught_up(q)

    # interrupted run: process a couple of files, stop mid-stream, resume
    t_int = SnapshotParquetTable.create(
        spark, str(tmp_path / "lake_int"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    ck = str(tmp_path / "ck_int")
    q1 = start_tailer(spark, t_int, wal_v2_glob(wal), ck, max_files_per_trigger=2)
    # let at least one micro-batch commit, then kill
    import time

    deadline = time.time() + 60
    while t_int.last_committed_batch() < 0 and time.time() < deadline:
        time.sleep(0.5)
    q1.stop()
    q1.awaitTermination(60)
    assert t_int.last_committed_batch() >= 0, "no batch committed before kill"

    # resume from the same checkpoint: re-delivered epoch is fenced,
    # remainder processed exactly once
    q2 = start_tailer(spark, t_int, wal_v2_glob(wal), ck, max_files_per_trigger=2)
    run_until_caught_up(q2)

    pd.testing.assert_frame_equal(_final(t_int), _final(t_ref), check_dtype=False)


def test_backfill_then_fresh_stream_not_fenced(tmp_path, spark):
    """The ADVICE-high scenario: WAL segments absorbed via batch replay
    (fence under writer 'wal', segment ids), then a tailer starts with a
    FRESH checkpoint. Its early epochs (ids from 0) must apply — under a
    shared fence they were silently no-oped while the checkpoint marked
    the files consumed, permanently dropping those events."""
    from open_bus_gtfs_etl_spark.operators.merge import replay_wal

    ev = generate_events(
        spark, 3000, n_conv=80, seed=17, seg_size=1000, v2_start_lsn=0,
        dup_rate=0.03, ooo_rate=0.03,
    )
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    # backfill only the FIRST segment in batch mode → fences wal=seg0
    replay_wal(spark, table, wal, segs[:1])
    assert table.last_committed_batch("wal") == segs[0]
    # fresh-checkpoint tailer over the whole WAL: epoch ids start at 0
    q = start_tailer(spark, table, wal_v2_glob(wal), str(tmp_path / "ck_fresh"))
    run_until_caught_up(q)
    got = _final(table)
    want = fold_events(ev.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


class _FlakyTable:
    """Delegating wrapper that fails the first ``n_fail`` merges."""

    def __init__(self, inner, n_fail):
        self._inner = inner
        self._left = n_fail

    def merge(self, *a, **kw):
        if self._left > 0:
            self._left -= 1
            raise RuntimeError("injected merge failure")
        return self._inner.merge(*a, **kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_failed_merge_retries_then_succeeds(tmp_path, spark):
    ev = generate_events(spark, 2000, n_conv=50, seed=19, seg_size=2000, v2_start_lsn=0)
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lin"))
    flaky = _FlakyTable(table, n_fail=2)
    q = start_tailer(
        spark, flaky, wal_v2_glob(wal), str(tmp_path / "ck"),
        lineage=lineage, max_retries=2,
    )
    run_until_caught_up(q)
    got = _final(table)
    want = fold_events(ev.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    lin = lineage.read().toPandas()
    assert (lin[lin.partition_id == -1].success).all()  # retried to success


def test_merge_failure_persists_error_lineage_then_raises(tmp_path, spark):
    ev = generate_events(spark, 1000, n_conv=30, seed=23, seg_size=1000, v2_start_lsn=0)
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lin"))
    broken = _FlakyTable(table, n_fail=10**6)
    q = start_tailer(
        spark, broken, wal_v2_glob(wal), str(tmp_path / "ck"),
        lineage=lineage, max_retries=1,
    )
    import pytest

    with pytest.raises(Exception, match="injected merge failure"):
        q.processAllAvailable()
    q.stop()
    lin = lineage.read().toPandas()
    bad = lin[(lin.partition_id == -1) & (~lin.success)]
    assert len(bad) >= 1
    assert "injected merge failure" in bad.iloc[0].error


def test_lineage_queryable_state_machine(tmp_path, spark):
    from open_bus_gtfs_etl_spark.operators.merge import apply_batch
    from pyspark.sql import functions as F

    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lin"))
    ev = generate_events(spark, 1000, n_conv=30, seed=3, seg_size=1000, v2_start_lsn=0)
    st = apply_batch(table, ev.drop("seg"), batch_id=0)
    lineage.record(0, st)
    lineage.record(1, {"skipped_fenced": True}, error="simulated failure")
    lin = lineage.read()
    ok = lin.where(F.col("success") & (F.col("partition_id") == -1)).count()
    bad = lin.where(~F.col("success") & (F.col("partition_id") == -1)).count()
    assert (ok, bad) == (1, 1)
    assert lineage.last_successful_batch() == 0


def test_multi_tailer_mixed_versions_no_backfill(tmp_path, spark):
    """Live mixed v1+v2 ingestion through ONE streaming query (one
    aligned stream per registry version, same checkpoint/fence) — no
    batch backfill step; final state equals the event-fold oracle and
    the table ends evolved to the v2 schema."""
    from open_bus_gtfs_etl_spark.streaming.tailer import start_multi_tailer

    ev = generate_events(
        spark, 6000, n_conv=120, seed=17, seg_size=1500, v2_start_lsn=3000,
        dup_rate=0.05, ooo_rate=0.05,
    )
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    lineage = LineageLog(spark, str(tmp_path / "lineage"))
    q = start_multi_tailer(
        spark, table, wal, str(tmp_path / "ckpt"),
        lineage=lineage, max_files_per_trigger=4,
    )
    run_until_caught_up(q)
    got = _final(table)
    want = fold_events(ev.toPandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # v1 rows were absorbed live: the table evolved to carry `tool`
    assert "tool" in [f.name for f in table.stored_schema().fields]
    lin = lineage.read().toPandas()
    assert (lin[lin.partition_id == -1].success).all()


def test_multi_tailer_version_set_pinned_to_checkpoint(tmp_path, spark):
    """The unioned source count is part of the checkpoint's identity
    (Spark rejects recovery when it changes) — the tailer pins the
    resolved version set at first start and fails FAST and legibly on
    a changed set, instead of deep inside Spark's recovery path; a
    fresh checkpoint absorbs the change (re-replay is idempotent)."""
    import pytest

    from open_bus_gtfs_etl_spark.streaming.tailer import (
        VersionSetChangedError,
        start_multi_tailer,
    )

    ev = generate_events(
        spark, 2000, n_conv=40, seed=23, seg_size=1000, v2_start_lsn=1000
    )
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)
    table = _mk(spark, tmp_path)
    ck = str(tmp_path / "ckpt")
    q = start_multi_tailer(spark, table, wal, ck)  # pins [1, 2]
    run_until_caught_up(q)
    # same set resumes fine
    q2 = start_multi_tailer(spark, table, wal, ck)
    run_until_caught_up(q2)
    # a different set against the SAME checkpoint raises before Spark
    with pytest.raises(VersionSetChangedError):
        start_multi_tailer(spark, table, wal, ck, versions=[2])
    # a fresh checkpoint absorbs the changed set
    q3 = start_multi_tailer(
        spark, table, wal, str(tmp_path / "ckpt2"), versions=[2]
    )
    run_until_caught_up(q3)


def test_multi_tailer_kill_resume(tmp_path, spark):
    import time

    from open_bus_gtfs_etl_spark.streaming.tailer import start_multi_tailer

    ev = generate_events(
        spark, 4000, n_conv=80, seed=19, seg_size=1000, v2_start_lsn=2000
    )
    wal = str(tmp_path / "wal")
    write_wal(ev, wal)

    t_ref = SnapshotParquetTable.create(
        spark, str(tmp_path / "lake_ref"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    q = start_multi_tailer(spark, t_ref, wal, str(tmp_path / "ck_ref"))
    run_until_caught_up(q)

    t_int = SnapshotParquetTable.create(
        spark, str(tmp_path / "lake_int"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    ck = str(tmp_path / "ck_int")
    q1 = start_multi_tailer(spark, t_int, wal, ck, max_files_per_trigger=2)
    deadline = time.time() + 60
    while t_int.last_committed_batch() < 0 and time.time() < deadline:
        time.sleep(0.5)
    q1.stop()
    q1.awaitTermination(60)
    assert t_int.last_committed_batch() >= 0, "no batch committed before kill"
    q2 = start_multi_tailer(spark, t_int, wal, ck, max_files_per_trigger=2)
    run_until_caught_up(q2)

    pd.testing.assert_frame_equal(_final(t_int), _final(t_ref), check_dtype=False)
