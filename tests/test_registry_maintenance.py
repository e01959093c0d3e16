"""Schema registry DDL driving + retention thinning + reprocess."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark import registry
from open_bus_gtfs_etl_spark.genlog import generate_events, write_wal
from open_bus_gtfs_etl_spark.operators.maintenance import reprocess, thin_keep_weekly
from open_bus_gtfs_etl_spark.operators.merge import apply_batch, replay_wal
from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable
from pyspark.sql import types as T


def _mk_v1_table(spark, tmp_path):
    """Table created at schema v1 (no tool column)."""
    v1_user = T.StructType([f for f in TRANSCRIPTS_SCHEMA.fields if f.name != "tool"])
    return SnapshotParquetTable.create(
        spark, str(tmp_path / "lake"), v1_user,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )


def test_registry_drives_evolution(tmp_path, spark):
    table = _mk_v1_table(spark, tmp_path)
    assert "tool" not in [f.name for f in table.stored_schema().fields]

    ev = generate_events(spark, 2000, n_conv=50, seed=5, v2_start_lsn=1000, dup_rate=0)
    v1_batch = ev.where(F.col("schema_ver") == 1).drop("seg", "tool")
    v2_batch = ev.where(F.col("schema_ver") == 2).drop("seg")

    # v1 batch: no DDL needed
    assert registry.ensure_table_evolved(table, registry.align_batch(v1_batch)) == []
    apply_batch(table, registry.align_batch(v1_batch), batch_id=0)
    assert "tool" not in table.manifest()["user_cols"]

    # v2 batch: registry adds the tool column BEFORE the merge
    aligned = registry.align_batch(v2_batch)
    assert registry.ensure_table_evolved(table, aligned) == [2]
    assert "tool" in table.manifest()["user_cols"]
    apply_batch(table, aligned, batch_id=1)
    out = table.read()
    assert "tool" in out.columns
    # pre-evolution rows surface as null tool; v2 tool-role rows have values
    assert out.where(F.col("tool").isNotNull()).count() > 0


def test_role_domain_validation(spark):
    rows = [(1, "user", 1), (2, "system", 1), (3, "system", 2)]
    df = spark.createDataFrame(rows, "lsn long, role string, schema_ver int")
    flagged = registry.validate_roles(df).where("_role_out_of_domain").collect()
    # 'system' is out of domain for v1 but fine for v2
    assert [(r.lsn) for r in flagged] == [2]


def test_thin_keep_weekly():
    today = dt.date(2026, 3, 1)
    dates = [today - dt.timedelta(days=i) for i in range(0, 60)]
    keep, drop = thin_keep_weekly(dates, num_days_keep=5, num_weeklies_keep=4, today=today)
    assert keep | drop == set(dates) and not (keep & drop)
    # daily band is INCLUSIVE of today - num_days_keep (reference '>=')
    for i in range(6):
        assert today - dt.timedelta(days=i) in keep
    # weekly band: older than the daily band, newer than today - 4 weeks,
    # spaced ≥ 7 days (the reference's scan rule, cleanup_dated_paths.py:42-49)
    weekly = sorted(d for d in keep if d < today - dt.timedelta(days=5))
    gaps = [(b - a).days for a, b in zip(weekly, weekly[1:])]
    assert all(g >= 7 for g in gaps)
    assert all(d > today - dt.timedelta(weeks=4) for d in weekly)
    assert len(weekly) == 4


def test_reprocess_rollback_and_replay(tmp_path, spark):
    ev = generate_events(spark, 3000, n_conv=60, seed=21, seg_size=1000, v2_start_lsn=0)
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)
    table = SnapshotParquetTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    replay_wal(spark, table, wal, segs)
    before = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in table.read().collect()
    )
    # corrupt scenario: roll back past batch 0 and reprocess everything
    reprocess(spark, table, wal, from_version=1, segments=segs)
    after = sorted((r.conv_id, r.turn_idx, r.text) for r in table.read().collect())
    assert before == after


def test_cleanup_consumed_segments(tmp_path, spark):
    """R4: a segment is deleted only when BOTH ledgers say so — lineage
    success AND at-or-below the table's batch fence; everything else
    (unapplied, failed, above-fence) must survive the GC."""
    from open_bus_gtfs_etl_spark.operators.maintenance import (
        cleanup_consumed_segments,
    )
    from open_bus_gtfs_etl_spark.streaming.lineage import LineageLog

    ev = generate_events(spark, 3000, n_conv=60, seed=31, seg_size=1000,
                         v2_start_lsn=0)
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)
    table = SnapshotParquetTable.create(
        spark, str(tmp_path / "lake"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    lineage = LineageLog(spark, str(tmp_path / "lineage"))
    # apply only the first two segments; seg 2 stays unconsumed
    replay_wal(spark, table, wal, segs[:2], lineage=lineage)
    fence = table.last_committed_batch("wal")
    consumed = lineage.successful_batches()
    assert set(segs[:2]) <= consumed

    # dry run reports the split without touching disk
    deleted, kept = cleanup_consumed_segments(wal, consumed, fence, dry_run=True)
    assert deleted == segs[:2] and kept == segs[2:]
    import os as _os
    assert _os.path.isdir(_os.path.join(wal, "v1", f"seg={segs[0]}")) or \
        _os.path.isdir(_os.path.join(wal, "v2", f"seg={segs[0]}"))

    deleted, kept = cleanup_consumed_segments(wal, consumed, fence)
    assert deleted == segs[:2] and kept == segs[2:]
    for ver in ("v1", "v2"):
        for s in segs[:2]:
            assert not _os.path.isdir(_os.path.join(wal, ver, f"seg={s}"))
    # the unconsumed segment is intact and still replayable
    replay_wal(spark, table, wal, segs[2:], lineage=lineage)
    assert table.last_committed_batch("wal") == segs[-1]

    # lineage success alone is NOT sufficient: a fence behind lineage
    # (crash between lineage write and manifest commit) keeps the segment
    deleted, kept = cleanup_consumed_segments(
        wal, consumed=set(segs[2:]), fence=segs[1], dry_run=True
    )
    assert deleted == [] and kept == segs[2:]
