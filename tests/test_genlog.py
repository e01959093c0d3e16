"""Generator tests: determinism, knob behavior, WAL round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.genlog import (
    generate_events,
    read_wal_segment,
    validate_segment,
    write_wal,
)


def test_deterministic(spark):
    a = generate_events(spark, 2000, seed=7).orderBy("lsn", "seg").collect()
    b = generate_events(spark, 2000, seed=7).orderBy("lsn", "seg").collect()
    assert a == b


def test_seed_changes_output(spark):
    a = generate_events(spark, 500, seed=1, dup_rate=0).orderBy("lsn").collect()
    b = generate_events(spark, 500, seed=2, dup_rate=0).orderBy("lsn").collect()
    assert a != b


def test_shape_and_domains(spark):
    df = generate_events(spark, 3000, n_conv=100, seed=42, v2_start_lsn=1500)
    rows = df.collect()
    base = [r for r in rows]
    assert {r.op for r in base} == {"insert", "update", "delete"}
    v1 = [r for r in base if r.schema_ver == 1]
    v2 = [r for r in base if r.schema_ver == 2]
    assert all(r.lsn < 1500 for r in v1) and all(r.lsn >= 1500 for r in v2)
    assert all(r.tool is None for r in v1)
    assert {r.role for r in v1 if r.role is not None} <= {"user", "assistant"}
    assert {r.role for r in v2 if r.role is not None} <= {"user", "assistant", "system", "tool"}
    assert all(r.tool is not None for r in v2 if r.role == "tool")
    deletes = [r for r in base if r.op == "delete"]
    assert deletes and all(r.text is None and r.role is None for r in deletes)
    live = [r for r in base if r.op != "delete"]
    assert all(10 <= len(r.text) <= 2000 for r in live)
    assert all(0 <= r.turn_idx < 512 for r in base)


def test_skew_knob(spark):
    skewed = generate_events(spark, 5000, n_conv=500, skew_s=1.5, seed=42, dup_rate=0)
    flat = generate_events(spark, 5000, n_conv=500, skew_s=0.01, seed=42, dup_rate=0)

    def top_share(df):
        top = (
            df.groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()[0]["count"]
        )
        return top / df.count()

    assert top_share(skewed) > 3 * top_share(flat)


def test_dup_and_ooo(spark):
    df = generate_events(spark, 4000, seed=42, dup_rate=0.1, ooo_rate=0.1, seg_size=500)
    total = df.count()
    distinct_lsn = df.select("lsn").distinct().count()
    assert distinct_lsn == 4000
    assert total > 4000 * 1.05  # duplicates present
    # out-of-order: some events live in a later segment than lsn implies
    moved = df.where(F.col("seg") > F.floor(F.col("lsn") / 500)).count()
    assert moved > 0


def test_wal_roundtrip(tmp_path, spark):
    df = generate_events(spark, 2000, seed=42, seg_size=500, v2_start_lsn=1000)
    wal = str(tmp_path / "wal")
    segs = write_wal(df, wal)
    assert segs == sorted(segs)
    back = None
    for s in segs:
        part = read_wal_segment(spark, wal, s)
        back = part if back is None else back.unionByName(part)
    assert back.count() == df.count()
    # v1 physical files genuinely lack the tool column
    import os

    v1seg = [s for s in segs if os.path.isdir(f"{wal}/v1/seg={s}")][0]
    raw = spark.read.parquet(f"{wal}/v1/seg={v1seg}")
    assert "tool" not in raw.columns
    aligned = read_wal_segment(spark, wal, v1seg)
    assert "tool" in aligned.columns


def test_write_wal_rejects_unparsable_seg_dir(tmp_path, spark):
    """A stray/non-integer seg= dir must raise a named ValueError, not
    an opaque int() crash mid-scan (round-4 advice)."""
    import os

    import pytest

    df = generate_events(spark, 500, seed=42, seg_size=250, v2_start_lsn=250)
    wal = str(tmp_path / "wal")
    write_wal(df, wal)
    os.makedirs(os.path.join(wal, "v2", "seg=__HIVE_DEFAULT_PARTITION__"))
    with pytest.raises(ValueError, match="unparsable WAL partition dir"):
        write_wal(df, wal)


def test_write_wal_append_counts_are_cumulative(tmp_path, spark):
    """mode('append') into a pre-populated wal_dir: manifests and segs
    cover everything ON DISK (documented cumulative semantics), matching
    what validate_segment checks."""
    import json
    import os

    df = generate_events(spark, 400, seed=42, seg_size=200, v2_start_lsn=200, dup_rate=0)
    wal = str(tmp_path / "wal")
    write_wal(df, wal)
    write_wal(df, wal)  # append the same batch again
    seg0 = os.path.join(wal, "v1", "seg=0")
    with open(os.path.join(seg0, "_SEGMENT.json")) as f:
        man = json.load(f)
    actual = 0
    import pyarrow.parquet as pq

    for fn in os.listdir(seg0):
        if fn.endswith(".parquet"):
            actual += pq.ParquetFile(os.path.join(seg0, fn)).metadata.num_rows
    assert man["n_rows"] == actual  # cumulative, footer-derived
    ok, reason = validate_segment(wal, 0)
    assert ok, reason
