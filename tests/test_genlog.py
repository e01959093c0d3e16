"""Generator tests: determinism, knob behavior, WAL round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_bus_gtfs_etl_spark.genlog import generate_events, read_wal_segment, write_wal


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
