"""Iceberg production path: the generated SQL must carry the exact
merge semantics the snapshot store implements (LWW gate, delete branch,
no-resurrect insert guard) — unit-testable without the runtime jar.
"""

from __future__ import annotations

from pyspark.sql import types as T

from open_bus_gtfs_etl_spark.sources.lake import (
    iceberg_ddl_sql,
    iceberg_evolve_sql,
    iceberg_expire_sql,
    iceberg_merge_sql,
)

KEYS = ["conv_id", "turn_idx"]
VALS = ["role", "text", "tool", "ts"]


def test_merge_sql_branches_and_gates():
    sql = iceberg_merge_sql("cat.db.transcripts", "src", KEYS, VALS)
    # null-safe key equality on every key col
    assert "t.conv_id <=> s.conv_id AND t.turn_idx <=> s.turn_idx" in sql
    # the cross-batch out-of-order gate on BOTH matched branches:
    # an older lsn must never regress the row (SURVEY.md §7 hard parts)
    wins = "(s.lsn > t._lsn OR (s.lsn = t._lsn AND s.ts >= t._ts))"
    assert sql.count(wins) == 2
    assert f"WHEN MATCHED AND s.op = 'delete' AND {wins} THEN DELETE" in sql
    # inserts must not resurrect a delete arriving for an absent key
    assert "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT" in sql
    # every value column updated, lsn/ts watermark maintained
    for c in VALS:
        assert f"t.{c} = s.{c}" in sql
    assert "t._lsn = s.lsn" in sql and "t._ts = s.ts" in sql


def test_ddl_sql_buckets_and_mor():
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    sql = iceberg_ddl_sql("cat.db.t", schema, KEYS, 32)
    # hash bucketing on the first key col — the co-location contract
    assert "PARTITIONED BY (bucket(32, conv_id))" in sql
    # format v2 + merge-on-read: the delta-and-compact strategy the
    # snapshot store's "mor" mode implements from scratch
    assert "'write.merge.mode'='merge-on-read'" in sql
    assert "'format-version'='2'" in sql
    assert "_lsn bigint" in sql and "_deleted boolean" in sql


def test_evolve_and_expire_sql():
    stmts = iceberg_evolve_sql("cat.db.t", [T.StructField("tool", T.StringType())])
    assert stmts == ["ALTER TABLE cat.db.t ADD COLUMN tool string"]
    sql = iceberg_expire_sql("cat.db.t", keep_last=2)
    assert "cat.system.expire_snapshots" in sql and "retain_last => 2" in sql
