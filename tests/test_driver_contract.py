"""Runs every queries()/oracle_sql() pair at sf0.001 and compares via
the STRICT local emulation of the driver's gate (rowcount + columns +
bit-exact values through the pandas result path — the same
representation level the driver's value hash sees). Mirrors SURVEY.md
§5 item 5.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from open_bus_gtfs_etl_spark.plans.parity import compare_strict, duckdb_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_DIR)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_parity(spark, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0
        return
    res = compare_strict(df, con, sql)
    assert res["match"], f"{name}: {res['detail']}"
