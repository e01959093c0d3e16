"""Iteration harness: run every oracle pair through the STRICT parity
comparator (the driver-hash emulation) at one or more sf dirs.

Usage: python bench/check_parity.py [sf_dir ...] [--loose] [--only q1,q2]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    loose = "--loose" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    sf_dirs = args or ["/root/testdata/sf0.01"]

    from open_bus_gtfs_etl_spark.plans.parity import compare, compare_strict, duckdb_con
    from open_bus_gtfs_etl_spark.plans.queries import ORACLES, QUERIES
    from open_bus_gtfs_etl_spark.session import get_spark

    spark = get_spark(app_name="parity", extra_conf={"spark.ui.showConsoleProgress": "false"})
    cmp_fn = compare if loose else compare_strict
    n_fail = 0
    for sf_dir in sf_dirs:
        con = duckdb_con(sf_dir)
        for name, fn in QUERIES.items():
            if only and name not in only:
                continue
            if name not in ORACLES:
                print(f"[{sf_dir}] {name}: (rows-only) {fn(spark, sf_dir).count()} rows")
                continue
            try:
                res = cmp_fn(fn(spark, sf_dir), con, ORACLES[name])
            except Exception as e:  # noqa: BLE001
                res = {"match": False, "detail": f"EXC {type(e).__name__}: {e}"}
            flag = "OK " if res["match"] else "FAIL"
            if not res["match"]:
                n_fail += 1
            print(f"[{sf_dir}] {flag} {name}: {res['detail'][:300]}")
    print(f"failures: {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
