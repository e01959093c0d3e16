"""Time EVERY catalog query at a given scale factor — the evidence
that no oracle-paired entry is pathologically slow an order of
magnitude above the correctness gate's sf0.01 (the driver's bench only
times the 14 headline queries).

Each query is timed exactly like the headline bench: a full
materialization through the `noop` sink (every result row computed and
serialized, none shipped to the driver). Probe-stamped like bench.py
so a contended window is legible in the artifact rather than silently
poisoning per-query comparisons.

Usage: python bench/catalog_times.py [sf_dir] [out_json] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "bench", "catalog_times.json")
    )
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from open_bus_gtfs_etl_spark.plans.queries import QUERIES
    from open_bus_gtfs_etl_spark.session import get_spark

    spark = get_spark(
        app_name="catalog-times",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()

    probe_before = bench._probe()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
            rows[name] = df.count()
        except Exception as e:  # keep sweeping — one failure is data too
            errors[name] = f"{type(e).__name__}: {e}"[:300]
    probe_after = bench._probe()

    rec = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_queries": len(QUERIES),
        "total_sec": round(sum(times.values()), 1),
        "probe_raw_before": round(probe_before, 3),
        "probe_raw_after": round(probe_after, 3),
        "times_sec": times,
        "result_rows": rows,
        "errors": errors,
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print(json.dumps({"total_sec": rec["total_sec"], "n_errors": len(errors),
                      "slowest": slow, "out": out}))


if __name__ == "__main__":
    main()
