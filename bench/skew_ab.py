"""Hot-key skew A/B: the naive window-rank LWW plan vs the two-phase
salted plan on a pathologically skewed batch — the measured evidence
behind ``replay_wal(salted=True)``.

The replay matrix (tests/test_replay_matrix.py) proves the salted plan
is CORRECT; this script measures when it is FASTER. The pathology is a
single (conv_id, turn_idx) key carrying ``hot_pct``% of the batch —
the CDC shape of one conversation's turn being update-churned millions
of times (reference analogue: the same route re-uploaded daily,
upload_to_s3.py — file-level hot keys). Under the window plan every
row of the hot key lands on ONE reducer (ClusteredDistribution by
key), so one task sorts hot_pct·n rows while the others idle; the
salted plan spreads the key over n_salts reducers in phase 1 and folds
≤ n_salts per-salt winners in phase 2 (operators/dedup.py:
lww_dedup_salted). At 1000 executors the imbalance IS the runtime —
the straggler task bounds the stage.

Usage: python bench/skew_ab.py [cores] [n_events] [hot_pct] [reps]

Hygiene (BENCH.md methodology): input materialized to /dev/shm parquet
once so both variants read identical files; variants interleaved
within each rep (A,B,A,B — a host-load window hits both); a
host-contention probe (bench._probe) sampled before every timed run;
best-of-reps per variant reported with all samples. Single JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    hot_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from bench import _probe
    from pyspark.sql import functions as F

    from open_bus_gtfs_etl_spark.operators.dedup import (
        lww_dedup_argmax_join,
        lww_dedup_salted,
        lww_dedup_window,
    )
    from open_bus_gtfs_etl_spark.session import get_spark

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="skew_ab_", dir=scratch)
    spark = get_spark(
        app_name="skew_ab", master=f"local[{cores}]",
        shuffle_partitions=max(32, cores),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    keys = ["conv_id", "turn_idx"]
    payload = ["role", "text", "tool"]
    try:
        # hot_pct% of rows on ONE (conv_id, turn_idx); the rest spread
        # over ~n/100 cold conversations × 50 turns. ~200B text payload
        # so the shuffled bytes are transcript-shaped, not key-only.
        n_cold = max(64, n_events // 100)
        src = os.path.join(work, "batch")
        (
            spark.range(n_events)
            .select(
                F.col("id").alias("lsn"),
                F.when(F.pmod("id", 100) < hot_pct, F.lit("conv_hot"))
                .otherwise(F.concat(F.lit("conv_"), F.pmod("id", F.lit(n_cold))))
                .alias("conv_id"),
                F.when(F.pmod("id", 100) < hot_pct, F.lit(0))
                .otherwise(F.pmod((F.col("id") / 100).cast("long"), F.lit(50)).cast("int"))
                .alias("turn_idx"),
                F.lit("assistant").alias("role"),
                F.repeat(F.lit("x"), 200).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            )
            .write.mode("overwrite").parquet(src)
        )
        batch = spark.read.parquet(src)

        def run(plan) -> float:
            t0 = time.monotonic()
            df = plan(batch, keys, payload)
            df.write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        variants = {
            "window_rank": lambda b, k, p: lww_dedup_window(b, k).select(*k, *p),
            "salted_two_phase": lambda b, k, p: lww_dedup_salted(b, k, p, n_salts=16),
            # kernel default: longs-only agg map-side-combines the hot
            # key before the shuffle — no salt needed (no broadcast
            # hint here so the comparison is plan shape, not sizing)
            "argmax_join": lambda b, k, p: lww_dedup_argmax_join(
                b, k, p, broadcast_keys=False
            ),
        }
        # JIT/codegen warm-up on a slice (excluded from samples)
        for plan in variants.values():
            plan(batch.limit(100_000), keys, payload).write.format("noop").mode(
                "overwrite"
            ).save()

        samples: dict[str, list[dict]] = {k: [] for k in variants}
        for _ in range(reps):
            for name, plan in variants.items():
                p = _probe()
                samples[name].append({"sec": round(run(plan), 3), "probe": p})
        # normalize probes to the run's best window (1.0 = quietest seen)
        pmax = max(s["probe"] for v in samples.values() for s in v)
        for v in samples.values():
            for s in v:
                s["probe"] = round(s["probe"] / pmax, 3)

        counts = {
            name: plan(batch, keys, payload).count()
            for name, plan in variants.items()
        }
        assert len(set(counts.values())) == 1, f"row-count disagreement: {counts}"

        # the scale-transferable number: rows on the LARGEST sort shard
        # vs the median shard under each plan's clustering. At local[8]
        # a hot task hides inside (32 partitions / 8 cores) slack; at
        # 1000 slots stage wall-clock IS max-shard / median-shard.
        def shard_imbalance(parted) -> dict:
            sizes = sorted(
                r["n"]
                for r in parted.groupBy(
                    F.spark_partition_id().alias("p")
                ).agg(F.count("*").alias("n")).collect()
            )
            # max_share = fraction of the stage serialized on the
            # biggest shard — the wall-clock lower bound with unlimited
            # slots (1.0 = the whole stage is one task). AQE coalescing
            # is left ON: it merges small shards but cannot split a hot
            # KEY, so max_share is the honest post-AQE critical path.
            return {
                "n_partitions": len(sizes),
                "max_rows": sizes[-1],
                "max_share": round(sizes[-1] / n_events, 3),
            }

        imbalance = {
            "window_rank": shard_imbalance(
                batch.repartition(F.col("conv_id"), F.col("turn_idx"))
            ),
            "salted_two_phase": shard_imbalance(
                batch.repartition(
                    F.col("conv_id"),
                    F.col("turn_idx"),
                    F.pmod(F.col("lsn"), F.lit(16)),
                )
            ),
        }

        best = {k: min(s["sec"] for s in v) for k, v in samples.items()}
        print(json.dumps({
            "metric": "hot-key LWW dedup wall-sec (lower=better)",
            "n_events": n_events,
            "hot_pct": hot_pct,
            "cores": cores,
            "n_distinct_keys": counts["window_rank"],
            "best_sec": best,
            "salted_speedup_vs_window": round(
                best["window_rank"] / best["salted_two_phase"], 3
            ),
            "sort_shard_imbalance": imbalance,
            "samples": samples,
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
