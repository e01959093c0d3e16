"""Run ONE CDC replay at a given parallelism in a fresh process.

Usage: python bench/replay_once.py <cores> <wal_dir> <n_events> <lake_root>
       [n_buckets] [mode] [table_mode]

table_mode: "cow" (default) pays the full merge (join + bucket
rewrite); "mor" appends LWW-resolved deltas (the steady-state apply
cost of the merge-on-read design; read/compaction cost excluded and
reported separately by the final read count).

mode: "per-segment" (default) replays each WAL segment as its own
fenced batch; "single-batch" applies the whole WAL as one batch —
the steady-state unit at 10^10 scale is a ~10^8-event batch, which at
sandbox scale is the entire generated WAL, so single-batch is the
representative per-batch throughput measurement.
Prints one JSON line with elapsed + events/sec. Used by bench.py for
the two-cluster-size scaling measurement (fresh JVM per level, so JIT
warm-up and heap state can't leak between levels).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # right-size the replay driver JVM (overridable via env): the 64M
    # scaling batch needs ~3.5 GB of execution memory at its widest
    # (winner sort across 32 partitions), so the session default 16 GB
    # heap is ~2x oversized here — measured at 64M/4 cores the smaller
    # heap is no slower (47.4 vs 50.4 s, less GC) and the JVM's exit
    # page-reclaim is lighter, so the host probe taken right after a
    # sample (bench.py's completion covariate) reads 0.93-0.98 of
    # baseline instead of 0.85-0.88 — fewer falsely-disqualified
    # scaling pairs. 128M at 8 cores verified no-spill and faster
    # (62.9 s, 2.08M ev/s, best recorded).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "10g")
    cores = int(sys.argv[1])
    wal_dir = sys.argv[2]
    n_events = int(sys.argv[3])
    lake_root = sys.argv[4]
    n_buckets = int(sys.argv[5]) if len(sys.argv) > 5 else cores * 2

    from open_bus_gtfs_etl_spark.operators.merge import replay_wal
    from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
    from open_bus_gtfs_etl_spark.session import get_spark
    from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

    phases: dict[str, float] = {}

    def _phase(name, t0):
        phases[name] = round(time.time() - t0, 1)
        print(f"phase {name}: {phases[name]}s", file=sys.stderr, flush=True)

    t0 = time.time()
    spark = get_spark(
        app_name=f"replay_{cores}",
        master=f"local[{cores}]",
        # identical partitioning at every parallelism level: the N-vs-4N
        # comparison must vary ONLY scheduler slots, and partitions must
        # be sized by data volume, not core count — at 16M×1KB events,
        # `partitions == 2` makes ~8 GB shuffle partitions that spill
        # and thrash, understating the low level (and overstating
        # scaling). 32 partitions ≈ 512 MB each, the cluster norm.
        shuffle_partitions=max(32, cores),
        # AQE off for the replay job: the merge plan is statically
        # sized already (explicit winner-key broadcast, data-sized
        # level-invariant shuffle partitions), so AQE's contribution
        # here is only its per-stage driver re-planning pause — pure
        # serial cost, measured ~1.5 s per 16M batch at 8 cores
        # (13.2 s vs 15.0 s interleaved fresh JVMs). Keep AQE ON in
        # general sessions (skew joins, read-time coalescing); this is
        # the dedicated replay-job profile, mirrored in
        # jobs/replay_job.py.
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.sql.adaptive.enabled": "false",
                    # parquet dictionary encoding off for the replay
                    # profile: the transcript payload is high-entropy
                    # ~1KB text, so every column chunk's dictionary
                    # fills and falls back after pure wasted hashing +
                    # allocation — measured at 64M events: 4-core apply
                    # 62.6->49.3 s, 1-core 185.0->175.4 s, output size
                    # unchanged (384->386 MB). The allocation churn
                    # scales WORSE than linearly (GC contention), so
                    # removing it also lifts 1->4 pair efficiency.
                    # Mirrored in jobs/replay_job.py; general sessions
                    # keep the default (dictionaries win on
                    # low-cardinality tables).
                    "spark.hadoop.parquet.enable.dictionary": "false"},
    )
    spark.range(1000).count()
    _phase("session", t0)
    # JIT warm-up: run a miniature generate→dedup→merge so the timed
    # section measures steady-state throughput, not bytecode compilation
    import tempfile

    from open_bus_gtfs_etl_spark.genlog import generate_events
    from open_bus_gtfs_etl_spark.operators.merge import apply_batch

    warm_dir = tempfile.mkdtemp(prefix="warm_")
    warm_tbl = SnapshotParquetTable.create(
        spark, os.path.join(warm_dir, "lake"), TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=4,
    )
    t0 = time.time()
    # representative warm-up: the headline metric is SUSTAINED
    # throughput, so the timed section must run on a C2-compiled
    # steady-state JVM — 1M events through the identical apply path
    # (the hot aggregation/join/parquet classes need ~10^6 rows before
    # HotSpot compiles them; a token 50k warm-up left the timed 16M
    # apply 10-20x slower in its first minutes)
    warm_ev = generate_events(spark, 1_000_000, n_conv=50_000, seed=7, dup_rate=0.02)
    # same dedup plan as the timed section so the warm-up compiles the
    # classes the measurement actually runs
    apply_batch(warm_tbl, warm_ev.drop("seg"), batch_id=0, dedup="argmax_lsn")
    apply_batch(
        warm_tbl, warm_ev.drop("seg").limit(10_000), batch_id=1,
        dedup="argmax_lsn",
    )
    _phase("warmup", t0)
    import shutil

    shutil.rmtree(warm_dir, ignore_errors=True)

    segs = sorted(
        {
            int(d.split("seg=")[1])
            for ver in ("v1", "v2")
            if os.path.isdir(os.path.join(wal_dir, ver))
            for d in os.listdir(os.path.join(wal_dir, ver))
            if d.startswith("seg=")
        }
    )
    mode = sys.argv[6] if len(sys.argv) > 6 else "per-segment"
    table_mode = sys.argv[7] if len(sys.argv) > 7 else "cow"
    table = SnapshotParquetTable.create(
        spark, lake_root, TRANSCRIPTS_SCHEMA,
        key_cols=["conv_id", "turn_idx"], n_buckets=n_buckets, mode=table_mode,
    )
    if mode == "single-batch":
        from open_bus_gtfs_etl_spark.genlog import read_wal_segment

        batch = None
        for seg in segs:
            p = read_wal_segment(spark, wal_dir, seg)
            batch = p if batch is None else batch.unionByName(p)
        t0 = time.time()
        # the generated WAL's lsn is the global event id (genlog
        # contract), so the lsn-keyed argmax join-back applies
        st = apply_batch(table, batch, batch_id=0, dedup="argmax_lsn")
        elapsed = time.time() - t0
        n_applied = st.get("n_source_rows") or n_events
    else:
        t0 = time.time()
        sts = replay_wal(spark, table, wal_dir, segs)
        elapsed = time.time() - t0
        n_applied = sum(s.get("n_source_rows") or 0 for s in sts) or n_events
    final_rows = table.read().count()
    print(
        json.dumps(
            {
                "cores": cores,
                "mode": mode,
                "table_mode": table_mode,
                "elapsed_sec": round(elapsed, 3),
                # rate over the rows actually applied (generated events
                # PLUS duplicate deliveries), not the nominal n_events
                "events_per_sec": round(n_applied / elapsed, 1),
                "n_applied": n_applied,
                "n_segments": len(segs),
                "final_rows": final_rows,
                # pre-timed-section costs, for diagnosing noisy samples
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
