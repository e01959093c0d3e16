"""Merge-on-read end-to-end economics: apply / read / compact cost as a
function of accumulated delta count — the numbers that pick the default
compaction cadence (``max_deltas``).

Usage: python bench/mor_econ.py [cores] [n_events] [n_segments] [n_buckets]

Applies ``n_segments`` equal batches to a MoR table, timing every
apply; times ``read()`` (full materialization via a noop write) at
delta depths 0 (right after a compact), 4, and ``n_segments``; then
times ``compact()`` folding the full delta stack. Prints one JSON line.
Run it like the scaling bench: fresh process, /dev/shm scratch, quiet
window (single sample — indicative, not a controlled comparison).
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
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    n_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from bench import _probe  # bench.py (module beats the bench/ namespace pkg)
    from open_bus_gtfs_etl_spark.genlog import generate_events, read_wal_segment, write_wal
    from open_bus_gtfs_etl_spark.operators.merge import apply_batch
    from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
    from open_bus_gtfs_etl_spark.session import get_spark
    from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="mor_econ_", dir=scratch)
    probe_start = _probe()
    spark = get_spark(
        app_name="mor_econ", master=f"local[{cores}]",
        shuffle_partitions=max(32, cores),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        seg_size = n_events // n_segments
        ev = generate_events(
            spark, n_events, n_conv=max(64, n_events // 20), seed=42,
            dup_rate=0.02, ooo_rate=0.02, seg_size=seg_size,
        )
        wal = os.path.join(work, "wal")
        segs = write_wal(ev, wal)

        table = SnapshotParquetTable.create(
            spark, os.path.join(work, "lake"), TRANSCRIPTS_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=n_buckets, mode="mor",
        )

        def _read_sec() -> float:
            t0 = time.time()
            table.read().write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        def _deltas() -> int:
            d = table.manifest().get("deltas", {})
            return max((len(v) for v in d.values()), default=0)

        apply_secs: list[float] = []
        reads: dict[str, float] = {}
        # JIT warm-up on a throwaway table (same rationale as replay_once)
        warm = SnapshotParquetTable.create(
            spark, os.path.join(work, "warm"), TRANSCRIPTS_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=4, mode="mor",
        )
        wb = read_wal_segment(spark, wal, segs[0]).limit(500_000)
        apply_batch(warm, wb, batch_id=0)
        shutil.rmtree(os.path.join(work, "warm"), ignore_errors=True)

        for i, seg in enumerate(segs):
            batch = read_wal_segment(spark, wal, seg)
            t0 = time.time()
            apply_batch(table, batch, batch_id=seg, writer="wal")
            apply_secs.append(round(time.time() - t0, 3))
            if i == 0:
                # fold the bootstrap delta so depth counts from 0
                table.compact(max_deltas=0)
                reads["read_sec_0_deltas"] = _read_sec()
            elif _deltas() == 4:
                reads["read_sec_4_deltas"] = _read_sec()
        # distinct key: when the final depth is also 4 this must NOT
        # clobber the mid-run read_sec_4_deltas data point the
        # compaction-cadence analysis fits against
        reads[f"read_sec_final_{_deltas()}_deltas"] = _read_sec()

        depth_before = _deltas()
        t0 = time.time()
        compacted = table.compact(max_deltas=0)
        compact_sec = round(time.time() - t0, 3)
        reads["read_sec_after_compact"] = _read_sec()

        final_rows = table.read().count()
        mean_apply = sum(apply_secs) / len(apply_secs)
        print(json.dumps({
            "cores": cores,
            # host-contention probe scores (raw; same probe as
            # bench.py): start vs end makes a contended-window sample
            # diagnosable instead of silently folded into the means
            "probe_start": round(probe_start, 1),
            "probe_end": round(_probe(), 1),
            "n_events": n_events,
            "n_segments": n_segments,
            "n_buckets": n_buckets,
            "apply_secs": apply_secs,
            "apply_events_per_sec_mean": round(seg_size / mean_apply, 1),
            **reads,
            "compact_sec_at_depth": {str(depth_before): compact_sec},
            "compacted_buckets": len(compacted),
            "final_rows": final_rows,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
