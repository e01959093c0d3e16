"""Live-tailer auto-compaction economics: does read latency stay
BOUNDED across N micro-batches when the streaming merge runs with
``auto_compact``, and how does it degrade without it?

This is the streaming counterpart of bench/mor_econ.py (which measures
the batch knobs): segments ARRIVE one at a time into a watched
directory, the REAL Structured Streaming tailer (checkpointed; each
arrival resumes the same checkpoint, so offsets + fencing are
exercised across restarts exactly like a long-lived stream) applies
each as one epoch against a merge-on-read table, and after every epoch
the full read path (base + delta LWW resolve, materialized via a noop
write) is timed together with the table's max per-bucket delta depth.

Two configs over the SAME arrival sequence: ``auto_compact=4`` (the
mor_econ-recommended cadence) and no compaction. The claim under test:
with auto_compact the depth — and with it the read latency — plateaus,
while the no-compact read cost grows with every epoch.

Usage: python bench/tailer_econ.py [cores] [n_events] [n_segments]
Prints one JSON line; run it like the scaling bench (fresh process,
/dev/shm scratch, quiet window) — probe-stamped at start/middle/end.
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
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000_000
    n_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 24

    from bench import _probe  # bench.py (module beats the bench/ namespace pkg)
    from open_bus_gtfs_etl_spark.genlog import generate_events, write_wal
    from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
    from open_bus_gtfs_etl_spark.session import get_spark
    from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable
    from open_bus_gtfs_etl_spark.streaming.lineage import LineageLog
    from open_bus_gtfs_etl_spark.streaming.tailer import start_tailer

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="tailer_econ_", dir=scratch)
    probe_start = _probe()
    spark = get_spark(
        app_name="tailer_econ", master=f"local[{cores}]",
        shuffle_partitions=max(32, cores),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        seg_size = n_events // n_segments
        # v2_start_lsn=0: all events on the v2 schema so ONE tailer
        # covers the feed (multi-version live ingestion is tested in
        # tests/test_streaming.py; this bench isolates compaction cost)
        ev = generate_events(
            spark, n_events, n_conv=max(64, n_events // 20), seed=42,
            dup_rate=0.02, ooo_rate=0.02, seg_size=seg_size, v2_start_lsn=0,
        )
        staged = os.path.join(work, "staged_wal")
        segs = write_wal(ev, staged)

        def timed_read(table) -> float:
            t0 = time.time()
            table.read().write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        def run_config(tag: str, auto_compact: int | None) -> dict:
            live = os.path.join(work, f"live_{tag}")
            os.makedirs(os.path.join(live, "v2"))
            table = SnapshotParquetTable.create(
                spark, os.path.join(work, f"lake_{tag}"), TRANSCRIPTS_SCHEMA,
                key_cols=["conv_id", "turn_idx"], n_buckets=32, mode="mor",
            )
            lineage = LineageLog(spark, os.path.join(work, f"lineage_{tag}"))
            ckpt = os.path.join(work, f"ckpt_{tag}")
            epochs = []
            for seg in segs:
                shutil.copytree(
                    os.path.join(staged, "v2", f"seg={seg}"),
                    os.path.join(live, "v2", f"seg={seg}"),
                )
                t0 = time.time()
                q = start_tailer(
                    spark, table, os.path.join(live, "v2"), ckpt,
                    lineage=lineage, available_now=True,
                    auto_compact=auto_compact,
                )
                q.awaitTermination()
                apply_sec = round(time.time() - t0, 3)
                m = table.manifest()
                depth = max(
                    (len(r) for r in m.get("deltas", {}).values()), default=0
                )
                epochs.append({
                    "epoch": int(seg),
                    "apply_sec": apply_sec,
                    "delta_depth_max": depth,
                    "read_sec": timed_read(table),
                })
            return {
                "auto_compact": auto_compact,
                "final_rows": table.read().count(),
                "epochs": epochs,
                "read_sec_first4_mean": round(
                    sum(e["read_sec"] for e in epochs[:4]) / 4, 3
                ),
                "read_sec_last4_mean": round(
                    sum(e["read_sec"] for e in epochs[-4:]) / 4, 3
                ),
                "max_depth_seen": max(e["delta_depth_max"] for e in epochs),
            }

        compacted = run_config("ac4", auto_compact=4)
        probe_mid = _probe()
        uncompacted = run_config("none", auto_compact=None)
        probe_end = _probe()
        # final-state agreement between the two configs (compaction
        # must never change the answer)
        assert compacted["final_rows"] == uncompacted["final_rows"]

        print(json.dumps({
            "bench": "tailer_econ",
            "cores": cores,
            "n_events": n_events,
            "n_segments": n_segments,
            "events_per_segment": seg_size,
            "probes_raw": {
                "start": round(probe_start, 1),
                "mid": round(probe_mid, 1),
                "end": round(probe_end, 1),
            },
            "auto_compact_4": compacted,
            "no_compact": uncompacted,
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
