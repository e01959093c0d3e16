"""One-off: generate a 64M-event WAL into /dev/shm, timing gen+write.
Usage: python bench/r5/gen_wal.py [n_events] [out_dir]"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
out = sys.argv[2] if len(sys.argv) > 2 else f"/dev/shm/wal_{n_events}"

from open_bus_gtfs_etl_spark.genlog import generate_events, write_wal  # noqa: E402
from open_bus_gtfs_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="genwal", master="local[32]", shuffle_partitions=32,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.range(1000).count()
t0 = time.time()
events = generate_events(spark, n_events, n_conv=max(64, n_events // 20), seed=42,
                         dup_rate=0.02, ooo_rate=0.02, seg_size=n_events)
segs = write_wal(events, out)
elapsed = time.time() - t0
size = 0
for root, _, files in os.walk(out):
    for f in files:
        size += os.path.getsize(os.path.join(root, f))
print(json.dumps({"n_events": n_events, "gen_write_sec": round(elapsed, 1),
                  "wal_bytes": size, "segs": segs, "out": out}))
spark.stop()
