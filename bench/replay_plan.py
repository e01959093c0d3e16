"""Capture the executed write plan of the real bootstrap replay path.

Runs apply_batch (dedup="argmax_lsn") on a small generated batch against
a fresh CoW table, intercepting the parquet write to dump the final
DataFrame's .explain("formatted") — the exact plan the bench replay
executes, captured from the production code path rather than a replica.

Usage: python bench/replay_plan.py <out.txt> [n_events] [table_mode]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    table_mode = sys.argv[3] if len(sys.argv) > 3 else "cow"

    from pyspark.sql.readwriter import DataFrameWriter

    from open_bus_gtfs_etl_spark.genlog import generate_events
    from open_bus_gtfs_etl_spark.operators.merge import apply_batch
    from open_bus_gtfs_etl_spark.schema import TRANSCRIPTS_SCHEMA
    from open_bus_gtfs_etl_spark.session import get_spark
    from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

    spark = get_spark(
        app_name="replay-plan", master="local[4]", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.sql.adaptive.enabled": "false"},
    )

    plans: list[str] = []
    orig = DataFrameWriter.parquet

    def capture(self, path, **kw):
        plans.append(self._df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")))
        return orig(self, path, **kw)

    DataFrameWriter.parquet = capture
    work = tempfile.mkdtemp(prefix="plan_")
    try:
        tbl = SnapshotParquetTable.create(
            spark, os.path.join(work, "lake"), TRANSCRIPTS_SCHEMA,
            key_cols=["conv_id", "turn_idx"], n_buckets=32, mode=table_mode,
        )
        ev = generate_events(spark, n_events, n_conv=max(64, n_events // 20),
                             seed=42, dup_rate=0.02, ooo_rate=0.02,
                             seg_size=n_events)
        st = apply_batch(tbl, ev.drop("seg"), batch_id=0, dedup="argmax_lsn")
        rows = tbl.read().count()
    finally:
        DataFrameWriter.parquet = orig
        shutil.rmtree(work, ignore_errors=True)
    with open(out_path, "w") as f:
        f.write(f"-- bootstrap apply_batch(dedup=argmax_lsn, {table_mode}), "
                f"n_events={n_events}\n-- merge stats: { {k: v for k, v in st.items() if not k.startswith('per_')} }\n"
                f"-- final table rows: {rows}\n\n")
        f.write("\n\n".join(plans))
    print(f"wrote {out_path}: {len(plans)} write plan(s), table rows={rows}, "
          f"stats={st}")
    spark.stop()


if __name__ == "__main__":
    main()
