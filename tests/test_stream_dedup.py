"""Watermarked streaming dedup must agree with the batch
dropDuplicates oracle on a feed with injected redeliveries (SURVEY
§2.10; the redelivery-shed in front of the merge kernel).

Duplicates are exact copies injected (a) inside the same segment
(same micro-batch — always in state) and (b) from the tail of each
segment into the next one (event time within the watermark horizon
when redelivered), so every injected duplicate is guaranteed
droppable and the streaming result must equal the batch dedup
exactly.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from open_bus_gtfs_etl_spark.streaming.dedup import dedup_within_watermark

T0_US = 1_700_000_000_000_000
SCHEMA = "conv_id string, lsn long, ts timestamp"


def _gen_feed(seed: int = 5, n: int = 3000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts_us = T0_US + np.sort(rng.integers(0, 2 * 3600, size=n)) * 1_000_000
    return pd.DataFrame(
        {
            "conv_id": [f"c{int(i) % 50:03d}" for i in rng.integers(0, 50, size=n)],
            "lsn": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )


def _write_segments_with_dups(df: pd.DataFrame, feed_dir: str, n_seg: int = 5) -> int:
    os.makedirs(feed_dir, exist_ok=True)
    df = df.assign(ts=df["ts"].dt.tz_localize("UTC").astype("datetime64[us, UTC]"))
    bounds = np.linspace(0, len(df), n_seg + 1).astype(int)
    t = time.time() - 1000
    n_dups = 0
    carry = df.iloc[0:0]
    for k in range(n_seg):
        part = df.iloc[bounds[k]:bounds[k + 1]]
        # (a) same-segment redelivery: every 7th row twice
        same = part.iloc[::7]
        # (b) cross-segment redelivery: rows from the previous
        # segment's last 10 event-time minutes, well inside the
        # 30-minute watermark horizon when this segment arrives
        seg = pd.concat([part, same, carry], ignore_index=True).sample(
            frac=1.0, random_state=k
        )
        n_dups += len(same) + len(carry)
        cutoff = part["ts"].max() - pd.Timedelta(minutes=10)
        carry = part[part["ts"] >= cutoff].iloc[::5]
        path = os.path.join(feed_dir, f"seg-{k:03d}.parquet")
        seg.to_parquet(path, index=False)
        os.utime(path, (t + k, t + k))
    return n_dups


def test_streaming_dedup_matches_batch(tmp_path, spark):
    feed = str(tmp_path / "feed")
    df = _gen_feed()
    n_dups = _write_segments_with_dups(df, feed)
    assert n_dups > 100  # the feed genuinely redelivers

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(feed)
    )
    name = f"sdedup_{abs(hash(str(tmp_path)))}"
    q = (
        dedup_within_watermark(stream, watermark="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    live = (
        spark.sql(f"SELECT * FROM {name}")
        .toPandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    batch = (
        dedup_within_watermark(spark.read.schema(SCHEMA).parquet(feed))
        .toPandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    # every original event exactly once, every redelivery shed
    assert len(live) == len(df)
    pd.testing.assert_frame_equal(live, batch, check_dtype=False)
