"""Streaming hop/tumbling windows must agree with the batch
recomputation of the same expression once the watermark has closed
every window (SURVEY §2.10 window matrix; reprocessing-equivalence
property). Reuses test_sessions' feed-segmentation pattern: ordered
segment files + far-future sentinels that push the watermark past
every real window.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from open_bus_gtfs_etl_spark.streaming.windows import window_counts

T0_US = 1_700_000_000_000_000


def _gen_events(seed: int = 11, n: int = 4000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts_us = T0_US + rng.integers(0, 3 * 3600, size=n) * 1_000_000
    df = pd.DataFrame(
        {
            "conv_id": [f"c{int(i) % 40:03d}" for i in rng.integers(0, 40, size=n)],
            "lsn": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.sort(ts_us), unit="us"),
        }
    )
    return df


def _write_segments(df: pd.DataFrame, feed_dir: str, n_seg: int = 5) -> None:
    os.makedirs(feed_dir, exist_ok=True)
    df = df.assign(ts=df["ts"].dt.tz_localize("UTC").astype("datetime64[us, UTC]"))
    bounds = np.linspace(0, len(df), n_seg + 1).astype(int)
    t = time.time() - 1000
    for k in range(n_seg):
        part = df.iloc[bounds[k]:bounds[k + 1]].sample(frac=1.0, random_state=k)
        path = os.path.join(feed_dir, f"seg-{k:03d}.parquet")
        part.to_parquet(path, index=False)
        os.utime(path, (t + k, t + k))
    far = df["ts"].max()
    for j, delta in enumerate((1, 2)):
        s = pd.DataFrame(
            {"conv_id": ["zz-sentinel"], "lsn": [10**9 + j],
             "ts": pd.Series([far + pd.Timedelta(hours=delta)])
                 .astype("datetime64[us, UTC]")}
        )
        path = os.path.join(feed_dir, f"zz-sentinel-{j}.parquet")
        s.to_parquet(path, index=False)
        os.utime(path, (t + n_seg + j, t + n_seg + j))


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[pdf["first_lsn"] < 10**9].copy()
    for c in ("window_start", "window_end"):
        pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(["window_start", "window_end"]).reset_index(drop=True)


def _run(spark, tmp_path, slide):
    ev = _gen_events()
    feed = str(tmp_path / f"feed_{slide or 'none'}".replace(" ", "_"))
    _write_segments(ev, feed)
    schema = "conv_id string, lsn long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    name = f"hopwin_{abs(hash((str(tmp_path), slide)))}"
    q = (
        window_counts(stream, size="10 minutes", slide=slide)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{slide or 'none'}".replace(" ", "_")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    live = spark.sql(f"SELECT * FROM {name}").toPandas()
    batch = window_counts(
        spark.read.schema(schema).parquet(feed), size="10 minutes", slide=slide
    ).toPandas()
    return _canon(live), _canon(batch)


def test_streaming_tumbling_matches_batch(tmp_path, spark):
    live, batch = _run(spark, tmp_path, None)
    assert len(live) > 0
    pd.testing.assert_frame_equal(live, batch, check_dtype=False)


def test_streaming_hop_matches_batch(tmp_path, spark):
    live, batch = _run(spark, tmp_path, "5 minutes")
    assert len(live) > 0
    # every event must land in exactly size/slide = 2 windows
    assert live["n_events"].sum() == 2 * 4000
    pd.testing.assert_frame_equal(live, batch, check_dtype=False)
