"""Session-window streaming: the built-in session_window plan and the
applyInPandasWithState custom-state plan must agree with each other
and with the batch oracle once every session has closed (SURVEY §2.10
stateful-operator item).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from open_bus_gtfs_etl_spark.streaming.sessions import (
    sessionize,
    sessionize_batch,
    sessionize_stateful,
)

GAP_S = 600
T0_US = 1_700_000_000_000_000  # fixed epoch anchor, microseconds


def _gen_events(seed: int = 7, n_conv: int = 30) -> pd.DataFrame:
    """Deterministic multi-session event set: per conversation 1-3
    sessions of 2-8 events ~1-50s apart, sessions ~25-40 min apart
    (> gap), all inside a global 3-hour timeline."""
    rng = np.random.default_rng(seed)
    rows = []
    lsn = 0
    for c in range(n_conv):
        t = T0_US + int(rng.integers(0, 600)) * 1_000_000
        for _s in range(int(rng.integers(1, 4))):
            for _e in range(int(rng.integers(2, 9))):
                rows.append((f"c{c:03d}", lsn, t))
                lsn += 1
                t += int(rng.integers(1, 50)) * 1_000_000
            t += int(rng.integers(25, 40)) * 60_000_000  # next session
    df = pd.DataFrame(rows, columns=["conv_id", "lsn", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    return df.drop(columns=["ts_us"])


def _write_segments(df: pd.DataFrame, feed_dir: str, n_seg: int = 6) -> None:
    """Partition events into time-ordered segment files (cross-file
    event time monotonic, within-file shuffled) plus two far-future
    sentinel files that advance the watermark past every session end
    and give the engine the extra micro-batches where event-time
    timeouts fire. File mtimes are forced monotonic — the file source
    processes oldest-first."""
    os.makedirs(feed_dir, exist_ok=True)
    df = df.sort_values("ts", kind="mergesort").reset_index(drop=True)
    # micro-second UTC-adjusted parquet timestamps — what a Spark
    # TimestampType file-stream schema expects (pandas' default nanos
    # are unreadable by the vectorized reader)
    df = df.assign(ts=df["ts"].dt.tz_localize("UTC").astype("datetime64[us, UTC]"))
    bounds = np.linspace(0, len(df), n_seg + 1).astype(int)
    t = time.time() - 1000
    for k in range(n_seg):
        part = df.iloc[bounds[k]:bounds[k + 1]]
        part = part.sample(frac=1.0, random_state=k)  # within-file OOO
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


def _run_stream(spark, plan_df, name: str, ckpt: str) -> pd.DataFrame:
    q = (
        plan_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql(f"SELECT * FROM {name}").toPandas()
    return (
        out[out.conv_id != "zz-sentinel"]
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in ("session_start", "session_end"):
        df[c] = df[c].astype("datetime64[us]")
    return (
        df[["conv_id", "session_start", "session_end", "n_events",
            "first_lsn", "last_lsn"]]
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )


def test_both_formulations_match_batch_oracle(tmp_path, spark):
    ev = _gen_events()
    feed = str(tmp_path / "feed")
    _write_segments(ev, feed)
    want = _canon(sessionize_batch(ev, gap_seconds=GAP_S))
    assert len(want) > 30  # multi-session corpus, not degenerate

    schema = "conv_id string, lsn long, ts timestamp"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    got_builtin = _canon(
        _run_stream(spark, sessionize(src, gap=f"{GAP_S} seconds"),
                    "sess_builtin", str(tmp_path / "ck1"))
    )
    src2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    got_stateful = _canon(
        _run_stream(
            spark, sessionize_stateful(src2, gap_seconds=GAP_S),
            "sess_stateful", str(tmp_path / "ck2")
        )
    )

    pd.testing.assert_frame_equal(got_builtin, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_stateful, want, check_dtype=False)


def test_stateful_handles_multi_session_batch(tmp_path, spark):
    """One file containing three sessions of the same key (split purely
    inside a single micro-batch) plus the sentinel files: the in-batch
    gap splitter must emit the two closed sessions without waiting for
    a timeout, and the trailing one on timeout."""
    rows = []
    t = T0_US
    lsn = 0
    for _s in range(3):
        for _e in range(4):
            rows.append(("conv-x", lsn, t))
            lsn += 1
            t += 10_000_000
        t += 2 * GAP_S * 1_000_000
    ev = pd.DataFrame(rows, columns=["conv_id", "lsn", "ts_us"])
    ev["ts"] = pd.to_datetime(ev["ts_us"], unit="us")
    ev = ev.drop(columns=["ts_us"])
    feed = str(tmp_path / "feed")
    _write_segments(ev, feed, n_seg=1)

    schema = "conv_id string, lsn long, ts timestamp"
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    got = _canon(
        _run_stream(spark, sessionize_stateful(src, gap_seconds=GAP_S),
                    "sess_multi", str(tmp_path / "ck"))
    )
    want = _canon(sessionize_batch(ev, gap_seconds=GAP_S))
    assert len(want) == 3
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
