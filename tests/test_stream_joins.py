"""Stream-stream event-time join must agree with the batch
recomputation of the same expression once the watermark has passed
every event (SURVEY §2.10; reprocessing-equivalence property) — for
INNER and for LEFT OUTER, whose null rows streaming may only emit
after the watermark proves no match can still arrive.

Uses the segment-file + far-future-sentinel pattern of
test_windows.py, with per-side sentinel conv_ids so sentinels never
join each other.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from open_bus_gtfs_etl_spark.streaming.joins import join_tool_results

T0_US = 1_700_000_000_000_000
TURN_SCHEMA = "conv_id string, lsn long, ts timestamp"
RESULT_SCHEMA = "conv_id string, result_id long, ts timestamp"


def _gen_feeds(seed: int = 7, n_turns: int = 800) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    turn_ts = T0_US + rng.integers(0, 2 * 3600, size=n_turns) * 1_000_000
    turns = pd.DataFrame(
        {
            "conv_id": [f"c{int(i) % 30:03d}" for i in rng.integers(0, 30, size=n_turns)],
            "lsn": np.arange(n_turns, dtype=np.int64),
            "ts": pd.to_datetime(np.sort(turn_ts), unit="us"),
        }
    )
    # ~60% of turns get a result 0..15 min later (tolerance is 10 min,
    # so some deliberately fall outside); plus 10% results for
    # conversations with a mismatched id → never join
    take = rng.random(n_turns) < 0.6
    base = turns[take]
    delay_s = rng.integers(0, 15 * 60, size=len(base))
    results = pd.DataFrame(
        {
            "conv_id": base["conv_id"].to_numpy(),
            "result_id": np.arange(len(base), dtype=np.int64),
            "ts": base["ts"].to_numpy() + pd.to_timedelta(delay_s, unit="s"),
        }
    )
    stray = pd.DataFrame(
        {
            "conv_id": ["zz-no-such-conv"] * 40,
            "result_id": np.arange(10_000, 10_040, dtype=np.int64),
            "ts": pd.to_datetime(
                T0_US + rng.integers(0, 2 * 3600, size=40) * 1_000_000, unit="us"
            ),
        }
    )
    results = (
        pd.concat([results, stray], ignore_index=True)
        .sort_values("ts")
        .reset_index(drop=True)
    )
    return turns, results


def _write_segments(df: pd.DataFrame, feed_dir: str, sentinel: dict, n_seg: int = 4) -> None:
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
    for j, delta in enumerate((3, 4)):
        s = pd.DataFrame(
            {
                **{k: [v] for k, v in sentinel.items()},
                "ts": pd.Series([far + pd.Timedelta(hours=delta)]).astype(
                    "datetime64[us, UTC]"
                ),
            }
        )
        path = os.path.join(feed_dir, f"zz-sentinel-{j}.parquet")
        s.to_parquet(path, index=False)
        os.utime(path, (t + n_seg + j, t + n_seg + j))


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[~pdf["conv_id"].str.startswith("zz-sent")].copy()
    for c in ("turn_ts", "result_ts"):
        pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf.sort_values(
        ["conv_id", "turn_lsn", "result_id"], na_position="last"
    ).reset_index(drop=True)


def _run(spark, tmp_path, how: str):
    turns, results = _gen_feeds()
    tdir = str(tmp_path / f"turns_{how}")
    rdir = str(tmp_path / f"results_{how}")
    _write_segments(turns, tdir, {"conv_id": "zz-sent-t", "lsn": 10**9})
    _write_segments(results, rdir, {"conv_id": "zz-sent-r", "result_id": 10**9})
    ts = (
        spark.readStream.schema(TURN_SCHEMA).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    rs = (
        spark.readStream.schema(RESULT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir)
    )
    name = f"ssjoin_{how}_{abs(hash(str(tmp_path)))}"
    q = (
        join_tool_results(ts, rs, watermark="30 minutes", tolerance="10 minutes", how=how)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{how}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    live = spark.sql(f"SELECT * FROM {name}").toPandas()
    batch = join_tool_results(
        spark.read.schema(TURN_SCHEMA).parquet(tdir),
        spark.read.schema(RESULT_SCHEMA).parquet(rdir),
        tolerance="10 minutes",
        how=how,
    ).toPandas()
    return _canon(live), _canon(batch)


def test_stream_stream_inner_matches_batch(tmp_path, spark):
    live, batch = _run(spark, tmp_path, "inner")
    assert len(live) > 0
    pd.testing.assert_frame_equal(live, batch, check_dtype=False)


def test_stream_stream_left_outer_matches_batch(tmp_path, spark):
    live, batch = _run(spark, tmp_path, "left_outer")
    # outer rows exist: some turns have no result within tolerance
    assert live["result_id"].isna().any()
    # and every turn event survives exactly its match count (>=1 row)
    assert live["turn_lsn"].nunique() == 800
    pd.testing.assert_frame_equal(live, batch, check_dtype=False)
