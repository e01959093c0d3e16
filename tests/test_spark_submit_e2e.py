"""End-to-end test of the ship path named by the north rule: the job
runs via ``spark-submit --py-files <engine zip>``, with the engine
importable ONLY from the zip.

The reference ships as a Docker image driven by Airflow
(reference `.github/workflows/CI.yml`, `dags.yaml`); our unit of
deployment is the spark-submit job (`jobs/replay_job.py` +
`jobs/build_pyfiles.py`). This test proves the claim end to end:

- the zip built by ``build_pyfiles.build`` is sufficient (the job file
  is copied OUTSIDE the repo so ``open_bus_gtfs_etl_spark`` cannot
  resolve from the source tree, and PYTHONPATH is stripped);
- the submitted job replays a WAL into a fresh lake table and its
  final state equals the pandas oracle;
- a second submission of the SAME job is fenced to a no-op (snapshot
  version unchanged) — resumability/idempotence hold across separate
  spark-submit invocations, not just within one session.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(job: str, zip_path: str, *job_args: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--driver-memory", "2g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            job, *job_args,
        ],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(job), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_replay_matches_oracle(tmp_path, spark):
    from open_bus_gtfs_etl_spark.genlog import generate_events, write_wal
    from open_bus_gtfs_etl_spark.oracle import fold_events
    from open_bus_gtfs_etl_spark.sources.lake import SnapshotParquetTable

    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        from build_pyfiles import build
    finally:
        sys.path.pop(0)

    ev = generate_events(spark, 4_000, n_conv=120, seed=77,
                         dup_rate=0.05, ooo_rate=0.05, seg_size=2_000)
    ev_pdf = ev.toPandas()
    wal = str(tmp_path / "wal")
    segs = write_wal(ev, wal)

    zip_path = build(str(tmp_path / "engine_pyfiles.zip"))
    # the job file leaves the repo: its sys.path bootstrap then points
    # at tmp_path's parent, so the engine import MUST come from the zip
    job = str(tmp_path / "replay_job.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "replay_job.py"), job)
    table_dir = str(tmp_path / "lake")

    res = _submit(job, zip_path, "--wal", wal, "--table", table_dir,
                  "--create", "--n-buckets", "4",
                  "--lineage", str(tmp_path / "lineage"))
    # ooo/dup deferral spills events into trailing segments, so the
    # exact count comes from write_wal's return, not seg_size arithmetic
    assert res["mode"] == "batch" and res["segments"] == len(segs)
    # the submit line said local[2]; get_spark must defer to it rather
    # than stomping it with a local[*] default (the cluster-deployment
    # contract: --master belongs to spark-submit)
    assert res["default_parallelism"] == 2
    v1 = res["final_version"]

    got = (
        SnapshotParquetTable(spark, table_dir).read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = fold_events(ev_pdf)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # second spark-submit of the same WAL: every segment is fenced, the
    # table version does not move — exactly-once across process restarts
    res2 = _submit(job, zip_path, "--wal", wal, "--table", table_dir,
                   "--n-buckets", "4")
    assert res2["final_version"] == v1
    got2 = (
        SnapshotParquetTable(spark, table_dir).read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)
