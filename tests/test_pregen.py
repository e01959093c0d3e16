"""The bench pregen-WAL cache gates against drift and incompleteness:
a cached WAL is accepted only when its recipe token matches the exact
generation parameters AND the current genlog source md5, and every
segment passes the producer-manifest completeness gate. Anything else
→ fresh generation (bench.py `_valid_pregen`). The gates catch stale
recipes, generator changes, and truncated/missing segments — they are
NOT tamper-proofing (the manifest checks footer row counts, not
content checksums, so a same-rowcount content edit would pass); the
threat model is accidental staleness, which is what makes "reuse the
deterministic input" pure caching rather than a benchmark integrity
risk.
"""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_mod_pregen", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write_pregen_wal(spark, path: str, n: int) -> dict:
    from open_bus_gtfs_etl_spark.genlog import generate_events, write_wal

    tok = bench._pregen_token(n)
    events = generate_events(
        spark, n, n_conv=tok["n_conv"], seed=tok["seed"],
        dup_rate=tok["dup_rate"], ooo_rate=tok["ooo_rate"],
        seg_size=tok["seg_size"],
    )
    write_wal(events, path)
    return tok


def test_pregen_token_and_manifest_gates(spark, tmp_path):
    n = 2000
    d = str(tmp_path / f"wal_{n}")
    tok = _write_pregen_wal(spark, d, n)

    # no token on disk yet → rejected even though the data is complete
    assert not bench._valid_pregen(d, n)

    with open(os.path.join(d, "_PREGEN.json"), "w") as f:
        json.dump(tok, f)
    assert bench._valid_pregen(d, n)

    # a different requested size never matches this cache
    assert not bench._valid_pregen(d, n + 1)

    # genlog source drift (stale md5) invalidates the cache
    with open(os.path.join(d, "_PREGEN.json"), "w") as f:
        json.dump({**tok, "genlog_md5": "0" * 32}, f)
    assert not bench._valid_pregen(d, n)

    # restore the token, then tamper with the data: removing one data
    # file makes the footer count disagree with the producer manifest,
    # and the per-segment completeness gate must reject the whole cache
    with open(os.path.join(d, "_PREGEN.json"), "w") as f:
        json.dump(tok, f)
    assert bench._valid_pregen(d, n)
    seg_dir = os.path.join(d, "v1", "seg=0")
    victim = next(
        fn for fn in sorted(os.listdir(seg_dir)) if fn.endswith(".parquet")
    )
    os.remove(os.path.join(seg_dir, victim))
    assert not bench._valid_pregen(d, n)


def test_pregen_rejects_missing_dir(tmp_path):
    assert not bench._valid_pregen(str(tmp_path / "nope"), 1000)
