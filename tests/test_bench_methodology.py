"""Unit tests for bench.py's scaling-evidence rules: adjacent-pair
efficiency computation, the suspect (>1.05) outcome gate, the
probe-floor covariate gate, and the median-over-qualified headline.
These rules ARE the BENCH_r{N}.json record's credibility, so they get
the same test treatment as engine operators. Pure-Python — no Spark.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _samples(pairs):
    """Build a samples dict from [(low_eps, low_probe, high_eps,
    high_probe), ...] with low=1, high=4."""
    return {
        1: [{"events_per_sec": l, "probe_raw": lp} for l, lp, _, _ in pairs],
        4: [{"events_per_sec": h, "probe_raw": hp} for _, _, h, hp in pairs],
    }


def test_pair_effs_adjacent_pairing_and_ratio():
    s = _samples([(100.0, 1.0, 400.0, 1.0), (100.0, 1.0, 300.0, 1.0)])
    pairs = bench._pair_effs(s, 1, 4, best_raw=1.0)
    assert [round(p["eff"], 3) for p in pairs] == [1.0, 0.75]
    assert all(p["min_probe"] == 1.0 for p in pairs)


def test_pair_effs_skips_failed_samples():
    s = _samples([(0.0, 1.0, 400.0, 1.0), (100.0, 1.0, 300.0, 1.0)])
    pairs = bench._pair_effs(s, 1, 4, best_raw=1.0)
    assert len(pairs) == 1 and round(pairs[0]["eff"], 3) == 0.75


def test_pair_effs_min_probe_normalizes_to_session_best():
    s = _samples([(100.0, 0.5, 400.0, 0.8)])
    (p,) = bench._pair_effs(s, 1, 4, best_raw=1.0)
    assert p["min_probe"] == 0.5
    (p,) = bench._pair_effs(s, 1, 4, best_raw=2.0)
    assert p["min_probe"] == 0.25


def test_pair_effs_min_probe_includes_completion_probes():
    # the window can collapse mid-sample (r4 run E): the covariate is
    # the MIN over both sides' launch AND completion probes, so a
    # clean launch followed by a collapsed window still disqualifies
    s = {
        1: [{"events_per_sec": 100.0, "probe_raw": 1.0,
             "probe_raw_after": 0.4}],
        4: [{"events_per_sec": 400.0, "probe_raw": 0.9,
             "probe_raw_after": 0.95}],
    }
    (p,) = bench._pair_effs(s, 1, 4, best_raw=1.0)
    assert p["min_probe"] == 0.4
    # absent completion probes (older records) fall back to launch-only
    s[1][0].pop("probe_raw_after")
    s[4][0].pop("probe_raw_after")
    (p,) = bench._pair_effs(s, 1, 4, best_raw=1.0)
    assert p["min_probe"] == 0.9


def test_headline_excludes_suspect_and_low_window_pairs():
    pairs = [
        {"eff": 1.2, "min_probe": 0.9},   # suspect: impossible ratio
        {"eff": 0.9, "min_probe": 0.5},   # low window: probe < 0.7
        {"eff": 0.85, "min_probe": 0.8},  # qualified
        {"eff": 0.8, "min_probe": 0.75},  # qualified
    ]
    assert bench._headline_effs(pairs) == [0.85, 0.8]


def test_headline_falls_back_to_nonsuspect_when_probe_gate_empties():
    pairs = [
        {"eff": 0.9, "min_probe": 0.5},
        {"eff": 0.7, "min_probe": 0.6},
        {"eff": 1.3, "min_probe": 0.9},
    ]
    # probe gate leaves nothing -> all non-suspect pairs (never the
    # suspect 1.3, and never an empty headline while real pairs exist)
    assert bench._headline_effs(pairs) == [0.9, 0.7]


def test_headline_treats_missing_probe_as_qualified():
    # probe can be None for samples predating the stamp (or synthetic
    # replays); absence of covariate evidence is not disqualifying
    pairs = [{"eff": 0.9, "min_probe": None}]
    assert bench._headline_effs(pairs) == [0.9]


def test_median_odd_even_empty():
    assert bench._median([]) is None
    assert bench._median([0.8]) == 0.8
    assert bench._median([0.7, 0.9]) == 0.8
    assert bench._median([0.9, 0.7, 0.8]) == 0.8


def _fake_detail():
    """A detail record shaped like main()'s, sized like a real run
    (14 headline queries, 8 pairs with all probe stamps)."""
    qs = {f"query_{i}_some_operator_name": 123.456 for i in range(14)}
    samples = {
        str(c): [
            {"events_per_sec": 1234567.8, "probe": 0.876, "probe_after": 0.775}
            for _ in range(8)
        ]
        for c in (1, 4)
    }
    return {
        "metric": "change-events/sec", "value": 1358929.7,
        "unit": "events/sec", "sf": 0.1, "queries": qs,
        "queries_probe": {"before": 0.87, "after": 0.82},
        "replay": {
            "n_events": 128_000_000, "n_segments": 3, "n_buckets": 32,
            "mode": "single-batch", "table_mode": "cow",
            "mor_events_per_sec_high": 855513.3, "mor_probe": 0.724,
            "headline": {"cores": 8, "events_per_sec": 1358929.7,
                         "elapsed_sec": 48.037, "probe": 0.876},
        },
        "scaling": {
            "cpus_low": 1, "cpus_high": 4, "n_events": 64_000_000,
            "events_per_sec_low": 228587.5, "events_per_sec_high": 831613.6,
            "efficiency": 0.899, "efficiency_best_pair": 0.929,
            "pair_efficiencies": [0.909, 0.611, 0.883, 0.929, 0.899,
                                  0.852, 0.871, 0.843],
            "probe_components": "x" * 120,
            "headline_pair_efficiencies": [0.883, 0.929, 0.899, 0.852, 0.871],
            "suspect_pair_efficiencies": [],
            "low_window_pair_efficiencies": [0.909, 0.611],
            "pair_min_probes": [0.474, 0.428, 0.837, 0.806, 0.805,
                                0.81, 0.82, 0.83],
            "n_pairs": 8,
            "methodology": "y" * 1200,
            "samples": samples,
        },
        "detail_path": "bench/bench_r5_detail.json",
    }


def test_compact_summary_fits_tail_capture():
    """The round-4 official record was lost (`parsed: null`) because
    the one-line JSON overflowed the driver's tail capture (~2 KB
    observed). The printed line is now a compact summary that must stay
    comfortably under that at a realistic record size."""
    import json

    line = json.dumps(bench._compact_summary(_fake_detail()))
    assert len(line) < 1800, len(line)
    parsed = json.loads(line)
    assert parsed["scaling"]["efficiency"] == 0.899
    assert parsed["scaling"]["n_qualified"] == 5
    assert parsed["scaling"]["qualified_pair_efficiencies"] == [
        0.883, 0.929, 0.899, 0.852, 0.871]
    assert parsed["replay"]["headline_events_per_sec"] == 1358929.7
    # the scaling batch is its own knob (64M vs the 128M headline batch)
    # and the record must say so — a reader comparing the two throughput
    # numbers needs to know they come from different inputs
    assert parsed["scaling"]["n_events"] == 64_000_000
    assert parsed["replay"]["n_events"] == 128_000_000
    assert len(parsed["queries"]) == 14
    assert parsed["scaling"]["detail"] == "bench/bench_r5_detail.json"


def test_compact_summary_drops_bulk_fields():
    """Raw samples and methodology prose must NOT be on the stdout
    line — they are what overflowed the round-4 record."""
    import json

    line = json.dumps(bench._compact_summary(_fake_detail()))
    assert "methodology" not in line
    assert "samples" not in line
    assert "probe_after" not in line
