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
