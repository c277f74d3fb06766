"""The bench regression gate must not cry wolf under machine
contention (r8: a doc-only commit got 10 named "regressions" on a box
whose calibration probe ran +33%) and must still catch a real seeded
slowdown on a quiet box. Pure-function tests — no Spark session."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import _regression_report

PREV = {
    "queries": {"q_a": 1.0, "q_b": 0.5, "q_tiny": 0.1},
    "calibration": {"spark_probe_s": 0.40},
}


def test_quiet_box_catches_seeded_regression():
    # q_a genuinely 2x slower on an equally-calibrated box
    regs, note = _regression_report(
        {"q_a": 2.0, "q_b": 0.55, "q_tiny": 0.3}, PREV, probe_now=0.41
    )
    assert set(regs) == {"q_a"}
    assert regs["q_a"] == {"prev": 1.0, "now": 2.0}
    assert note is None  # 2.5% probe drift: no calibration note


def test_contended_box_names_zero_regressions():
    # everything uniformly +60% INCLUDING the calibration probe —
    # machine load, not code: threshold scales, nothing is named,
    # and the drift is recorded explicitly
    regs, note = _regression_report(
        {"q_a": 1.6, "q_b": 0.8, "q_tiny": 0.16},
        PREV,
        probe_now=0.40 * 1.6,
    )
    assert regs == {}
    assert note is not None and note["ratio"] == 1.6


def test_real_regression_survives_contention():
    # box +30%, but q_a is 3x slower — beyond what contention explains
    regs, _ = _regression_report(
        {"q_a": 3.0, "q_b": 0.6}, PREV, probe_now=0.40 * 1.3
    )
    assert set(regs) == {"q_a"}


def test_faster_box_does_not_relax_threshold():
    # probe halved (faster/quieter box): threshold stays 1.5x, so a
    # 1.6x slowdown is still named — a fast box must not hide one
    regs, note = _regression_report(
        {"q_a": 1.6}, PREV, probe_now=0.20
    )
    assert set(regs) == {"q_a"}
    assert note is not None and note["ratio"] == 0.5


def test_sub_floor_and_cold_store_annotations():
    # q_tiny is below the 0.2 s floor: never named. A cold-store
    # query's entry carries the cold_store marker for attribution.
    regs, _ = _regression_report(
        {"q_tiny": 0.9, "q_b": 2.0},
        PREV,
        probe_now=0.40,
        store_hit={"q_b": False},
    )
    assert "q_tiny" not in regs
    assert regs["q_b"]["cold_store"] is True


def test_no_prev_calibration_falls_back_to_raw_threshold():
    regs, note = _regression_report(
        {"q_a": 1.6}, {"queries": {"q_a": 1.0}}, probe_now=0.4
    )
    assert set(regs) == {"q_a"}
    assert note is None


def test_compact_final_line_fits_driver_tail_window():
    """The driver keeps only ~2 KB of bench stdout and parses its
    last line; r12/r13 recorded "parsed": null because the full
    result was cut mid-JSON. The compact final record — rebuilt here
    exactly as main() builds it, with worst-case-width values over
    the REAL headline set — must stay well inside the window."""
    import json

    from bench import HEADLINE

    compact = {
        "metric": "headline_queries_total_time",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_headline": len(HEADLINE),
        "commit": "a" * 40,
        "cal": [99.999, 99.999],
        "queries": {name: 999.99 for name in HEADLINE},
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900, len(line)
