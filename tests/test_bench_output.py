"""The bench summary line must stay inside the driver's 2000-byte stdout
tail no matter how many headline queries exist (round-4 postmortem:
BENCH_r04.json recorded "parsed": null because the 59-query map pushed the
{"metric": ...} prefix out of the tail window). No Spark needed here —
build_output_lines is pure."""

import json

from bench import build_output_lines


def _fake_timings(n):
    return {f"very_long_query_name_number_{i:04d}_padding": round(0.001 * i, 3)
            for i in range(n)}


def test_summary_line_bounded_at_any_query_count():
    for n in (0, 1, 59, 200, 1000):
        timings = _fake_timings(n)
        total = round(sum(timings.values()), 3)
        detail, summary = build_output_lines(timings, total, 0.1)
        assert len(summary) <= 1600, (n, len(summary))
        parsed = json.loads(summary)
        assert parsed["metric"] == "headline_queries_wall_clock"
        assert parsed["value"] == total
        assert parsed["n_queries"] == n
        assert parsed["unit"] == "sec"
        assert parsed["sf"] == 0.1


def test_detail_line_carries_full_map():
    timings = _fake_timings(200)
    detail, _ = build_output_lines(timings, 1.0, 0.01)
    parsed = json.loads(detail)
    assert parsed["queries"] == timings


def test_summary_keeps_slowest_queries():
    timings = _fake_timings(200)
    _, summary = build_output_lines(timings, 1.0, 0.1)
    kept = json.loads(summary)["queries"]
    assert kept  # some queries fit
    slowest = max(timings, key=timings.get)
    assert slowest in kept
    # every kept timing >= every dropped timing
    dropped_max = max(v for k, v in timings.items() if k not in kept)
    assert min(kept.values()) >= dropped_max
