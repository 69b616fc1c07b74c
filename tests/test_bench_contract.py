"""Bench-harness contract: the driver keeps only the LAST 2,000 bytes of
bench.py's merged output and parses the JSON line found there. Round 5's
line grew to 2,884 bytes (spreads + timing note inline) and the driver
recorded ``parsed: null`` — an entire round of perf evidence lost to a
process defect. These guards make that structurally impossible again."""

import json

from bench import HEADLINE, _LINE_BUDGET, compact_line
from orca_spark.queries import queries


def test_headline_queries_are_registered():
    q = queries()
    missing = [n for n in HEADLINE if n not in q]
    assert not missing, missing
    assert len(HEADLINE) == len(set(HEADLINE))


def test_compact_line_fits_capture_window_worst_case():
    """Render the driver-facing line with worst-plausible-width timings
    (three integer digits + three decimals per query, 999.999 s — a
    17-minute single query, ~20x anything the series has recorded; at
    FOUR digits the whole bench could not finish inside a round, so
    that width is not a plausible line, and main()'s degrade path
    still guarantees <= budget if it ever happened) and assert it
    clears the 2,000-byte window with headroom. Adding a HEADLINE
    entry that would overflow fails here, at commit time, instead of
    in the next round's BENCH file."""
    timings = {n: 999.999 for n in HEADLINE}
    line = compact_line(
        99999.999, timings, 0.1, {"serial": 999.999, "parallel": 999.999}
    )
    assert len(line) <= _LINE_BUDGET, (len(line), _LINE_BUDGET)


def test_compact_line_is_single_parseable_json():
    timings = {n: 1.234 for n in HEADLINE}
    line = compact_line(
        sum(timings.values()), timings, 0.1, {"serial": 0.1, "parallel": 0.9}
    )
    assert "\n" not in line
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_sec"
    assert rec["unit"] == "sec"
    assert set(rec["queries"]) == set(HEADLINE)
    assert rec["sf"] == 0.1
    # both host calibrations ride the driver line since r12 — the r11
    # riser verdict stalled because the calibration lived only in the
    # working-tree BENCH_DETAIL.json the driver may overwrite
    assert rec["cal"] == {"serial": 0.1, "parallel": 0.9}
