"""Bench-harness contract: the driver keeps only the LAST 2,000 bytes of
bench.py's merged output and parses the JSON line found there. Round 5's
line grew to 2,884 bytes (spreads + timing note inline) and the driver
recorded ``parsed: null`` — an entire round of perf evidence lost to a
process defect. These guards make that structurally impossible again."""

import json

from bench import HEADLINE, _LINE_BUDGET, compact_line, final_line
from orca_spark.queries import queries


def test_headline_queries_are_registered():
    q = queries()
    missing = [n for n in HEADLINE if n not in q]
    assert not missing, missing
    assert len(HEADLINE) == len(set(HEADLINE))


def test_final_line_fits_capture_window_worst_case():
    """Render the driver-facing line through final_line() with
    worst-plausible-width timings (three integer digits + three
    decimals per query, 999.999 s — a 17-minute single query, ~20x
    anything the series has recorded) and assert it clears the
    2,000-byte window with headroom. final_line's degrade path
    (coarser rounding, then dropping slowest entries) is the structural
    guarantee; adding a HEADLINE entry can therefore never lose the
    JSON head, only — in pathological widths — per-query precision."""
    timings = {n: 999.999 for n in HEADLINE}
    line, _dropped = final_line(
        99999.999, timings, 0.1, {"serial": 999.999, "parallel": 999.999}
    )
    assert len(line) <= _LINE_BUDGET, (len(line), _LINE_BUDGET)
    rec = json.loads(line)
    assert rec["value"] == 99999.999  # total always sums every query


def test_final_line_realistic_widths_keep_every_query():
    """At the widths the series actually records (two integer digits),
    no entry may be dropped from the breakdown — the degrade path may
    only coarsen rounding. BENCH_r11's widest entry was 10.835 s."""
    timings = {n: 99.999 for n in HEADLINE}
    line, dropped = final_line(
        9999.999, timings, 0.1, {"serial": 99.999, "parallel": 99.999}
    )
    assert len(line) <= _LINE_BUDGET, (len(line), _LINE_BUDGET)
    assert dropped == []
    assert set(json.loads(line)["queries"]) == set(HEADLINE)


def test_headline_superset_of_last_driver_record():
    """The optimization-round bench contract is add-only: every query
    name the driver last recorded (BENCH_r11) must still be on the
    line. Retiring an entry — even a flat sub-second one — reads as a
    disappeared measurement to the driver's round-over-round compare."""
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_r11.json")) as f:
        prev = json.load(f)
    prev_names = set((prev.get("parsed") or {}).get("queries", {}))
    assert prev_names, "BENCH_r11.json lost its parsed queries"
    missing = sorted(prev_names - set(HEADLINE))
    assert not missing, missing


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
