"""Adversarial events corpus: every events-driven query (batch AND
streaming) must be total over NULL timestamps, NULL keys, malformed
JSON props, and extreme values — the field conditions of any real
event stream. Companion to test_adversarial_corpus.py."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orca_spark.queries import oracle_sql, queries
from tests.conftest import compare_query


def _ts(y, m, d, h=0):
    return datetime.datetime(y, m, d, h)


_ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, _ts(2024, 1, 1, 10), 1, "click", 1.5, '{"k": 3}'),
    (2, _ts(2024, 1, 1, 10), 1, "purchase", 2.5, '{"k": 4}'),
    (3, None, 2, "click", 1.0, '{"k": 1}'),            # NULL event time
    (4, _ts(2024, 1, 1, 11), None, "view", 0.5, "{bad json"),  # NULL key, bad JSON
    (5, _ts(2024, 1, 1, 12), 3, None, -7.25, ""),      # NULL type, negative value
    (6, _ts(2024, 1, 2, 0), 3, "error", None, None),   # NULL value, NULL props
    (7, _ts(1970, 1, 1, 0), 4, "click", 1e12, '{"k": 0}'),     # epoch 0, huge value
    (8, _ts(2200, 1, 1, 0), 4, "purchase", 0.0, '{"j": 9}'),   # far future, wrong key
    (9, _ts(2024, 1, 1, 10), 1, "click", 1.5, '{"k": 3}'),     # dup of event 1 fields
]

_EVENT_QUERIES = [
    "events_hourly_rollup",
    "events_tumbling_15min",
    "events_json_extract",
    "events_sessionize",
    "events_pivot_types",
    "events_changelog_compact",
    "events_scd2_intervals",
    "events_props_typed",
    "events_user_zscore_pandas",
    "events_type_median_pandas_agg",
    "events_log_value_arrow",
    "streaming_hourly_counts",
    "streaming_session_window",
    "streaming_stateful_user_totals",
    "streaming_dedup_user_event_types",
    "streaming_click_purchase_attribution",
    # round-5 events-driven additions
    "events_resample_ffill",
    "events_anomaly_flags",
    "snapshot_diff_events",
    "streaming_incremental_ingest",
    # round-5 batch-2 additions
    "events_markov_transitions",
    "events_value_winsorized",
    "events_heavy_hitters_cms",
    "events_value_histogram",
    "events_value_deciles",
    # r08: the 35 events-only queries the derived completeness contract
    # (test_event_queries_list_is_complete) found missing — the list is
    # no longer trusted by hand
    "events_ab_welch_t",
    "events_acf_hourly",
    "events_active_day_islands",
    "events_bot_score_heuristics",
    "events_burst_hours",
    "events_cohort_retention",
    "events_cusum_changepoint",
    "events_daily_new_vs_returning",
    "events_ewma_smoothed",
    "events_from_json_struct",
    "events_funnel",
    "events_funnel_conversion",
    "events_hourly_gap_interpolation",
    "events_mad_robust",
    "events_multitouch_attribution",
    "events_observed_ingest_metrics",
    "events_props_variant_extract",
    "events_rolling_7day",
    "events_rolling_dau_7d",
    "events_rollup_hierarchy",
    "events_seasonality_index",
    "events_session_window_batch",
    "events_session_window_dynamic_gap",
    "events_slo_burn_rate",
    "events_theilsen_trend",
    "events_top_paths",
    "events_trigram_sequences",
    "events_type_correlation_hourly",
    "events_type_hour_association",
    "events_user_lifecycle",
    "events_user_type_map_metrics",
    "range_join_view_attribution",
    "scalar_regex_extract",
    "skew_salted_aggregate",
    "sql_recursive_type_paths",
    # r08 review: the events-only STREAMING jobs the totality lane was
    # missing (the recorder skips streaming_ so the derived contract
    # cannot see them; test_streaming_queries_are_placed pins the full
    # streaming namespace statically instead)
    "streaming_tws_user_running_max",
    "streaming_tws_last_k_events",
    "streaming_tws_type_counts",
    "streaming_tws_timer_flush",
    "streaming_dedup_within_watermark",
    "streaming_sliding_window_counts",
    "streaming_upsert_snapshot",
    "streaming_foreach_batch_orc",
]


@pytest.fixture(scope="module")
def nasty_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_events_sf")
    cols = list(zip(*_ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


# Excluded from value-level oracle agreement (still totality-checked):
# * streaming_dedup_user_event_types — watermark-mechanics artifacts a
#   batch oracle cannot model: the epoch-0 event equals the INITIAL
#   watermark and is dropped as late, while the NULL-event-time row is
#   carried through; both are pathological-timestamp edges, not dedup
#   semantics.
# * events_type_median_pandas_agg — interpolated quantiles at |value|
#   ~1e12 sit exactly at round(,4) granularity (ulp of 7e11 ≈ 1e-4), so
#   the two engines' interpolation orders can disagree in the rounded
#   digit; magnitudes on the sf corpora are bounded and exact there.
_ORACLE_AGREEMENT_EXCLUDED = {
    "streaming_dedup_user_event_types",
    "events_type_median_pandas_agg",
}


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_query_total_over_degenerate_events(spark, nasty_events_dir, name):
    df = queries()[name](spark, nasty_events_dir)
    assert df.count() >= 0  # must not raise


from tests.conftest import ADVERSARIAL_ORACLE_SWEEP  # noqa: E402


@ADVERSARIAL_ORACLE_SWEEP
@pytest.mark.parametrize(
    "name",
    [
        n
        for n in _EVENT_QUERIES
        if n in oracle_sql() and n not in _ORACLE_AGREEMENT_EXCLUDED
    ],
)
def test_oracle_agreement_over_degenerate_events(spark, duck, nasty_events_dir, name):
    """Value-level Spark-vs-DuckDB compare on the degenerate event rows
    (NULL ts/key/type/value, epoch-0, far-future, malformed JSON) — the
    totality test alone let NULL-ordering and malformed-JSON
    divergences sit latent."""
    compare_query(
        spark, duck, queries()[name], oracle_sql()[name], nasty_events_dir
    )


def test_streaming_queries_are_placed():
    """The table-usage recorder skips streaming_ queries (they execute
    on build), so the derived contracts cannot see them — pin the whole
    streaming namespace statically: every registered streaming query
    must be in an adversarial totality lane (here or the documents
    harness) or in the documented multi-table exception."""
    from tests.test_adversarial_corpus import _DOC_QUERIES

    # events + broadcast customer dim: the nasty single-table corpora
    # cannot serve it; its oracle runs in the full-schema degenerate
    # gate (tests/test_adversarial_full.py)
    multi_table = {"streaming_static_join"}
    streaming = {n for n in queries() if n.startswith("streaming_")}
    unplaced = sorted(
        streaming - set(_EVENT_QUERIES) - set(_DOC_QUERIES) - multi_table
    )
    assert not unplaced, (
        f"streaming queries in no adversarial lane: {unplaced}"
    )


def test_event_queries_list_is_complete(table_usage):
    """Same derived contract as the documents harness
    (test_adversarial_corpus.test_doc_queries_list_is_complete), from
    conftest's shared table_usage recording. Streaming queries execute
    on build and are skipped by the recorder — they are listed manually
    above and exercised by the totality test."""
    events_only = {n for n, t in table_usage.items() if t == {"events"}}
    missing = sorted(events_only - set(_EVENT_QUERIES))
    assert not missing, (
        f"events-only queries absent from _EVENT_QUERIES (add them so "
        f"the degenerate-events totality + oracle-agreement harness "
        f"covers them): {missing}"
    )
