"""Behavioral pins for the round-7 batch-9 operators on planted inputs
with hand-computable answers (the oracle suite covers cross-engine
agreement; these pin the SEMANTICS)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orca_spark.queries import queries

_H = 3_600_000_000  # one hour in µs
_D = 24 * _H
_BASE = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, a stable anchor


def _write_events(d, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


def _write_docs(d, rows):
    """rows: (doc_id, text, lang, source)"""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_acf_periodic_series_has_unit_lag2_correlation(spark, tmp_path):
    # events in hours 0,2,4,6,8 of a 9-hour span -> dense series
    # [1,0,1,0,1,0,1,0,1]: lag-2 pairs are identical (acf exactly 1),
    # lag-1 pairs anti-align, and lag 24 exceeds the span (no row)
    rows = [(i, _BASE + 2 * i * _H, 1, "click", 1.0) for i in range(5)]
    d = _write_events(tmp_path, rows)
    got = {r.lag: (r.n_pairs, r.acf) for r in queries()["events_acf_hourly"](spark, d).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == (7, 1.0)
    assert got[1][1] == pytest.approx(-1.0, abs=0.02)  # 8 alternating pairs
    assert got[3][1] == pytest.approx(-1.0, abs=0.02)


def test_seasonality_index_concentrates_on_planted_slot(spark, tmp_path):
    # all events in ONE (iso-dow, hour) slot -> that slot's index is 168,
    # the other 167 slots exist with zero count
    rows = [(i, _BASE + 7 * i * _D, 1, "click", 1.0) for i in range(4)]
    d = _write_events(tmp_path, rows)
    out = queries()["events_seasonality_index"](spark, d).collect()
    assert len(out) == 168
    hot = [r for r in out if r.n_events > 0]
    assert len(hot) == 1 and hot[0].n_events == 4 and hot[0].seasonal_idx == 168.0
    assert hot[0].dow_iso == 2 and hot[0].hod == 22  # 2023-11-14 is a Tuesday


def test_user_lifecycle_status_buckets(spark, tmp_path):
    # user 3 sets the corpus max date; user 2 last seen 20d before
    # (lapsing), user 1 60d before (churned), user 3 active with a
    # 10-day two-visit lifespan
    rows = [
        (1, _BASE, 1, "click", 1.0),
        (2, _BASE + 40 * _D, 2, "click", 1.0),
        (3, _BASE + 50 * _D, 3, "click", 1.0),
        (4, _BASE + 60 * _D, 3, "view", 1.0),
    ]
    d = _write_events(tmp_path, rows)
    got = {r.user_id: r for r in queries()["events_user_lifecycle"](spark, d).collect()}
    assert got[1].status == "churned" and got[1].days_since_last == 60
    assert got[2].status == "lapsing" and got[2].days_since_last == 20
    assert got[3].status == "active" and got[3].days_since_last == 0
    assert got[3].lifespan_days == 10 and got[3].active_days == 2
    assert got[1].first_seen == "2023-11-14"


def test_hapax_ttr_counts(spark, tmp_path):
    d = _write_docs(tmp_path, [(1, "a a b", "en", "s0")])
    r = queries()["text_hapax_ttr_by_lang"](spark, d).collect()[0]
    assert (r.vocab_size, r.n_tokens, r.hapax_count) == (2, 3, 1)
    assert r.hapax_ratio == 0.5 and r.ttr == 0.6667


def test_jsd_disjoint_sources_is_ln2(spark, tmp_path):
    d = _write_docs(tmp_path, [(1, "a b c", "en", "s0"), (2, "x y z", "en", "s1")])
    r = queries()["source_unigram_jsd"](spark, d).collect()[0]
    assert (r.source_a, r.source_b) == ("s0", "s1")
    assert r.jsd_nats == 0.6931  # ln 2: maximal divergence


def test_dedup_rate_by_source(spark, tmp_path):
    d = _write_docs(
        tmp_path,
        [(1, "x", "en", "s0"), (2, "x", "en", "s0"), (3, "y", "en", "s0")],
    )
    r = queries()["corpus_dedup_rate_by_source"](spark, d).collect()[0]
    assert (r.n_docs, r.n_unique, r.n_dups) == (3, 2, 1)
    assert r.dup_pct == 33.3333


def test_sentence_stats(spark, tmp_path):
    d = _write_docs(tmp_path, [(1, "Hello world. Bye!", "en", "s0")])
    r = queries()["text_sentence_stats"](spark, d).collect()[0]
    assert (r.n_docs, r.n_sentences, r.n_words) == (1, 2, 3)
    assert r.sents_per_doc == 2.0 and r.words_per_sentence == 1.5


def test_adjacent_cosine_profile_bins(spark, tmp_path):
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    table = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([e1, e1, e2], pa.list_(pa.float64())),
            "label": pa.array([0, 0, 0], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "embeddings.parquet"))
    got = {
        r.bin: r.n_pairs
        for r in queries()["embedding_adjacent_cosine_profile"](
            spark, str(tmp_path)
        ).collect()
    }
    # pair (1,2): cos 1.0 -> bin 10 (the closed upper edge); (2,3): cos 0 -> bin 0
    assert got == {10: 1, 0: 1}
