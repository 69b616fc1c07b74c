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


def _write_lineitem(d, rows):
    """rows: (l_orderkey, l_extendedprice, l_discount, l_shipdate_us)"""
    n = len(rows)
    table = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            "l_discount": pa.array([r[2] for r in rows], pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(table, os.path.join(str(d), "lineitem.parquet"))
    return str(d)


def _write_orders(d, rows):
    """rows: (o_orderkey, o_orderdate_us, o_orderpriority)"""
    n = len(rows)
    table = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([1] * n, pa.int64()),
            "o_orderstatus": pa.array(["O"] * n, pa.string()),
            "o_totalprice": pa.array([1.0] * n, pa.float64()),
            "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "orders.parquet"))
    return str(d)


_Y2020 = 1_577_836_800_000_000  # 2020-01-01
_Y2021 = 1_609_459_200_000_000  # 2021-01-01


def test_yoy_growth_simple_sequence(spark, tmp_path):
    # 2020 revenue 100, 2021 revenue 150 -> +50%; first year NULL growth
    d = _write_lineitem(
        tmp_path,
        [(1, 100.0, 0.0, _Y2020), (2, 300.0, 0.5, _Y2021)],
    )
    got = {r.yr: (r.revenue, r.yoy_growth_pct) for r in queries()["orders_yoy_growth"](spark, d).collect()}
    assert got[2020] == (100.0, None)
    assert got[2021] == (150.0, 50.0)


def test_sla_breach_counts_late_lines(spark, tmp_path):
    # order placed 2020-01-01; line 1 ships +10d, line 2 ships +100d
    d = _write_orders(tmp_path, [(1, _Y2020, "1-URGENT")])
    _write_lineitem(
        tmp_path,
        [
            (1, 10.0, 0.0, _Y2020 + 10 * _D),
            (1, 10.0, 0.0, _Y2020 + 100 * _D),
        ],
    )
    r = queries()["orders_shipping_sla_breach"](spark, d).collect()[0]
    assert (r.o_orderpriority, r.n_lines, r.n_breaches) == ("1-URGENT", 2, 1)
    assert r.avg_days_to_ship == 55.0 and r.breach_pct == 50.0


def test_budget_pack_prefix_rule(spark, tmp_path):
    # densities: doc1 = 1.0 (10 toks), doc3 = 1.0 (4990 toks),
    # doc2 = 0.5 (10 toks). Rank order (density desc, id): 1, 3, 2.
    # cum: 10, 5000, 5010 -> docs 1 and 3 admitted, doc 2 over budget.
    uniq10 = " ".join(f"u{i}" for i in range(10))
    uniq4990 = " ".join(f"v{i}" for i in range(4990))
    half = " ".join(f"w{i % 5}" for i in range(10))
    d = _write_docs(
        tmp_path, [(1, uniq10, "en", "s0"), (2, half, "en", "s0"), (3, uniq4990, "en", "s0")]
    )
    got = {
        r.doc_id: (r.rnk, r.cum_tokens)
        for r in queries()["corpus_budget_pack"](spark, d).collect()
    }
    assert got == {1: (1, 10), 3: (2, 5000)}


def test_jsonl_writer_is_idempotent_under_overwrite(spark, tmp_path):
    import glob
    import os as _os
    import tempfile

    d = _write_docs(tmp_path, [(1, "a", "en", "s0"), (2, "b", "de", "s1")])
    q = queries()["json_pysource_write_roundtrip"]
    first = sorted((r.lang, r.n_docs, r.id_sum) for r in q(spark, d).collect())
    second = sorted((r.lang, r.n_docs, r.id_sum) for r in q(spark, d).collect())
    assert first == second == [("de", 1, 2), ("en", 1, 1)]
    sink = _os.path.join(tempfile.gettempdir(), "orca_jsonl_sink", _os.path.basename(str(tmp_path)))
    assert not glob.glob(_os.path.join(sink, "*.tmp"))  # commit swept temps


def test_t_closeness_flags_skewed_group(spark, tmp_path):
    # global sensitive dist: a:3, b:1. Group s0 = {a,a,a}: TV = 0.25
    # (close); group s1 = {b}: TV = 0.75 (flagged).
    d = _write_docs(
        tmp_path,
        [
            (1, "a x", "en", "s0"),
            (2, "a y", "en", "s0"),
            (3, "a z", "en", "s0"),
            (4, "b q", "en", "s1"),
        ],
    )
    got = {
        r.source: (r.group_n, r.tv_distance, r.t_close)
        for r in queries()["privacy_t_closeness_audit"](spark, d).collect()
    }
    assert got == {"s0": (3, 0.25, True), "s1": (1, 0.75, False)}


def test_entropy_rate_small_alternation(spark, tmp_path):
    # "a b a b a": H1 = -(0.6 ln 0.6 + 0.4 ln 0.4) = 0.6730,
    # H2 = ln 2 = 0.6931, conditional rate = 0.0201
    d = _write_docs(tmp_path, [(1, "a b a b a", "en", "s0")])
    r = queries()["text_ngram_entropy_rate"](spark, d).collect()[0]
    assert (r.h1_nats, r.h2_nats, r.cond_entropy_nats) == (0.673, 0.6931, 0.0201)


def test_prefix_boilerplate_finds_shared_header(spark, tmp_path):
    head = "terms of service apply here"
    d = _write_docs(
        tmp_path,
        [
            (1, head + " body one", "en", "s0"),
            (2, head + " body two", "en", "s0"),
            (3, head + " other text", "en", "s1"),
            (4, "completely different document text here", "en", "s0"),
        ],
    )
    got = [
        (r.prefix, r.n_docs, r.n_sources)
        for r in queries()["text_prefix_boilerplate"](spark, d).collect()
    ]
    assert got == [(head, 3, 2)]


def test_duplicate_payment_pairs_within_window(spark, tmp_path):
    # cust 1: two 100.0 orders 3 days apart (pair), a third 100.0 order
    # 30 days later (no pair with either), and a 200.0 order same day
    # (different amount, no pair); cust 2: one order (no pair)
    d = _write_orders(
        tmp_path,
        [
            (1, _Y2020, "1-URGENT"),
            (2, _Y2020 + 3 * _D, "1-URGENT"),
            (3, _Y2020 + 33 * _D, "1-URGENT"),
            (4, _Y2020, "1-URGENT"),
            (5, _Y2020, "1-URGENT"),
        ],
    )
    import pyarrow.parquet as _pq
    import pyarrow as _pa

    # rewrite with controlled custkey/amount
    table = _pa.table(
        {
            "o_orderkey": _pa.array([1, 2, 3, 4, 5], _pa.int64()),
            "o_custkey": _pa.array([1, 1, 1, 1, 2], _pa.int64()),
            "o_orderstatus": _pa.array(["O"] * 5, _pa.string()),
            "o_totalprice": _pa.array([100.0, 100.0, 100.0, 200.0, 100.0], _pa.float64()),
            "o_orderdate": _pa.array(
                [_Y2020, _Y2020 + 3 * _D, _Y2020 + 33 * _D, _Y2020, _Y2020],
                _pa.timestamp("us"),
            ),
            "o_orderpriority": _pa.array(["1-URGENT"] * 5, _pa.string()),
        }
    )
    _pq.write_table(table, os.path.join(str(tmp_path), "orders.parquet"))
    got = [
        (r.o_custkey, r.order_a, r.order_b, r.amount, r.days_apart)
        for r in queries()["orders_duplicate_payment_flags"](spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 1, 2, 100.0, 3)]


def test_bot_heuristics_flags_burst_and_monotony(spark, tmp_path):
    # user 1: 60 'click' events in one hour -> burst + monotony flag;
    # user 2: 3 distinct types across 3 hours -> clean
    rows = [(i, _BASE + i * 1_000_000, 1, "click", 1.0) for i in range(60)]
    rows += [
        (100, _BASE, 2, "a", 1.0),
        (101, _BASE + _H, 2, "b", 1.0),
        (102, _BASE + 2 * _H, 2, "c", 1.0),
    ]
    d = _write_events(tmp_path, rows)
    got = {r.user_id: r for r in queries()["events_bot_score_heuristics"](spark, d).collect()}
    assert got[1].is_bot and got[1].max_hourly == 60 and got[1].n_types == 1
    assert not got[2].is_bot and got[2].active_hours == 3
    assert got[2].monotony_pct == 0.0


def test_multitouch_splits_purchase_value_equally(spark, tmp_path):
    # user 1: 2 views then a 90.0 purchase inside 24h -> each touch
    # gets 45; a click 25h before is outside the window; user 2's
    # purchase has no touches -> contributes nothing
    rows = [
        (1, _BASE - 25 * _H, 1, "click", 1.0),   # outside window
        (2, _BASE - 2 * _H, 1, "view", 1.0),
        (3, _BASE - 1 * _H, 1, "view", 1.0),
        (4, _BASE, 1, "purchase", 90.0),
        (5, _BASE, 2, "purchase", 50.0),          # touchless
    ]
    d = _write_events(tmp_path, rows)
    got = {
        r.event_type: (r.n_touches, r.attributed_value)
        for r in queries()["events_multitouch_attribution"](spark, d).collect()
    }
    assert got == {"view": (2, 90.0)}


def test_readability_formula_on_known_counts(spark, tmp_path):
    # "go on. be it!" -> 4 words, 2 sentences, 4 vowel groups (o, o-in-on,
    # e, i): w/s = 2, vg/w = 1 -> 206.835 - 2.03 - 84.6 = 120.205
    d = _write_docs(tmp_path, [(1, "go on. be it!", "en", "s0")])
    r = queries()["text_readability_proxy"](spark, d).collect()[0]
    assert (r.words, r.sentences, r.vowel_groups) == (4, 2, 4)
    assert r.flesch_proxy == 120.205


def test_variant_extract_tolerates_malformed_json(spark, tmp_path):
    rows = [
        (1, _BASE, 1, "click", 1.0),
        (2, _BASE, 1, "click", 1.0),
        (3, _BASE, 1, "view", 1.0),
        (4, _BASE, 1, "view", 1.0),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 7}', "{bad", '{"k": 5}', "{}"], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "events.parquet"))
    got = {
        r.event_type: (r.n_with_k, r.k_sum, r.k_max)
        for r in queries()["events_props_variant_extract"](spark, str(tmp_path)).collect()
    }
    # malformed and key-less rows drop silently; nothing aborts
    assert got == {"click": (1, 7, 7), "view": (1, 5, 5)}


def test_lateral_topk_keeps_two_best_lines_per_order(spark, tmp_path):
    _write_orders(tmp_path, [(1, _Y2020, "1-URGENT")])
    _write_lineitem(
        tmp_path,
        [(1, 10.0, 0.0, _Y2020), (1, 30.0, 0.0, _Y2020), (1, 20.0, 0.0, _Y2020)],
    )
    got = sorted(
        (r.o_orderkey, r.l_linenumber, r.l_extendedprice)
        for r in queries()["orders_lateral_topk_lines"](spark, str(tmp_path)).collect()
    )
    assert got == [(1, 2, 30.0), (1, 3, 20.0)]


def test_seasonal_decomposition_window_completeness(spark, tmp_path):
    # 14 consecutive months of 100.00 revenue: only months with a full
    # centered 12-window get a trend (rows 6..8 of 1..14 -> ym index
    # 6,7,8), and a flat series decomposes to trend=100, ratio=1
    rows = []
    oid = 0
    for m in range(14):
        y, mo = 2020 + m // 12, m % 12 + 1
        ts = int(__import__("datetime").datetime(y, mo, 15).timestamp() * 1_000_000)
        oid += 1
        rows.append((oid, ts, "1-URGENT"))
    _write_orders(tmp_path, rows)
    # overwrite totalprice to a constant 100.0
    import pyarrow as _pa, pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(str(tmp_path), "orders.parquet"))
    t = t.set_column(
        t.schema.get_field_index("o_totalprice"),
        "o_totalprice",
        _pa.array([100.0] * 14, _pa.float64()),
    )
    _pq.write_table(t, os.path.join(str(tmp_path), "orders.parquet"))
    out = {r.ym: r for r in queries()["orders_seasonal_decomposition"](spark, str(tmp_path)).collect()}
    assert len(out) == 14
    with_trend = sorted(ym for ym, r in out.items() if r.trend is not None)
    assert with_trend == [202006, 202007, 202008]
    for ym in with_trend:
        assert out[ym].trend == 100.0 and out[ym].seasonal_ratio == 1.0
    assert out[202001].revenue == 100.0 and out[202001].trend is None


def test_type_correlation_perfect_and_anti(spark, tmp_path):
    # 'a' fires on even hours, 'b' fires with it (corr 1), 'c' on odd
    # hours (anti-correlated with both)
    rows = []
    eid = 0
    for i in range(6):
        ts = _BASE + i * _H
        if i % 2 == 0:
            for t in ("a", "b"):
                eid += 1
                rows.append((eid, ts, 1, t, 1.0))
        else:
            eid += 1
            rows.append((eid, ts, 1, "c", 1.0))
    d = _write_events(tmp_path, rows)
    got = {
        (r.type_a, r.type_b): r.corr
        for r in queries()["events_type_correlation_hourly"](spark, d).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0 and got[("b", "c")] == -1.0


def test_arrow_digest_matches_hashlib(spark, tmp_path):
    import hashlib

    d = _write_docs(tmp_path, [(1, "hello world", "en", "s0"), (2, "héllo", "de", "s1")])
    got = {r.doc_id: (r.n_bytes, r.digest) for r in queries()["multimodal_arrow_digest"](spark, d).collect()}
    assert got[1] == (11, hashlib.md5(b"hello world").hexdigest())
    # multi-byte UTF-8: length counts BYTES, digest hashes the bytes
    assert got[2] == (6, hashlib.md5("héllo".encode()).hexdigest())


def test_streaming_pysource_replays_all_shards(spark, tmp_path):
    d = _write_docs(
        tmp_path,
        [(1, "a", "en", "s0"), (2, "b", "en", "s0"), (3, "c", "de", "s1")],
    )
    got = {
        r.lang: (r.n_docs, r.id_sum)
        for r in queries()["streaming_pysource_jsonl_ingest"](spark, d).collect()
    }
    assert got == {"en": (2, 3), "de": (1, 3)}


def test_session_window_batch_merges_at_exact_gap_boundary(spark, tmp_path):
    # events at t, t+30min (exactly the gap), t+61min: the first two
    # MERGE (closed boundary), the third starts a new session
    rows = [
        (1, _BASE, 1, "click", 1.0),
        (2, _BASE + 30 * 60 * 1_000_000, 1, "click", 1.0),
        (3, _BASE + 61 * 60 * 1_000_000, 1, "click", 1.0),
    ]
    d = _write_events(tmp_path, rows)
    got = sorted(
        (r.n_events,)
        for r in queries()["events_session_window_batch"](spark, d).collect()
    )
    assert got == [(1,), (2,)]


def test_hhi_extremes(spark, tmp_path):
    # brand A: one supplier -> HHI 10000; brand B: two equal suppliers
    # -> HHI 5000
    import pyarrow as _pa, pyarrow.parquet as _pq

    part = _pa.table(
        {
            "p_partkey": _pa.array([1, 2], _pa.int64()),
            "p_name": _pa.array(["pa", "pb"], _pa.string()),
            "p_brand": _pa.array(["A", "B"], _pa.string()),
            "p_type": _pa.array(["t", "t"], _pa.string()),
            "p_size": _pa.array([1, 1], _pa.int32()),
            "p_retailprice": _pa.array([1.0, 1.0], _pa.float64()),
        }
    )
    _pq.write_table(part, os.path.join(str(tmp_path), "part.parquet"))
    li = _pa.table(
        {
            "l_orderkey": _pa.array([1, 2, 3], _pa.int64()),
            "l_partkey": _pa.array([1, 2, 2], _pa.int64()),
            "l_suppkey": _pa.array([10, 20, 21], _pa.int64()),
            "l_linenumber": _pa.array([1, 1, 1], _pa.int32()),
            "l_quantity": _pa.array([1.0] * 3, _pa.float64()),
            "l_extendedprice": _pa.array([100.0, 50.0, 50.0], _pa.float64()),
            "l_discount": _pa.array([0.0] * 3, _pa.float64()),
            "l_tax": _pa.array([0.0] * 3, _pa.float64()),
            "l_returnflag": _pa.array(["N"] * 3, _pa.string()),
            "l_linestatus": _pa.array(["O"] * 3, _pa.string()),
            "l_shipdate": _pa.array([_Y2020] * 3, _pa.timestamp("us")),
        }
    )
    _pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    got = {r.p_brand: (r.n_suppliers, r.hhi) for r in queries()["brand_supplier_hhi"](spark, str(tmp_path)).collect()}
    assert got == {"A": (1, 10000.0), "B": (2, 5000.0)}


def test_dedup_funnel_counts_stages(spark, tmp_path):
    # source s0: docs 1,2 identical text (exact dup), doc 3 a 9/10
    # near-dup of them; source s1: doc 4 unrelated.
    # exact survivors: 1 (keeps min of {1,2}), 3, 4 -> s0:2, s1:1
    # near-dup survivors: cluster {1,2,3} keeps 1; 4 alone -> s0:1, s1:1
    ten = " ".join(f"t{i}" for i in range(1, 11))
    nine = " ".join(f"t{i}" for i in range(1, 10))
    d = _write_docs(
        tmp_path,
        [(1, ten, "en", "s0"), (2, ten, "en", "s0"), (3, nine, "en", "s0"),
         (4, "totally different words here", "en", "s1")],
    )
    got = {
        r.source: (r.n_docs, r.n_exact_survivors, r.n_neardup_survivors, r.pct_removed)
        for r in queries()["pipeline_dedup_funnel"](spark, d).collect()
    }
    assert got == {"s0": (3, 2, 1, 66.6667), "s1": (1, 1, 1, 0.0)}


def test_welch_t_zero_for_identical_and_signed_for_shifted(spark, tmp_path):
    # type a: values {1,2,3}; type b: identical {1,2,3} -> t = 0;
    # type c: {11,12,13} -> t(a,c) strongly negative, dof = 4 (equal n,
    # equal variance)
    rows = []
    eid = 0
    for t, base in (("a", 1.0), ("b", 1.0), ("c", 11.0)):
        for i in range(3):
            eid += 1
            rows.append((eid, _BASE + eid * 1_000_000, 1, t, base + i))
    d = _write_events(tmp_path, rows)
    got = {
        (r.type_a, r.type_b): (r.welch_t, r.dof)
        for r in queries()["events_ab_welch_t"](spark, d).collect()
    }
    assert got[("a", "b")][0] == 0.0
    assert got[("a", "c")][0] == -12.2474  # (1.5-11.5... wait) -10/sqrt(2/3)
    assert got[("a", "c")][1] == 4.0


def test_cross_lingual_manifest(spark, tmp_path):
    d = _write_docs(
        tmp_path,
        [(1, "same text", "en", "s0"), (2, "same text", "de", "s0"),
         (3, "same text", "en", "s1"), (4, "only once", "en", "s0")],
    )
    got = [
        (r.text, r.n_langs, r.langs, r.n_docs)
        for r in queries()["dedup_cross_lingual_exact"](spark, d).collect()
    ]
    assert got == [("same text", 2, "de,en", 3)]


def test_code_score_flags_symbol_heavy_text(spark, tmp_path):
    code = "int f(x){return x*2;}"  # 6 symbols ( ) { * ; } / 21 chars
    prose = "plain readable sentence here"
    d = _write_docs(tmp_path, [(1, code, "en", "s0"), (2, prose, "en", "s0")])
    got = {r.doc_id: (r.n_symbols, r.is_code_like) for r in queries()["text_code_score"](spark, d).collect()}
    assert got[1] == (6, True)
    assert got[2][0] == 0 and not got[2][1]


def test_new_vs_returning_split(spark, tmp_path):
    # day 1: users 1,2 (both new); day 2: user 1 (returning) + user 3 (new)
    rows = [
        (1, _BASE, 1, "click", 1.0),
        (2, _BASE, 2, "click", 1.0),
        (3, _BASE + _D, 1, "click", 1.0),
        (4, _BASE + _D, 3, "click", 1.0),
    ]
    d = _write_events(tmp_path, rows)
    got = {r.day: (r.n_active, r.n_new, r.n_returning) for r in queries()["events_daily_new_vs_returning"](spark, d).collect()}
    assert got == {"2023-11-14": (2, 2, 0), "2023-11-15": (2, 1, 1)}


def test_gap_interpolation_blends_interior_gap(spark, tmp_path):
    # observed hours 0 (n=2) and 3 (n=8); hours 1,2 missing -> 4.0, 6.0
    rows = [
        (1, _BASE, 1, "click", 1.0),
        (2, _BASE + 1, 1, "click", 1.0),
    ] + [(10 + i, _BASE + 3 * _H + i, 1, "click", 1.0) for i in range(8)]
    d = _write_events(tmp_path, rows)
    vals = sorted(
        (r.observed, r.n_filled)
        for r in queries()["events_hourly_gap_interpolation"](spark, d).collect()
    )
    assert vals == [(False, 4.0), (False, 6.0), (True, 2.0), (True, 8.0)]


def test_strip_accounting_matches_manifest(spark, tmp_path):
    head = "terms of service apply here"
    d = _write_docs(
        tmp_path,
        [
            (1, head + " body one", "en", "s0"),
            (2, head + " body two two", "en", "s0"),
            (3, head, "en", "s1"),
            (4, "unique document text entirely different", "en", "s0"),
        ],
    )
    got = {
        r.doc_id: (r.n_tokens_before, r.n_tokens_after)
        for r in queries()["text_boilerplate_strip_accounting"](spark, d).collect()
    }
    assert got == {1: (7, 2), 2: (8, 3), 3: (5, 0)}


def test_slo_burn_detects_error_spike(spark, tmp_path):
    # 5 quiet hours of 10 clicks + 1 error (10% baseline), then an hour
    # of 10 clicks + 10 errors (50%): burn for the spike hour is
    # 0.5 / ((5*1+10)/(5*11+20)) = 0.5/(15/75) = 2.5
    rows = []
    eid = 0
    for hr in range(5):
        for i in range(10):
            eid += 1
            rows.append((eid, _BASE + hr * _H + i, 1, "click", 1.0))
        eid += 1
        rows.append((eid, _BASE + hr * _H + 20, 1, "error", 1.0))
    for i in range(10):
        eid += 1
        rows.append((eid, _BASE + 5 * _H + i, 1, "click", 1.0))
    for i in range(10):
        eid += 1
        rows.append((eid, _BASE + 5 * _H + 20 + i, 1, "error", 1.0))
    d = _write_events(tmp_path, rows)
    got = {r.h: r for r in queries()["events_slo_burn_rate"](spark, d).collect()}
    spike = got[max(got)]
    assert spike.err_pct_1h == 50.0
    assert spike.burn == 2.5


def test_return_rates_by_month(spark, tmp_path):
    d = _write_lineitem(
        tmp_path,
        [(1, 10.0, 0.0, _Y2020), (2, 10.0, 0.0, _Y2020), (3, 10.0, 0.0, _Y2021)],
    )
    import pyarrow as _pa, pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(str(tmp_path), "lineitem.parquet"))
    t = t.set_column(
        t.schema.get_field_index("l_returnflag"),
        "l_returnflag",
        _pa.array(["R", "N", "N"], _pa.string()),
    )
    _pq.write_table(t, os.path.join(str(tmp_path), "lineitem.parquet"))
    got = {r.ym: (r.n_lines, r.n_returned, r.return_pct) for r in queries()["lineitem_return_rates"](spark, str(tmp_path)).collect()}
    assert got == {202001: (2, 1, 50.0), 202101: (1, 0, 0.0)}


def test_priority_mix_drift_flags_composition_change(spark, tmp_path):
    # Jan: 2xA 2xB; Feb: 2xA 2xB (drift 0); Mar: 4xA (drift 0.5)
    rows, oid = [], 0
    for m_us, mix in (
        (_Y2020, ["A", "A", "B", "B"]),
        (_Y2020 + 31 * _D, ["A", "A", "B", "B"]),
        (_Y2020 + 60 * _D, ["A", "A", "A", "A"]),
    ):
        for pr in mix:
            oid += 1
            rows.append((oid, m_us, pr))
    d = _write_orders(tmp_path, rows)
    got = {r.ym: r.tv_drift for r in queries()["orders_priority_mix_drift"](spark, d).collect()}
    assert got == {202002: 0.0, 202003: 0.5}


def test_order_gap_median_even_and_odd(spark, tmp_path):
    # one customer, orders at days 0, 10, 14, 44 -> gaps 10, 4, 30:
    # odd count, median 10
    import pyarrow as _pa, pyarrow.parquet as _pq

    d = _write_orders(
        tmp_path,
        [(1, _Y2020, "P"), (2, _Y2020 + 10 * _D, "P"),
         (3, _Y2020 + 14 * _D, "P"), (4, _Y2020 + 44 * _D, "P")],
    )
    cust = _pa.table(
        {
            "c_custkey": _pa.array([1], _pa.int64()),
            "c_nationkey": _pa.array([7], _pa.int64()),
        }
    )
    _pq.write_table(cust, os.path.join(str(tmp_path), "customer.parquet"))
    nat = _pa.table(
        {
            "n_nationkey": _pa.array([7], _pa.int64()),
            "n_name": _pa.array(["NATION_7"], _pa.string()),
            "n_regionkey": _pa.array([0], _pa.int64()),
        }
    )
    _pq.write_table(nat, os.path.join(str(tmp_path), "nation.parquet"))
    r = queries()["customer_order_gap_median"](spark, str(tmp_path)).collect()[0]
    assert (r.n_name, r.n_gaps, r.median_gap_days) == ("NATION_7", 3, 10.0)
