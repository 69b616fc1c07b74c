"""Value-level oracle agreement at sf0.1 — bench scale — for the
heaviest oracled queries (VERDICT r05 #3).

The routine gates run at sf0.001 (local suite) and sf0.01 (driver);
bench times sf0.1 but never value-checks it. That leaves a class of
bug tiny data cannot catch: partition-count-dependent nondeterminism
(summation order across 32 real partitions, AQE coalescing changing
tie-survivors, window-frame evaluation across partition boundaries).
This module runs the expensive paths value-exact against DuckDB at
sf0.1 — the cheapest insurance before any 100x scale claim.

Opt-in (minutes, not CI material): ``ORCA_SF01=1 python -m pytest
tests/test_sf01_oracle.py``. The committed evidence of the last run
lives in SF01_ORACLE.log at the repo root.
"""

import os

import pytest

from orca_spark.queries import oracle_sql, queries
from tests.conftest import compare_query

pytestmark = pytest.mark.skipif(
    os.environ.get("ORCA_SF01") != "1",
    reason="sf0.1 oracle pass is opt-in: ORCA_SF01=1 (minutes of runtime)",
)

SF01_DIR = "/root/testdata/sf0.1"

# The heaviest oracled queries by bench median, plus the composed
# pipeline and the freshly-oracled iterative loops. Deliberately
# excluded: graph_label_propagation / graph_neardup_degree — their
# DuckDB oracle's word-keyed token self-join is quadratic inside the
# sf0.1 corpus's dup families (~965k exact-Jaccard edges / 5000 docs;
# the ORACLE, not the engine, is the bottleneck — the engine runs the
# banded form at this scale, see bench's graph_label_propagation_simhash).
HEAVY = [
    "dedup_edit_distance",
    "text_langid_trigram",
    "text_bigram_logprob",
    "text_pmi_pairs",
    "dedup_containment_pairs",
    "dedup_line_level",
    "dedup_bloom_decontaminate",
    "text_bpe_train_merges",
    "similarity_tfidf_cosine_pairs",
    "events_resample_ffill",
    "pipeline_pretrain_corpus",
    "orders_temporal_state_join",
    "ivm_incremental_agg",
    "text_vocab_oov",
    # r07 additions. graph_triangle_census is deliberately excluded for
    # the same reason as graph_label_propagation: its DuckDB oracle
    # re-enumerates the raw clique-dense edge set (the quadratic form
    # the Spark side contracts away), so the ORACLE is the bottleneck
    # at sf0.1, not the engine.
    "corpus_sequence_pack",
    "corpus_chunk_windows",
    "source_unigram_kl",
    "events_burst_hours",
    "dedup_survivors_weighted",
    "text_zipf_exponent",
    "events_funnel_conversion",
    "privacy_l_diversity_audit",
    "embedding_dim_truncation_fidelity",
    "source_ngram_novelty",
    "multimodal_ppm_resize",
    "langid_confusion_matrix",
    "orders_exact_median_by_rank",
    "events_active_day_islands",
    "text_feature_hashing",
    # r07 batch-9 additions. The graph3 trio (clustering coefficient,
    # k-core, link prediction) is deliberately excluded like the other
    # graph surfaces: their doc-level DuckDB oracles re-run the
    # word-keyed token self-join that is quadratic inside sf0.1's dup
    # families — the ORACLE is the bottleneck, not the engine.
    "events_acf_hourly",
    "events_seasonality_index",
    "events_user_lifecycle",
    "text_hapax_ttr_by_lang",
    "source_unigram_jsd",
    "corpus_dedup_rate_by_source",
    "text_sentence_stats",
    "embedding_adjacent_cosine_profile",
    # r07 batches 10-15 (all verified <1 s DuckDB-side at sf0.1,
    # including the LATERAL — DuckDB plans it as a hash join)
    "orders_yoy_growth",
    "orders_shipping_sla_breach",
    "corpus_budget_pack",
    "json_pysource_write_roundtrip",
    "privacy_t_closeness_audit",
    "text_ngram_entropy_rate",
    "text_prefix_boilerplate",
    "orders_duplicate_payment_flags",
    "events_bot_score_heuristics",
    "events_multitouch_attribution",
    "text_readability_proxy",
    "events_props_variant_extract",
    "orders_lateral_topk_lines",
    "sql_cte_window_subquery",
    "orders_seasonal_decomposition",
    "events_type_correlation_hourly",
    "multimodal_arrow_digest",
    "streaming_pysource_jsonl_ingest",
    "events_session_window_batch",
    "join_hinted_shuffle_hash",
    "scalar_try_arithmetic",
    # pipeline_dedup_funnel is excluded like the graph3 trio: its
    # oracle embeds the O(n²) all-pairs Jaccard join (the obviously-
    # correct form the engine's contracted generator avoids), which
    # does not finish at sf0.1 — the ORACLE is the bottleneck.
    "brand_supplier_hhi",
    "events_ab_welch_t",
    "dedup_cross_lingual_exact",
    "text_code_score",
    "events_daily_new_vs_returning",
    "events_hourly_gap_interpolation",
    "text_boilerplate_strip_accounting",
    "lineitem_return_rates",
    "events_slo_burn_rate",
    "orders_priority_mix_drift",
    "customer_order_gap_median",
    # r08 additions: the composed RAG build, the TWS state family
    # (ValueState/ListState/MapState run the real protobuf transport at
    # sf0.1), and the new exact-arithmetic analytics/engine surfaces
    "pipeline_rag_corpus",
    "streaming_tws_user_running_max",
    "streaming_tws_last_k_events",
    "streaming_tws_type_counts",
    "events_cusum_changepoint",
    "text_gopher_quality_rules",
    "embedding_dimension_profile",
    "corpus_sqrt_mix_weights",
    "orders_interval_overlap_pairs",
    "orders_running_distinct_customers",
    "sql_recursive_type_paths",
    "join_null_safe_eq",
    "sql_parameterized_query",
    "orders_benford_deviation",
    "events_session_window_dynamic_gap",
    "streaming_tws_timer_flush",
    # r08 batch-8 curation trio
    "corpus_dsir_importance",
    "corpus_ccnet_perplexity_buckets",
    "retrieval_inverted_index",
    # r08 batch 9: TPC-H q2 + robust stats + C4 rules
    "q2_min_cost_supplier",
    "events_theilsen_trend",
    "orders_survival_km",
    "text_c4_filter_rules",
    # r08 batch 10 (oracled members)
    "customer_segment_nation_chi2",
    "dedup_prefix_suffix_overlap",
    # r08 review: oracle rewritten day-diff//7 (DuckDB week-boundary
    # off-by-one at ISO year-end spans)
    "events_cohort_retention",
    # r09: the composed end-to-end curation pipeline, the CCNet mix
    # schedule, and the Hamilton apportionment (the latter two carry
    # global/per-lang windows — the partition-order-sensitive class
    # this lane exists for)
    "pipeline_full_curation",
    "corpus_ccnet_mix_schedule",
    "corpus_token_budget_allocation",
    # r10: the incremental curation manifest (frozen-model delta
    # scoring + manifest merge — both partition-order-sensitive) and
    # the streaming ingest gate+dedup TWS job at the real transport
    "pipeline_curation_incremental",
    "streaming_ingest_gate_dedup",
    # r10 batch 2: the oracled real-container roundtrips at bench scale
    # (bigger Arrow batches through the real wave/Y4M parses)
    "multimodal_wav_roundtrip_features",
    "multimodal_y4m_roundtrip_cuts",
    # r10 batch 3: all 64 bits of the production DCT phash per document,
    # re-derived independently by the oracle — the class of query the
    # 2^-10 quantization exists for (summation-order ulp ties at the
    # median, observed on real corpus data at sf0.001)
    "multimodal_phash_dct_roundtrip",
    # r10 batch 4: the span-scrub ACTION (gram-keyed shuffles, covered-
    # index distinct, order-pinned kept-text reconstruction — three
    # partition-order-sensitive stages in one plan)
    "dedup_span_scrub",
    # r11: the image modality end-to-end — 500k md5-derived PPM bytes
    # per 10k docs through the real decode/gray/resample/DCT chain with
    # every hash bit oracle-re-derived, and the persisted-band-index
    # probe whose recall the oracle replicates exactly
    "multimodal_phash_ppm_roundtrip",
    "dedup_phash_incremental",
    # r11: the 8-byte-shuffle-key form of span scrubbing at bench scale
    "dedup_span_scrub_hashed",
    # r11 batch 2: the streaming curation twin at bench scale — the
    # persisted-artifact + foreachBatch path against the batch oracle
    "streaming_curation_manifest",
    # r11 batch 3: the banded phash pair search, oracled for the first
    # time (rows-only r08-r10) — at sf0.1 the oracle cross-joins 5000
    # re-derived hashes while Spark stays banded
    "multimodal_phash_neardup",
    # r11 batch 4: the paper-exact ExactSubstr form — same three
    # partition-order-sensitive stages as dedup_span_scrub plus the
    # min(pk) canonical-copy partial that must agree across combiners
    "dedup_span_exactsubstr",
    # r11 batch 4: int8 scalar-quantized top-k — integer dots are
    # summation-order exact by construction; this lane proves the claim
    # at 32 real partitions instead of trusting the arithmetic argument
    "similarity_sq8_topk",
    # r11 batch 5: the two policy/QA compositions — each re-runs its
    # component pipelines at bench scale and hashes the comparison
    "similarity_sq8_recall_audit",
    "corpus_selfrepeat_profile",
    # r12: the newly-oracled xxhash64-in-SQL family at 32 real
    # partitions — dedup_minhash covers the shingle-chain + banding +
    # Jaccard-verify CTE stack (~1 min DuckDB-side at sf0.1: 260k
    # 3-stage chained hashes), dedup_simhash_pairs covers the vote
    # signature + chunk-bucket + hamming stack (~1 min). Their siblings
    # (dedup_simhash, dedup_minhash_incremental) share the identical
    # CTE stacks verbatim and stay at the sf0.01 driver gate.
    "dedup_minhash",
    "dedup_simhash_pairs",
    # r12: the SQ8+SRP persisted-index probe (integer-exact end to end),
    # the hashed ExactSubstr twin, and the two policy compositions —
    # the multimodal build re-derives every phash bit at 10k-doc scale
    # and cross-joins ~4k survivor hashes in the oracle while Spark
    # stays banded
    "similarity_sq8_incremental",
    "dedup_span_exactsubstr_hashed",
    "pipeline_multimodal_curation",
    "pipeline_decontaminate_scrub",
    # r12: sign-LSH ANN, oracled for the first time (rows-only r04-r11)
    # — at sf0.1 the bucket signs of 2000 vectors × 8 plane chains must
    # replay bit-identically in DuckDB for the candidate sets to agree
    "similarity_lsh_topk",
    # r12: the audio/video feature kernels, oracled for the first time
    # (rows-only r08-r11) — at sf0.1 the hex-nibble twin re-derives
    # every byte of 5000 UTF-8 payloads (~3.5 s DuckDB-side each)
    "multimodal_audio_features",
    "multimodal_video_scene_cuts",
    # r12: count-min heavy hitters, oracled for the first time
    # (rows-only r05-r11) — at sf0.1 the first-principles sketch
    # re-derivation must agree with the real JVM CMS across the full
    # user_id key population
    "events_heavy_hitters_cms",
]

_Q = queries()
_O = oracle_sql()


def test_heavy_list_is_oracled():
    missing = [n for n in HEAVY if n not in _O]
    assert not missing, missing


@pytest.mark.parametrize("name", HEAVY)
def test_heavy_query_value_exact_at_sf01(spark, duck, name):
    compare_query(spark, duck, _Q[name], _O[name], SF01_DIR)


# --------------------------------------------------------------------------
# VERDICT r06 #5: the approximate family's AGREEMENT checks at sf0.1.
# The gram/IVF/k-means paths are rows-only at the driver (no SQL twin),
# and their exact-agreement gates ran only at toy scale — where
# partition-count effects (32 real partitions, AQE coalescing, numpy
# blocked summation across bigger Arrow batches) cannot surface.
# --------------------------------------------------------------------------


def test_gram_agrees_with_exact_at_sf01(spark):
    """The Arrow gram-matrix scorer must reproduce the exact all-pairs
    operator at bench scale: every shared pair's cosine within one
    final-rounding step, extras only at the 0.4 threshold, and recall
    over the exact set at the IVF floor."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in _Q["embedding_near_dup_pairs"](spark, SF01_DIR).collect()
    }
    gram = {
        (r.vec_a, r.vec_b): r.cosine
        for r in _Q["embedding_near_dup_pairs_gram"](spark, SF01_DIR).collect()
    }
    assert exact, "exact pair set empty at sf0.1 — corpus changed?"
    shared = set(gram) & set(exact)
    assert len(shared) / len(exact) >= 0.9
    for pair in shared:
        assert abs(gram[pair] - exact[pair]) <= 1.01e-4, pair
    for pair in set(gram) - set(exact):
        assert abs(gram[pair] - 0.4) <= 1.01e-4, pair


def test_kmeans_trainers_agree_at_sf01(spark):
    """Distributed vs driver-side-sampled k-means trained on the sf0.1
    corpus: per-cluster centroid cosine >= 0.95 (shared seeding and
    update rule; summation order and iteration counts differ)."""
    rows = _Q["embeddings_kmeans_vs_sampled"](spark, SF01_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.trainer_cosine >= 0.95, (
            f"cluster {r.cluster_id}: trainer cosine {r.trainer_cosine}"
        )
