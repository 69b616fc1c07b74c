"""Adversarial-corpus smoke test: every documents-driven query must be
TOTAL over degenerate inputs — empty text, single tokens, NULL text,
whitespace runs, unicode, huge tokens. The single-token bigram crash
found in review is exactly this class; this harness pins the whole
class for every current and future documents query."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orca_spark.queries import oracle_sql, queries
from tests.conftest import compare_query

_NASTY_TEXTS = [
    "",                       # empty string -> [''] token
    "solo",                   # single token (no bigrams)
    " ",                      # whitespace only -> ['', '']
    "a  b",                   # double space -> empty middle token
    None,                     # NULL text
    "tok " * 5000,            # long repetitive doc (trailing space token)
    "héllo wörld 既存 データ",   # unicode
    "x" * 10000,              # one huge token
    "the quick brown fox jumps over the lazy dog " * 3,
    # INT32-overflow probes: >2147 qualifying lines / '#' chars make any
    # size()*1000000 ppm computed in INT arithmetic overflow under ANSI
    # (the text_gopher_quality_rules crash found in round-8 review)
    "- bullet line\n" * 3000,   # 3000 bullet-started lines
    "##...\n" * 3000,           # 3000 ellipsis-ended lines, 6000 '#'
]

# documents-only queries (their sf_dir needs just documents.parquet)
_DOC_QUERIES = [
    "dedup_exact",
    "dedup_exact_safe",
    "dedup_exact_survivors",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_jaccard_exact",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "dedup_cross_split_contamination",
    "text_token_counts",
    "text_quality_score",
    "text_fingerprint",
    "text_word_frequencies",
    "text_lang_stopword_ratio",
    "text_winnowing_fingerprints",
    "text_chunk_windows",
    "text_greedy_pack",
    "text_repetition_signals",
    "text_pii_scrub",
    "text_tokens_udtf",
    "text_tfidf_top_terms",
    "text_bm25_query_scores",
    "text_unigram_logprob",
    "documents_quality_filter",
    "documents_train_val_test",
    "multimodal_binary_stats",
    "multimodal_frame_sample",
    "multimodal_ppm_decode",
    "multimodal_decode_features",
    "multimodal_binaryfile_ingest",
    # round-5 documents-driven additions
    "dedup_line_level",
    "dedup_bloom_decontaminate",
    "dedup_near_cluster_survivors",
    "sample_weighted_per_lang",
    "curriculum_order",
    "text_vocab_oov",
    "source_length_psi",
    "source_token_cosine",
    "json_corrupt_quarantine",
    "dedup_jaccard_histogram",
    "dedup_source_overlap_matrix",
    "provenance_file_lineage",
    "text_canonicalize",
    "corpus_mix_resample",
    # round-5 batch-2 additions
    "dedup_edit_distance",
    "text_nucleus_vocab",
    "text_langid_trigram",
    # round-5 batch-3/4/6 documents-driven additions (the oracled ones
    # also run the value-level compare below)
    "text_bigram_logprob",
    "text_pmi_pairs",
    "text_phrase_topbigram_docs",
    "text_bpe_train_merges",
    "graph_neardup_degree",
    "graph_label_propagation",
    "graph_label_propagation_simhash",
    "similarity_tfidf_cosine_pairs",
    "pipeline_pretrain_corpus",
    "dedup_containment_pairs",
    # round-8 batch-8 curation trio (documents-driven, all oracled)
    "corpus_dsir_importance",
    "corpus_ccnet_perplexity_buckets",
    "retrieval_inverted_index",
    "text_c4_filter_rules",
    # r08 batch 10 (documents-driven)
    "multimodal_audio_features",
    "multimodal_video_scene_cuts",
    "dedup_prefix_suffix_overlap",
    # r08 review gap: documents-driven r08 ops that were missing here —
    # text_gopher_quality_rules crashed on >2147 bullet lines (INT32
    # ppm multiply) precisely because it wasn't on this list
    "text_gopher_quality_rules",
    "text_compression_ratio",
    "corpus_sqrt_mix_weights",
    "join_null_safe_eq",
    # r08: the 46 documents-only queries the derived completeness
    # contract (test_doc_queries_list_is_complete) found missing — the
    # list is no longer trusted by hand
    "corpus_budget_pack",
    "corpus_chunk_windows",
    "corpus_dedup_rate_by_source",
    "corpus_gini_concentration",
    "corpus_mixture_plan",
    "corpus_sequence_pack",
    "dedup_cross_lingual_exact",
    "dedup_minhash_incremental",
    "dedup_span_coverage",
    "dedup_survivors_weighted",
    "documents_stratified_sample",
    "graph_clustering_coefficient",
    "graph_kcore",
    "graph_link_prediction_jaccard",
    "graph_pagerank",
    "graph_triangle_census",
    "langid_confusion_matrix",
    "multimodal_arrow_digest",
    "multimodal_phash_neardup",
    "multimodal_ppm_resize",
    "pipeline_chunk_dedup_index",
    "pipeline_dedup_funnel",
    "privacy_k_anonymity_audit",
    "privacy_l_diversity_audit",
    "privacy_t_closeness_audit",
    "profile_sketch_persist_union",
    "quality_percentile_gate",
    "schema_drift_report",
    "source_ngram_novelty",
    "source_unigram_jsd",
    "source_unigram_kl",
    "text_boilerplate_strip_accounting",
    "text_bpe_apply_token_counts",
    "text_bpe_token_estimate",
    "text_code_score",
    "text_feature_hashing",
    "text_hapax_ttr_by_lang",
    "text_lang_stats",
    "text_ngram_entropy_rate",
    "text_prefix_boilerplate",
    "text_readability_proxy",
    "text_sentence_stats",
    "text_source_roundtrip",
    "text_top_terms_per_lang",
    "text_zipf_exponent",
    "xml_source_roundtrip",
    # r08 review: documents-driven streaming job (the recorder skips
    # streaming_, so the derived contract cannot see it; placed here by
    # test_adversarial_events.test_streaming_queries_are_placed)
    "streaming_pysource_jsonl_ingest",
    # r09 registrations (all documents-driven)
    "pipeline_full_curation",
    "corpus_ccnet_mix_schedule",
    "corpus_token_budget_allocation",
    # r10 registrations (all documents-driven; the streaming job is
    # placed here like streaming_pysource_jsonl_ingest — the recorder
    # skips streaming_, so the derived contract cannot see it)
    "pipeline_curation_incremental",
    "streaming_ingest_gate_dedup",
    "multimodal_wav_roundtrip_features",
    "multimodal_y4m_roundtrip_cuts",
    "multimodal_phash_dct_roundtrip",
    "dedup_span_scrub",
    # r11 registrations: the end-to-end real image path (PPM decode ->
    # gray -> resample -> phash) and its persisted-index probe
    "multimodal_phash_ppm_roundtrip",
    "dedup_phash_incremental",
    "dedup_span_scrub_hashed",
    "streaming_curation_manifest",
    # r11 batch 3: the paper-exact ExactSubstr form — the nasty corpus
    # is a real workout here ("tok "*2000 is one gram repeated 1993
    # times WITHIN a doc, exactly the self-repeat class this operator
    # exists to scrub)
    "dedup_span_exactsubstr",
    # r11 batch 4: the policy-comparison profile over both span-dedup
    # forms (the nasty within-doc repeat doc produces a large positive
    # keepone_delta here)
    "corpus_selfrepeat_profile",
    # r12 registrations: the hashed-key ExactSubstr twin (same nasty
    # within-doc repeat workout as its string-keyed sibling) and the
    # two policy compositions — the multimodal build runs the full
    # gate -> dedup -> phash -> manifest chain on the degenerate
    # corpus, the decontamination composition the bloom + span-scrub
    # chain
    "dedup_span_exactsubstr_hashed",
    "pipeline_multimodal_curation",
    "pipeline_decontaminate_scrub",
]


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_sf")
    # a ZERO-MASS language: every 'xx' doc tokenizes to zero tokens, so
    # any per-language normalization (sum of roots, token shares, ppm
    # divisions) sees a 0 denominator for 'xx' — the class behind the
    # corpus_sqrt_mix_weights ANSI divide-by-zero found in r08 review
    # (the en-only fixture could never produce it: en always has
    # token-bearing docs to carry the partition sum)
    zero_mass = ["", " ", "  "]
    texts = _NASTY_TEXTS + zero_mass
    langs = ["en"] * len(_NASTY_TEXTS) + ["xx"] * len(zero_mass)
    rows = {
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": langs,
        "source": ["src0"] * len(texts),
        "n_chars": [len(t) if t else 0 for t in texts],
    }
    table = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "source": pa.array(rows["source"], pa.string()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_query_total_over_degenerate_documents(spark, nasty_dir, name):
    df = queries()[name](spark, nasty_dir)
    assert df.count() >= 0  # must not raise, whatever it returns


from tests.conftest import ADVERSARIAL_ORACLE_SWEEP  # noqa: E402


@ADVERSARIAL_ORACLE_SWEEP
@pytest.mark.parametrize(
    "name", [n for n in _DOC_QUERIES if n in oracle_sql()]
)
def test_oracle_agreement_over_degenerate_documents(spark, duck, nasty_dir, name):
    """Totality is not enough: a query can survive degenerate input yet
    silently DIVERGE from its oracle there (count() prunes the very
    expressions that differ). Run the full value-level compare on the
    nasty corpus — this caught an ANSI divide-by-zero (quality score),
    a NULL-length segment count (line-level dedup), and byte- vs
    code-point levenshtein, all green on the sf corpora."""
    compare_query(spark, duck, queries()[name], oracle_sql()[name], nasty_dir)


def test_mixture_plan_absent_language_binds_at_zero(spark, nasty_dir):
    """A target language with zero corpus presence must BIND the
    water-filling plan at T*=0 (the mixture is unservable), not vanish
    from the plan — the inner-join failure mode reported over-optimistic
    budgets. nasty_dir is en-only, so de/es/fr/zh are all absent."""
    from orca_spark.queries import queries

    rows = {
        r.lang: r
        for r in queries()["corpus_mixture_plan"](spark, nasty_dir).collect()
    }
    assert set(rows) == {"en", "de", "es", "fr", "zh"}
    assert all(r.planned_tokens == 0 for r in rows.values())
    absent = rows["de"]
    assert absent.tokens == 0 and absent.binding and absent.rate is None
    assert not rows["en"].binding  # en has inventory, so its cap > 0


def test_quality_gate_keeps_best_doc_of_small_sources(spark, tmp_path):
    """percent_rank never reaches the cutoff inside a small source (a
    single-doc source scores 0), so the gate keeps each source's
    max-token document unconditionally — no source is silently wiped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["only doc here", "a b", "a b c d e f", "one two three"]
    table = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["solo", "trio", "trio", "trio"], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(tmp_path), "documents.parquet"))
    from orca_spark.queries import queries

    kept = queries()["quality_percentile_gate"](spark, str(tmp_path)).collect()
    by_source = {}
    for r in kept:
        by_source.setdefault(r.source, set()).add(r.doc_id)
    assert by_source["solo"] == {0}  # the single-doc source survives
    assert by_source["trio"] == {2}  # only its best (6 tokens)


def test_doc_queries_list_is_complete(table_usage):
    """_DOC_QUERIES is manually curated, and the r08 Gopher INT32
    overflow escaped to review precisely because a documents-only query
    was left off it. Derive the ground truth instead of trusting the
    list (conftest's table_usage records the tables each query loads at
    plan-construction time), and require every documents-only query to
    be on the list."""
    doc_only = {n for n, t in table_usage.items() if t == {"documents"}}
    missing = sorted(doc_only - set(_DOC_QUERIES))
    assert not missing, (
        f"documents-only queries absent from _DOC_QUERIES (add them so "
        f"the degenerate-corpus totality + oracle-agreement harness "
        f"covers them): {missing}"
    )
