"""Cavnar–Trenkle language ID: classification power on a corpus whose
languages actually differ (the sf testdata reuses one shared word pool
across its lang labels, which caps self-accuracy and makes the oracle
an arithmetic check only — these tests plant separable languages)."""

from pyspark.sql import functions as F

from orca_spark.operators.langid import langid_trigram_df


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


# three "languages" with disjoint character inventories — trivially
# separable, so a correct rank-profile classifier must hit 100%
_LANG_WORDS = {
    "aa": "alpha arbor azalea aroma area ara aba",
    "bb": "bubble bobbin burb blubber bulb bib bob",
    "cc": "cocci cecum circ cicc occi coco cyc",
}


def test_separable_languages_classify_perfectly(spark):
    rows = []
    for lang, words in _LANG_WORDS.items():
        for k in range(4):
            # rotate word order so docs within a lang are not identical
            ws = words.split()
            rows.append((" ".join(ws[k:] + ws[:k]), lang))
    out = langid_trigram_df(_docs(spark, rows)).collect()
    assert len(out) == len(rows)
    assert all(r.correct for r in out), [
        (r.lang, r.predicted_lang) for r in out if not r.correct
    ]


def test_short_and_null_docs_excluded(spark):
    rows = [("ab", "aa"), (None, "aa"), ("alpha arbor azalea", "aa")]
    df = _docs(spark, rows)
    out = langid_trigram_df(df)
    assert [r.doc_id for r in out.collect()] == [2]


def test_distance_is_integer_and_tie_deterministic(spark):
    # two identical one-doc languages -> identical profiles, tied
    # distances; the lang-asc tiebreak must pick 'aa' for both docs
    rows = [("same same same", "aa"), ("same same same", "bb")]
    out = (
        langid_trigram_df(_docs(spark, rows))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.predicted_lang for r in out] == ["aa", "aa"]
    assert all(isinstance(r.oop_distance, int) for r in out)


def test_accuracy_summary_on_testdata(spark):
    """On the shared-vocab sf corpus the labels are only weakly
    separable (length/word-mix quirks), so assert the floor that a
    broken classifier would breach: above-chance accuracy (>1/5 on 5
    labels; sf0.001's majority class is en = 193/500) and that more
    than one language is ever predicted (a constant predictor fails
    this even when the majority class keeps it above chance)."""
    from orca_spark.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    out = langid_trigram_df(docs)
    stats = out.agg(
        F.avg(F.col("correct").cast("double")).alias("acc"),
        F.countDistinct("predicted_lang").alias("n_pred"),
    ).collect()[0]
    assert stats.acc >= 0.25, stats.acc  # > 1/5 chance on 5 labels
    assert stats.n_pred > 1


def test_trigram_fanout_runs_wide_not_at_scan_width(spark):
    """The explode+substring fan-out is the dense per-row compute; at
    test scale the documents parquet arrives as ONE split, so without
    an explicit widen the whole per-doc count aggregation ran in a
    single task (measured 2.05 s of a 3.7 s query at sf0.1). The
    round-robin exchange widen() inserts must sit below the trigram
    Generate. Asserted on the pre-checkpoint subplan: the registered
    query checkpoints the per-doc counts, which hides the fan-out
    lineage behind a Scan ExistingRDD in the top-level plan."""
    import contextlib
    import io

    from orca_spark.operators.langid import _trigrams
    from orca_spark.tables import load
    from tests.conftest import SF_DIR

    import pytest

    docs = load(spark, SF_DIR, "documents")
    # widen() is a deliberate no-op when the scan already has >= core
    # splits (1-core runners, multi-file test parquets) — assert the
    # POLICY only where it applies, not the environment (ADVICE r12)
    if len(docs.inputFiles()) >= spark.sparkContext.defaultParallelism:
        pytest.skip("scan already at executor width: widen is a no-op here")
    df = _trigrams(docs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "roundrobinpartitioning" in plan.lower(), plan[:2000]
