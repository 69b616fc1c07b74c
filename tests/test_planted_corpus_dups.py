"""Auto-arming value assertions for the FIXTURES.md §4a plant request.

`multimodal_phash_neardup` and `dedup_cross_lingual_exact` return 0
rows on the current all-distinct synthetic corpus — correct, but the
driver row evidences nothing. FIXTURES.md §4a (filed r09, re-asserted
r10) asks the driver's generator to plant deterministic duplicate
pairs. These tests SKIP while the corpus is all-distinct and start
asserting exact planted values the day the generator serves the
request — no builder change needed then.

The planted-pair behavior on synthetic inputs is already pinned in
tests/test_r08_ops.py; this file is the bridge from those synthetic
proofs to real driver-table evidence.
"""

from __future__ import annotations

import duckdb
import pytest

import orca_spark.queries  # noqa: F401  (populates REGISTRY)
from orca_spark.registry import REGISTRY
from tests.conftest import SF_DIR

# r11: the generator SERVED the request at sf0.1 (8 duplicate pairs,
# same-lang and cross-lang — verified this round); sf0.001/sf0.01 are
# still all-distinct. Probe every sf dir so the assertions arm wherever
# plants exist and keep skipping where they don't.
_SF_DIRS = [SF_DIR, "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _dup_texts(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"""
        SELECT text, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
               list_sort(list(doc_id)) AS doc_ids
        FROM '{sf_dir}/documents.parquet'
        WHERE text IS NOT NULL
        GROUP BY text HAVING count(*) >= 2
        """
    ).fetchall()


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_phash_neardup_finds_planted_exact_pairs(spark, sf_dir):
    """Identical text => identical PPM payload => identical phash
    => a hamming-0 pair for every planted exact-duplicate text."""
    dups = _dup_texts(sf_dir)
    if not dups:
        pytest.skip(
            f"{sf_dir} is all-distinct: FIXTURES.md §4a plant request "
            "not served there by the driver generator"
        )
    rows = (
        REGISTRY["multimodal_phash_neardup"].fn(spark, sf_dir).collect()
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    for _text, _n, _nl, doc_ids in dups:
        ids = sorted(int(i) for i in doc_ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert pairs.get((ids[i], ids[j])) == 0, (
                    f"planted exact pair {ids[i]},{ids[j]} missing or "
                    "nonzero hamming"
                )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_cross_lingual_exact_matches_planted_multilang_texts(spark, sf_dir):
    """Every planted same-text-different-lang group must surface with
    exact counts; single-lang duplicate groups must NOT."""
    dups = _dup_texts(sf_dir)
    multilang = {t: (n, nl) for t, n, nl, _ in dups if nl >= 2}
    if not multilang:
        pytest.skip(
            f"no multi-lang duplicate texts at {sf_dir}: FIXTURES.md "
            "§4a plant request not served there"
        )
    rows = REGISTRY["dedup_cross_lingual_exact"].fn(spark, sf_dir).collect()
    got = {r.text: (r.n_docs, r.n_langs) for r in rows}
    assert got == multilang
