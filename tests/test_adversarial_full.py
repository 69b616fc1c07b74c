"""Value-level oracle agreement for EVERY oracled query over the
full-schema degenerate corpus (tests/nasty_data.py).

This is the strongest form of the adversarial gate: the sf corpora the
driver verifies against contain no NULL keys, no empty strings, no
epoch-0/far-future timestamps, no zero-norm embeddings — so a query
and its oracle can agree there while disagreeing on exactly the rows a
real 100 TB corpus is full of. The first sweep of this harness found
27 latent divergences (ANSI divide-by-zero aborts, NULL sort-order
flips, byte- vs code-point levenshtein, NOT IN NULL semantics, CSV
NULL/'' collapse, a NULL-group-key crash in the cogroup path, a
NULL-ts value leak in the as-of carry window) — all green on sf data.
"""

import pytest

from orca_spark.queries import oracle_sql, queries
from tests.conftest import compare_query
from tests.nasty_data import write_nasty_sf

# Excluded (still totality-checked elsewhere), each for a reason a
# batch oracle cannot express:
# * streaming_dedup_user_event_types — watermark mechanics on
#   pathological timestamps: the epoch-0 event equals the INITIAL
#   watermark and is dropped as late, while the NULL-event-time row is
#   carried; batch DISTINCT can model neither.
_EXCLUDED = {
    "streaming_dedup_user_event_types",
}

_ORACLED = sorted(set(oracle_sql()) - _EXCLUDED)


@pytest.fixture(scope="module")
def nasty_full_dir(tmp_path_factory):
    return write_nasty_sf(str(tmp_path_factory.mktemp("nasty_full_sf")))


from tests.conftest import ADVERSARIAL_ORACLE_SWEEP  # noqa: E402


@ADVERSARIAL_ORACLE_SWEEP
@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_agreement_over_degenerate_corpus(spark, duck, nasty_full_dir, name):
    compare_query(spark, duck, queries()[name], oracle_sql()[name], nasty_full_dir)
