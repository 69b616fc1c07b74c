"""Adversarial edges for the exclusion-set relational patterns
(q16 NOT IN, q20 threshold semi-join, q21 multi-exists): empty
exclusion set, everything excluded, and NULL join keys. The NOT IN
NULL-semantics note in relational7 (NULL keys filtered explicitly on
both sides so the anti-join and NOT IN's UNKNOWN semantics agree BY
CONSTRUCTION) is pinned here as a regression test — each corpus runs
the registered Spark query AND its registered DuckDB oracle on the
same parquet and compares values exactly, so a future edit that breaks
the construction (e.g. dropping the NULL filters) mismatches loudly
instead of silently dropping rows."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import orca_spark.queries  # noqa: F401  (populates the registry)
from orca_spark.registry import REGISTRY
from tests.conftest import normalize

_NAMES = [
    "q16_part_supplier_variety",
    "q20_part_supply_candidates",
    "q21_multi_supplier_orders",
]


def _write(d, lineitem, part, supplier):
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lineitem], pa.int64()),
                "l_partkey": pa.array([r[1] for r in lineitem], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in lineitem], pa.int64()),
                "l_quantity": pa.array([r[3] for r in lineitem], pa.float64()),
                "l_returnflag": pa.array([r[4] for r in lineitem], pa.string()),
            }
        ),
        str(d / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in part], pa.int64()),
                "p_name": pa.array([r[1] for r in part], pa.string()),
                "p_brand": pa.array([r[2] for r in part], pa.string()),
                "p_size": pa.array([r[3] for r in part], pa.int64()),
            }
        ),
        str(d / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in supplier], pa.int64()),
                "s_name": pa.array([r[1] for r in supplier], pa.string()),
                "s_acctbal": pa.array([r[2] for r in supplier], pa.float64()),
            }
        ),
        str(d / "supplier.parquet"),
    )
    return str(d)


_PARTS = [
    (1, "small widget", "B1", 1),
    (2, "large widget", "B1", 3),
    (3, "plain bolt", "B2", 5),
    (4, "odd widget", "B2", 9),  # size outside {1..5}: q16 must drop it
]


@pytest.fixture(scope="module")
def empty_exclusion_dir(tmp_path_factory):
    """Nobody is excluded (no negative balances), NULL l_suppkey lines
    present, multi-supplier orders exist: q16's NOT IN over an EMPTY set
    must keep every supplier, and the NULL lines must count nowhere."""
    lineitem = [
        (100, 1, 1, 5.0, "R"),
        (100, 2, 2, 6.0, "R"),   # order 100: suppliers {1, 2} -> multi
        (101, 1, 1, 7.0, "N"),   # order 101: single supplier
        (102, 3, 2, 8.0, "R"),
        (102, 3, None, 9.0, "R"),  # NULL suppkey: distinct-count ignores it
        (103, 4, 3, 1.0, "R"),   # only size-9 part: q16 drops via part filter
    ]
    supplier = [(1, "S1", 10.0), (2, "S2", 0.0), (3, "S3", 99.0)]
    return _write(tmp_path_factory.mktemp("edge_empty_excl"), lineitem, _PARTS, supplier)


@pytest.fixture(scope="module")
def all_excluded_dir(tmp_path_factory):
    """Every supplier excluded (q16 -> empty), no widget-matching parts
    (q20's threshold aggregate is empty -> avg NULL -> empty), and only
    single-supplier orders (q21 -> empty): all three must return zero
    rows WITH the right columns, on both engines."""
    lineitem = [
        (200, 1, 1, 5.0, "R"),
        (201, 1, 2, 6.0, "R"),
        (202, 2, 3, 7.0, "R"),
    ]
    part = [(1, "plain bolt", "B1", 2), (2, "bare nut", "B2", 4)]
    supplier = [(1, "S1", -1.0), (2, "S2", -2.0), (3, "S3", -0.5)]
    return _write(tmp_path_factory.mktemp("edge_all_excl"), lineitem, part, supplier)


@pytest.fixture(scope="module")
def null_keys_dir(tmp_path_factory):
    """NULL keys on BOTH sides of the exclusion: a NULL-key supplier
    with negative balance sits in the raw exclusion input (unfiltered,
    NOT IN would go UNKNOWN and return zero rows everywhere) and NULL
    l_suppkey lines sit in lineitem. The explicit IS NOT NULL filters
    on both sides are what keep the two engines agreeing."""
    lineitem = [
        (300, 1, 1, 5.0, "R"),
        (300, 2, 2, 6.0, "R"),     # multi-supplier order
        (301, 1, None, 7.0, "R"),  # NULL suppkey line
        (302, 2, 2, 8.0, "R"),
        (302, 2, None, 9.0, "R"),  # order with {2, NULL}: NOT multi
        (303, 3, 4, 2.0, "N"),
    ]
    supplier = [
        (1, "S1", 5.0),
        (2, "S2", -3.0),        # genuinely excluded
        (None, "S-null", -9.0),  # NULL key in the exclusion input
        (4, "S4", 1.0),
    ]
    return _write(tmp_path_factory.mktemp("edge_null_keys"), lineitem, _PARTS, supplier)


def _compare(spark, duck, name, sf_dir):
    for t in ("lineitem", "part", "supplier"):
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spec = REGISTRY[name]
    got = normalize(spec.fn(spark, sf_dir).toPandas())
    want = normalize(duck.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    return got


@pytest.mark.parametrize("name", _NAMES)
def test_empty_exclusion_set_keeps_everyone(spark, duck, empty_exclusion_dir, name):
    got = _compare(spark, duck, name, empty_exclusion_dir)
    if name == "q16_part_supplier_variety":
        # empty exclusion: all 3 (brand, size) groups of sizes 1-5 survive;
        # the size-9 part and the NULL-suppkey line are gone
        assert len(got) == 3
        assert got["supplier_cnt"].sum() == 3
    if name == "q21_multi_supplier_orders":
        assert set(got["s_name"]) == {"S1", "S2"}


@pytest.mark.parametrize("name", _NAMES)
def test_everything_excluded_yields_empty_not_error(spark, duck, all_excluded_dir, name):
    got = _compare(spark, duck, name, all_excluded_dir)
    assert len(got) == 0


@pytest.mark.parametrize("name", _NAMES)
def test_null_keys_on_both_sides(spark, duck, null_keys_dir, name):
    got = _compare(spark, duck, name, null_keys_dir)
    if name == "q16_part_supplier_variety":
        # supplier 2 is excluded; the NULL-key supplier row and the NULL
        # suppkey lines must not blank the result (raw NOT IN would)
        assert len(got) > 0
        flat = set(zip(got["p_brand"], got["p_size"], got["supplier_cnt"]))
        assert all(cnt >= 1 for *_, cnt in flat)
    if name == "q21_multi_supplier_orders":
        # order 300 ({1,2}) is the only multi order; {2,NULL} is not multi
        assert set(got["s_name"]) == {"S1", "S2"}
