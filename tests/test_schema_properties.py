"""Property-based tests for the merge lattice: the algebraic laws the
reference's reduce-based merging silently relies on
(``rows->typedef`` folds combine-typedef pairwise, core.clj:431-437 —
correctness of the fold requires commutativity + associativity)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from orca_spark.schema import merge_types

_PRIMS = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
    T.DateType(),
    T.TimestampType(),
    T.BooleanType(),
    T.BinaryType(),
    T.DecimalType(10, 2),
    T.DecimalType(38, 6),
]


def types_strategy(depth: int = 2):
    prim = st.sampled_from(_PRIMS)
    if depth == 0:
        return prim
    child = types_strategy(depth - 1)
    return st.one_of(
        prim,
        st.builds(T.ArrayType, child),
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c", "d"]), child),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ).map(lambda kvs: T.StructType([T.StructField(k, v, True) for k, v in kvs])),
    )


def try_merge(a, b):
    try:
        return merge_types(a, b)
    except (ValueError, NotImplementedError):
        return None


def canon(t):
    """Sort struct fields recursively: merge keeps first-seen field order
    (the reference's Clojure maps are unordered), so commutativity holds
    up to field ordering, not positionally."""
    if t is None:
        return None
    if isinstance(t, T.ArrayType):
        return T.ArrayType(canon(t.elementType))
    if isinstance(t, T.StructType):
        return T.StructType(
            [T.StructField(f.name, canon(f.dataType), True)
             for f in sorted(t.fields, key=lambda f: f.name)]
        )
    return t


@settings(max_examples=300, deadline=None)
@given(types_strategy(), types_strategy())
def test_merge_commutative(a, b):
    assert canon(try_merge(a, b)) == canon(try_merge(b, a))


@settings(max_examples=200, deadline=None)
@given(types_strategy())
def test_merge_idempotent(a):
    assert merge_types(a, a) == a
    assert merge_types(None, a) == a
    assert merge_types(a, None) == a


@settings(max_examples=300, deadline=None)
@given(types_strategy(1), types_strategy(1), types_strategy(1))
def test_merge_associative_when_defined(a, b, c):
    left = try_merge(try_merge(a, b), c) if try_merge(a, b) is not None else None
    right = try_merge(a, try_merge(b, c)) if try_merge(b, c) is not None else None
    if left is not None and right is not None:
        assert canon(left) == canon(right)


@settings(max_examples=300, deadline=None)
@given(types_strategy(), types_strategy())
def test_merge_widens_never_narrows(a, b):
    """The merge result must absorb both inputs: re-merging an input into
    the result changes nothing (lattice upper-bound property)."""
    m = try_merge(a, b)
    if m is not None:
        assert try_merge(m, a) == m
        assert try_merge(m, b) == m
