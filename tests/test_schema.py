"""Unit tests for the inference/merge lattice — pure Python, no Spark.

Mirrors the reference's test tables (value cites are
/root/reference/test/orca/core_test.clj): type-inference-test (:20-52),
typedef-test (:54-86), typedef->schema-test (:88-112),
merge-typedef-test (:127-145), simplify-typedef-test (:147-154).
"""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from orca_spark.schema import (
    infer_type,
    merge_types,
    parse_ddl,
    rows_to_schema,
    simplify,
    to_ddl,
    try_date,
    try_decimal,
    try_timestamp,
    TypeSet,
)


# --- type inference per value class (core_test.clj:20-52) ------------------

def test_infer_decimal_props():
    assert infer_type(Decimal("10.0")) == T.DecimalType(3, 1)
    assert infer_type(Decimal("1.0")) == T.DecimalType(2, 1)


def test_infer_boolean():
    assert infer_type(True) == T.BooleanType()
    assert infer_type(False) == T.BooleanType()


@pytest.mark.parametrize(
    "value,expected",
    [
        (10, T.ByteType()),
        (0, T.ByteType()),
        (32767, T.ShortType()),
        (-32768, T.ShortType()),
        (32768, T.IntegerType()),
        (-32769, T.IntegerType()),
        (2**31, T.LongType()),
        (-(2**31) - 1, T.LongType()),
        (2**63, T.DecimalType(38, 0)),
    ],
)
def test_infer_value_ranged_integrals(value, expected):
    assert infer_type(value) == expected


def test_infer_float_double_string_date_timestamp():
    assert infer_type(-1.0) == T.DoubleType()
    assert infer_type("") == T.StringType()
    assert infer_type("foo") == T.StringType()
    assert infer_type(dt.date(2017, 4, 3)) == T.DateType()
    assert infer_type(dt.datetime(2017, 4, 7, 17, 24, 3)) == T.TimestampType()
    assert infer_type(b"bytes") == T.BinaryType()


# --- typedef with coercion opts (core_test.clj:54-86) ----------------------

def test_string_coercions():
    assert infer_type("10") == T.StringType()
    assert infer_type("10", coerce_decimal_strings=True) == T.DecimalType(2, 0)
    assert infer_type("2017-04-10", coerce_date_strings=True) == T.DateType()
    assert (
        infer_type("2017-05-07T06:39:18Z", coerce_timestamp_strings=True)
        == T.TimestampType()
    )
    # probe order: a date string stays a date even with all probes on
    assert (
        infer_type("2017-04-10", coerce_date_strings=True, coerce_timestamp_strings=True,
                   coerce_decimal_strings=True)
        == T.DateType()
    )


def test_decimal_min_scale_precision():
    assert (
        infer_type(Decimal("10"), min_decimal_scale=2, min_decimal_precision=10)
        == T.DecimalType(10, 2)
    )


def test_infer_arrays():
    assert infer_type([1]) == T.ArrayType(T.ByteType())
    assert infer_type([1, -1]) == T.ArrayType(T.ByteType())
    assert infer_type([1, None]) == T.ArrayType(T.ByteType())
    assert infer_type([]) == T.ArrayType(T.NullType())


def test_infer_array_of_heterogeneous_structs():
    t = infer_type([{"a": 1}, {"a": 10000}, {"a": 10001, "b": "foo"}])
    assert isinstance(t, T.ArrayType) and isinstance(t.elementType, TypeSet)
    # simplify collapses the set by merging: a widens byte→short, b unions in
    assert simplify(t) == T.ArrayType(
        T.StructType(
            [
                T.StructField("a", T.ShortType(), True),
                T.StructField("b", T.StringType(), True),
            ]
        )
    )


def test_infer_struct_mixed_keys_and_nil_drop():
    t = infer_type({"a": 1, "foo": "bar", 10: 11, "dropped": None})
    assert t == T.StructType(
        [
            T.StructField("a", T.ByteType(), True),
            T.StructField("foo", T.StringType(), True),
            T.StructField("10", T.ByteType(), True),
        ]
    )


def test_override_struct():
    t = infer_type({"_meta": {"x": 10, "y": ["a", "b", ["foo"]]}},
                   override_struct={"y": T.StringType()})
    assert t == T.StructType(
        [
            T.StructField(
                "_meta",
                T.StructType(
                    [
                        T.StructField("x", T.ByteType(), True),
                        T.StructField("y", T.StringType(), True),
                    ]
                ),
                True,
            )
        ]
    )


# --- typedef↔DDL (core_test.clj:88-125) ------------------------------------

@pytest.mark.parametrize(
    "value,ddl",
    [
        (1, "tinyint"),
        (128, "smallint"),
        (32768, "int"),
        (2**31, "bigint"),
        (1.0, "double"),
        ("hello", "string"),
        (Decimal("1.0"), "decimal(2,1)"),
        ({"k": "foo", "y": True}, "struct<k:string,y:boolean>"),
        (dt.date(2017, 1, 1), "date"),
        (dt.datetime(2017, 1, 1, 0, 0, 0), "timestamp"),
    ],
)
def test_to_ddl(value, ddl):
    assert to_ddl(infer_type(value)) == ddl


@pytest.mark.parametrize(
    "ddl,expected",
    [
        ("boolean", T.BooleanType()),
        ("string", T.StringType()),
        ("tinyint", T.ByteType()),
        ("smallint", T.ShortType()),
        ("int", T.IntegerType()),
        ("bigint", T.LongType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("timestamp", T.TimestampType()),
        ("array<int>", T.ArrayType(T.IntegerType())),
        ("map<string,string>", T.MapType(T.StringType(), T.StringType())),
        ("struct<x:double>", T.StructType([T.StructField("x", T.DoubleType())])),
    ],
)
def test_parse_ddl(ddl, expected):
    assert parse_ddl(ddl) == expected


# --- merge lattice (core_test.clj:127-145) ----------------------------------

def test_merge_struct_field_union():
    a = T.StructType([T.StructField("x", T.ByteType())])
    b = T.StructType([T.StructField("y", T.BooleanType())])
    assert merge_types(a, b) == T.StructType(
        [T.StructField("x", T.ByteType(), True), T.StructField("y", T.BooleanType(), True)]
    )


def test_merge_integral_widening():
    assert merge_types(T.ShortType(), T.ByteType()) == T.ShortType()
    assert merge_types(T.ShortType(), T.LongType()) == T.LongType()
    assert merge_types(T.ByteType(), T.ShortType()) == T.ShortType()
    assert merge_types(T.ShortType(), T.ShortType()) == T.ShortType()


def test_merge_coercible():
    assert merge_types(T.DoubleType(), T.ByteType()) == T.DoubleType()
    assert merge_types(T.ByteType(), T.FloatType()) == T.FloatType()


def test_merge_decimal_with_numerics_widens():
    """Divergence from the reference (which throws): integral merges as
    decimal(digits,0) under the max-merge rule, fractional goes to
    double — a decimal(3,2) partner must never absorb a long."""
    assert merge_types(T.LongType(), T.DecimalType(10, 2)) == T.DecimalType(19, 2)
    assert merge_types(T.DecimalType(3, 2), T.LongType()) == T.DecimalType(19, 2)
    assert merge_types(T.IntegerType(), T.DecimalType(3, 2)) == T.DecimalType(10, 2)
    assert merge_types(T.ByteType(), T.DecimalType(10, 2)) == T.DecimalType(10, 2)
    assert merge_types(T.DecimalType(38, 6), T.LongType()) == T.DecimalType(38, 6)
    assert merge_types(T.DoubleType(), T.DecimalType(10, 2)) == T.DoubleType()
    assert merge_types(T.DecimalType(38, 6), T.FloatType()) == T.DoubleType()


def test_merge_decimal_string_is_string():
    assert merge_types(T.DecimalType(4, 4), T.StringType()) == T.StringType()
    assert merge_types(T.DateType(), T.StringType()) == T.StringType()
    assert merge_types(T.TimestampType(), T.StringType()) == T.StringType()
    assert merge_types(T.IntegerType(), T.StringType()) == T.StringType()


def test_merge_decimals_max_both():
    assert merge_types(T.DecimalType(6, 2), T.DecimalType(6, 1)) == T.DecimalType(6, 2)
    assert merge_types(T.DecimalType(38, 2), T.DecimalType(10, 8)) == T.DecimalType(38, 8)


def test_merge_arrays():
    assert merge_types(
        T.ArrayType(T.ByteType()), T.ArrayType(T.IntegerType())
    ) == T.ArrayType(T.IntegerType())
    # empty-array child merges away
    assert merge_types(
        T.ArrayType(T.NullType()), T.ArrayType(T.StringType())
    ) == T.ArrayType(T.StringType())


def test_merge_incompatible_raises():
    with pytest.raises(ValueError):
        merge_types(T.BooleanType(), T.IntegerType())
    with pytest.raises(ValueError):
        merge_types(T.ArrayType(T.IntegerType()), T.StructType([]))


# --- simplify (core_test.clj:147-154) ---------------------------------------

def test_simplify_array_typeset():
    t = T.ArrayType(TypeSet([T.ByteType(), T.IntegerType()]))
    assert simplify(t) == T.ArrayType(T.IntegerType())


def test_simplify_struct_with_array_typeset():
    t = T.StructType(
        [T.StructField("values", T.ArrayType(TypeSet([T.ByteType(), T.IntegerType()])))]
    )
    assert simplify(t) == T.StructType(
        [T.StructField("values", T.ArrayType(T.IntegerType()), True)]
    )


def test_simplify_prunes_empty_structs():
    t = T.StructType(
        [
            T.StructField("values", T.StructType([])),
            T.StructField("a", T.ByteType()),
        ]
    )
    assert simplify(t) == T.StructType([T.StructField("a", T.ByteType(), True)])
    assert simplify(T.StructType([T.StructField("values", T.StructType([]))])) is None


# --- whole-dataset inference (rows->typedef, core.clj:431-437) --------------

def test_rows_to_schema_heterogeneous():
    rows = [{"x": "foo", "y": 10}, {"x": "bar", "y": 100000}, {"z": False}]
    assert rows_to_schema(rows) == T.StructType(
        [
            T.StructField("x", T.StringType(), True),
            T.StructField("y", T.IntegerType(), True),
            T.StructField("z", T.BooleanType(), True),
        ]
    )


def test_rows_to_schema_widening():
    rows = [{"v": 1}, {"v": 2.5}, {"v": None}]
    assert rows_to_schema(rows) == T.StructType([T.StructField("v", T.DoubleType(), True)])


# --- string probes ----------------------------------------------------------

def test_probes():
    assert try_date("2017-04-10") == dt.date(2017, 4, 10)
    assert try_date("2017-4-10") is None
    assert try_date("not a date") is None
    assert try_timestamp("2017-04-07T17:13:15.000Z") is not None
    assert try_timestamp("2017-04-07") is None
    assert try_decimal("10.5") == Decimal("10.5")
    assert try_decimal("1e3") == Decimal("1e3")
    assert try_decimal("Infinity") is None
    assert try_decimal("foo") is None
