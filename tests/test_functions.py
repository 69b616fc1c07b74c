"""Value-conversion functions vs the reference's conversion tests
(/root/reference/test/orca/core_test.clj:195-213)."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from orca_spark.functions import to_bytes, to_date, to_instant, to_long


def one(spark, value, schema, expr):
    return spark.createDataFrame([(value,)], schema).select(expr.alias("v")).collect()[0].v


def test_to_long_date_is_epoch_day(spark):
    # (to-long (LocalDate/of 2017 1 2)) => 17168 (core_test.clj:196-197)
    assert one(spark, dt.date(2017, 1, 2), "x date",
               to_long(F.col("x"), T.DateType())) == 17168


def test_to_long_boolean(spark):
    assert one(spark, True, "x boolean", to_long(F.col("x"), T.BooleanType())) == 1
    assert one(spark, False, "x boolean", to_long(F.col("x"), T.BooleanType())) == 0
    assert one(spark, 1, "x long", to_long(F.col("x"))) == 1


def test_to_instant_string_and_millis(spark):
    # Instant/parse (core_test.clj:203-207)
    assert one(
        spark, "2017-04-07T17:13:19.581Z", "x string", to_instant(F.col("x"))
    ) == dt.datetime(2017, 4, 7, 17, 13, 19, 581000)
    # Long 0 => epoch millis 0 (not seconds)
    assert one(spark, 0, "x long", to_instant(F.col("x"), T.LongType())) == dt.datetime(1970, 1, 1)
    assert one(spark, 1500, "x long", to_instant(F.col("x"), T.LongType())) == dt.datetime(
        1970, 1, 1, 0, 0, 1, 500000
    )


def test_to_date_string(spark):
    assert one(spark, "2017-05-06", "x string", to_date(F.col("x"))) == dt.date(2017, 5, 6)
    assert one(spark, "garbage", "x string", to_date(F.col("x"))) is None


def test_to_bytes(spark):
    assert one(spark, "foo", "x string", to_bytes(F.col("x"))) == b"foo"
    assert one(spark, True, "x boolean", to_bytes(F.col("x"))) == b"true"
    assert one(spark, 10, "x int", to_bytes(F.col("x"))) == b"10"
