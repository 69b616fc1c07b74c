"""Value-conversion Column functions — reference parity for the four
conversion protocols (``/root/reference/src/orca/core.clj:41-58,
452-487``), expressed as Catalyst expressions (codegen'd, null-safe).

The reference dispatches per-cell on the runtime JVM class; a DataFrame
column has one static type, so these dispatch on the column's
``DataType`` (pass ``dtype``, or rely on the sensible default chain).
They back ``io.coerce_or_null``'s lenient writes and are usable in any
plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_long(col: Column, dtype: T.DataType | None = None) -> Column:
    """LongConversion (core.clj:472-480): number → long, date →
    epoch-day, boolean → 1/0. ``dtype`` is the column's static type
    (the reference's runtime-class dispatch, resolved at plan time)."""
    if isinstance(dtype, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    if isinstance(dtype, T.BooleanType):
        return col.cast("long")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_millis(col)  # instant → epoch millis, to-instant's inverse
    return col.try_cast(T.LongType())


def to_instant(col: Column, dtype: T.DataType | None = None) -> Column:
    """InstantConversion (core.clj:462-470): ISO-8601 string →
    timestamp; bare number → epoch-MILLIS (not seconds — the
    reference's explicit choice)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                          T.FloatType, T.DoubleType)):
        return F.timestamp_millis(col.cast("long"))
    return F.coalesce(
        F.try_to_timestamp(col.cast("string")),
        F.timestamp_millis(col.try_cast(T.LongType())),
    )


def to_date(col: Column) -> Column:
    """DateConversion (core.clj:482-487): ISO_DATE string → date,
    null on parse failure."""
    return col.try_cast(T.DateType())


def to_bytes(col: Column) -> Column:
    """ByteConversion (core.clj:452-460): anything → UTF-8 bytes of its
    string form (JVM-style booleans: 'true'/'false')."""
    s = col.cast("string")
    jvm_style = F.when(F.lower(s).isin("true", "false"), F.lower(s)).otherwise(s)
    return F.encode(jvm_style, "UTF-8")
