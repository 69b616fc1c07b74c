"""Type inference and the schema-merge lattice (reference parity).

Rebuilds, over ``pyspark.sql.types.DataType`` trees, the reference's
schema subsystem (``/root/reference/src/orca/core.clj:91-437``):

* value → type inference with value-ranged integrals
  (``core.clj:116-218``: 10 → tinyint, 40000 → int, …),
* optional string coercion probes in the fixed order
  date → timestamp → decimal (``core.clj:278-303``),
* the Hive implicit-conversion widening lattice
  (``core.clj:103-114``) driving pairwise merge (``core.clj:357-429``):
  integral widening, decimal max(p)/max(s), struct field union, array
  child merge, ``{decimal, string} → string``,
* simplification: heterogeneous array children collapse to one merged
  type; empty structs prune to nothing (``core.clj:407-426``).

Everything here is driver-side pure Python — inference cost is O(sample
size), never part of the distributed plan. The produced ``StructType``
feeds ``spark.createDataFrame`` / ``spark.read.schema`` directly.

Deliberate divergences (documented in README):

* ``uniontype`` (writable-but-unreadable in the reference,
  ``core.clj:352-355``) is unsupported — Spark has no union type.
* ``char``/char-array infers as ``string`` (Spark vectors have no char
  type; reference: ``core.clj:120-123,146-148``).
* decimal precision caps at Spark's max 38.
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal, InvalidOperation
from typing import Any, Iterable

from pyspark.sql import types as T

MAX_PRECISION = 38

_BYTE = T.ByteType()
_SHORT = T.ShortType()
_INT = T.IntegerType()
_LONG = T.LongType()
_FLOAT = T.FloatType()
_DOUBLE = T.DoubleType()
_STRING = T.StringType()
_BOOL = T.BooleanType()
_DATE = T.DateType()
_TS = T.TimestampType()
_BIN = T.BinaryType()

_INTEGRAL_ORDER = [T.ByteType, T.ShortType, T.IntegerType, T.LongType]
_NUMERIC_ORDER = [T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType]


class TypeSet(T.DataType):
    """Internal marker for heterogeneous array children before
    simplification (reference keeps a set of typedefs,
    ``core.clj:269-276``); :func:`simplify` collapses it via merge.
    Subclasses DataType only so it can ride inside ArrayType; it must
    never reach a real Spark schema."""

    def __init__(self, types: Iterable[Any]):
        uniq: list[Any] = []
        for t in types:
            if t is not None and t not in uniq:
                uniq.append(t)
        self.types = uniq

    def __eq__(self, other):
        return isinstance(other, TypeSet) and self.types == other.types

    def __repr__(self):
        return f"TypeSet({self.types!r})"

    def simpleString(self) -> str:
        return "typeset<" + ",".join(t.simpleString() for t in self.types) + ">"


# ---------------------------------------------------------------------------
# value → type inference (data-type / typedef, core.clj:116-303)
# ---------------------------------------------------------------------------

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})$")
_DECIMAL_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def _decimal_type(d: Decimal, min_scale: int = 0, min_precision: int = 0) -> T.DecimalType:
    """DecimalType with Java-BigDecimal-compatible precision/scale
    (reference data-props, core.clj:160-162; min-* opts core.clj:241-249)."""
    sign, digits, exponent = d.as_tuple()
    if not isinstance(exponent, int):  # NaN / Infinity tuples
        raise ValueError(f"non-finite decimal: {d}")
    scale = max(0, -exponent)
    # Java: precision = number of unscaled digits (≥1); positive exponents
    # add trailing zeros to the integer part
    precision = max(1, len(digits) + max(0, exponent))
    scale = max(scale, min_scale)
    precision = max(precision, min_precision, scale)  # Spark needs p >= s
    return T.DecimalType(min(precision, MAX_PRECISION), min(scale, MAX_PRECISION))


def try_date(s: str):
    """ISO_DATE probe (core.clj:290-292): 'YYYY-MM-DD' or None."""
    if not _DATE_RE.match(s):
        return None
    try:
        return _dt.date.fromisoformat(s)
    except ValueError:
        return None


def try_timestamp(s: str):
    """ISO-8601 instant probe (core.clj:294-297), offset required."""
    if not _TS_RE.match(s):
        return None
    try:
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


def try_decimal(s: str):
    """BigDecimal-parse probe (core.clj:278-288)."""
    if not _DECIMAL_RE.match(s.strip()):
        return None
    try:
        return Decimal(s.strip())
    except InvalidOperation:
        return None


def infer_type(value: Any, **opts: Any):
    """Infer the typedef of one value; ``None`` for null (no type).

    Options (reference ``core.clj:228-303``): ``coerce_date_strings``,
    ``coerce_timestamp_strings``, ``coerce_decimal_strings``
    (probe order fixed: date → timestamp → decimal),
    ``min_decimal_scale``, ``min_decimal_precision``,
    ``override_struct`` ({field_name → DataType}).
    """
    if value is None:
        return None
    if isinstance(value, bool):  # before int: bool is an int subclass
        return _BOOL
    if isinstance(value, int):
        if -128 <= value <= 127:
            return _BYTE
        if -32768 <= value <= 32767:
            return _SHORT
        if -(2**31) <= value <= 2**31 - 1:
            return _INT
        if -(2**63) <= value <= 2**63 - 1:
            return _LONG
        return T.DecimalType(MAX_PRECISION, 0)  # beyond bigint
    if isinstance(value, float):
        return _DOUBLE
    if isinstance(value, Decimal):
        return _decimal_type(
            value,
            opts.get("min_decimal_scale", 0),
            opts.get("min_decimal_precision", 0),
        )
    if isinstance(value, str):
        if opts.get("coerce_date_strings") and try_date(value) is not None:
            return _DATE
        if opts.get("coerce_timestamp_strings") and try_timestamp(value) is not None:
            return _TS
        if opts.get("coerce_decimal_strings"):
            d = try_decimal(value)
            if d is not None:
                return _decimal_type(
                    d,
                    opts.get("min_decimal_scale", 0),
                    opts.get("min_decimal_precision", 0),
                )
        return _STRING
    if isinstance(value, _dt.datetime):  # before date: datetime is a date subclass
        return _TS
    if isinstance(value, _dt.date):
        return _DATE
    if isinstance(value, (bytes, bytearray)):
        return _BIN
    if isinstance(value, dict):
        overrides = opts.get("override_struct") or {}
        fields = []
        for k, v in value.items():
            name = str(k)
            if name in overrides:
                fields.append(T.StructField(name, overrides[name], True))
                continue
            child = infer_type(v, **opts)
            if child is None:
                continue  # nil-valued keys dropped (core.clj:257-267)
            fields.append(T.StructField(name, _concrete(child), True))
        return T.StructType(fields)
    if isinstance(value, (list, tuple)):
        children = [infer_type(v, **opts) for v in value]
        ts = TypeSet(children)
        if not ts.types:
            return T.ArrayType(T.NullType())  # empty/all-null ⇒ no child type
        if len(ts.types) == 1:
            return T.ArrayType(_concrete(ts.types[0]))
        return T.ArrayType(ts)
    raise TypeError(f"cannot infer ORC/Spark type for {type(value).__name__}: {value!r}")


def _concrete(t):
    """Collapse a TypeSet into a single DataType by pairwise merge."""
    if isinstance(t, TypeSet):
        merged = None
        for x in t.types:
            merged = merge_types(merged, _concrete(x))
        return merged
    if isinstance(t, T.ArrayType):
        return T.ArrayType(_concrete(t.elementType))
    return t


# ---------------------------------------------------------------------------
# pairwise merge lattice (combine-typedef, core.clj:357-429)
# ---------------------------------------------------------------------------

def _rank(t, order) -> int:
    for i, cls in enumerate(order):
        if isinstance(t, cls):
            return i
    return -1


def merge_types(a, b):
    """Merge two typedefs into the widest compatible type.

    Implements the reference's dispatch (``core.clj:366-429``) over the
    Hive implicit-conversion lattice (``core.clj:103-114``):
    nil-identity, exact match, integral widening, decimal max-merge,
    numeric widening through float/double, ``{decimal,string} →
    string``, date/timestamp → string, array child merge, struct field
    union. Raises ``ValueError`` on uncombinable pairs (e.g.
    boolean + int), matching the reference's ex-info throw
    (``core.clj:381-382``).

    One documented divergence: the reference also throws on
    decimal-with-props vs other numerics; this implementation widens
    instead (see the inline comment at the decimal+numeric branch).
    """
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, TypeSet) or isinstance(b, TypeSet):
        return merge_types(_concrete(a), _concrete(b))
    if a == b:
        return a

    # both decimal: independent max of precision and scale (core.clj:395-396),
    # capped at Spark's 38
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        return T.DecimalType(
            min(max(a.precision, b.precision), MAX_PRECISION),
            min(max(a.scale, b.scale), MAX_PRECISION),
        )

    ra, rb = _rank(a, _NUMERIC_ORDER), _rank(b, _NUMERIC_ORDER)
    if ra >= 0 and rb >= 0:  # integral/fractional widening
        return _NUMERIC_ORDER[max(ra, rb)]()

    # numeric + decimal — DOCUMENTED DIVERGENCE from the reference, which
    # throws on decimal-with-props vs numeric (combine-typedef's coercible
    # branch, core.clj:378-382). We widen instead:
    #   * integral + decimal(p,s): view an N-digit integral as
    #     decimal(N,0) and max-merge precision/scale independently —
    #     exactly the reference's own decimal⊕decimal rule
    #     (core.clj:395-396), and the only widening that keeps the fold
    #     laws (commutative/associative/absorbing) the reduce-based
    #     rows->typedef relies on. Like that rule, the result may
    #     under-provision integer digits by up to `s` for extreme values
    #     (e.g. long ⊕ decimal(3,2) → decimal(19,2), 17 integer digits).
    #   * float/double + decimal → double (decimal → double is an allowed
    #     Hive implicit conversion; keeping the decimal would silently
    #     truncate the fractional range).
    _INTEGRAL_DIGITS = {T.ByteType: 3, T.ShortType: 5, T.IntegerType: 10, T.LongType: 19}
    for dec, num in ((a, b), (b, a)):
        if isinstance(dec, T.DecimalType) and _rank(num, _NUMERIC_ORDER) >= 0:
            if isinstance(num, (T.FloatType, T.DoubleType)):
                return T.DoubleType()
            digits = _INTEGRAL_DIGITS[type(num)]
            return T.DecimalType(
                min(max(dec.precision, digits), MAX_PRECISION), dec.scale
            )

    # anything string-coercible + string → string: numerics, decimal
    # (explicit #{decimal string} → string, core.clj:428-429), date,
    # timestamp (core.clj:111-113)
    stringish = (T.StringType, T.VarcharType, T.CharType)
    for x, y in ((a, b), (b, a)):
        if isinstance(x, stringish) and (
            isinstance(y, stringish)
            or isinstance(y, T.DecimalType)
            or _rank(y, _NUMERIC_ORDER) >= 0
            or isinstance(y, (T.DateType, T.TimestampType))
        ):
            return _STRING

    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        ea = None if isinstance(a.elementType, T.NullType) else a.elementType
        eb = None if isinstance(b.elementType, T.NullType) else b.elementType
        merged = merge_types(ea, eb)
        return T.ArrayType(merged if merged is not None else T.NullType())

    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(
            merge_types(a.keyType, b.keyType), merge_types(a.valueType, b.valueType)
        )

    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        names = [f.name for f in a.fields]
        by_name = {f.name: f.dataType for f in a.fields}
        for f in b.fields:
            if f.name in by_name:
                by_name[f.name] = merge_types(by_name[f.name], f.dataType)
            else:
                names.append(f.name)
                by_name[f.name] = f.dataType
        return T.StructType([T.StructField(n, by_name[n], True) for n in names])

    raise ValueError(f"unable to combine types: {a.simpleString()} vs {b.simpleString()}")


def simplify(t):
    """Collapse TypeSets and prune empty structs (core.clj:407-426)."""
    if t is None:
        return None
    if isinstance(t, TypeSet):
        return simplify(_concrete(t))
    if isinstance(t, T.ArrayType):
        child = simplify(t.elementType)
        return T.ArrayType(child if child is not None else T.NullType())
    if isinstance(t, T.StructType):
        fields = []
        for f in t.fields:
            child = simplify(f.dataType)
            if isinstance(child, T.StructType) and not child.fields:
                continue  # empty struct prunes away
            if child is None:
                continue
            fields.append(T.StructField(f.name, child, True))
        if not fields:
            return None
        return T.StructType(fields)
    return t


def rows_to_schema(rows: Iterable[Any], **opts: Any) -> T.StructType | None:
    """Whole-dataset inference (``rows->typedef``, core.clj:431-437):
    per-row typedef → simplify → reduce merge. Rows are dicts (named
    fields). Returns a ``StructType`` ready for ``createDataFrame``."""
    merged = None
    for row in rows:
        merged = merge_types(merged, infer_type(row, **opts))
    out = simplify(merged)
    if out is not None and not isinstance(out, T.StructType):
        raise ValueError(f"rows must infer to a struct, got {out.simpleString()}")
    return out


# ---------------------------------------------------------------------------
# DDL round-trip (typedef↔schema, core.clj:305-355)
# ---------------------------------------------------------------------------

def to_ddl(t) -> str:
    """DataType → DDL string; Spark's simpleString matches ORC's
    TypeDescription syntax for every supported type."""
    return t.simpleString()


_PRIMITIVES = {
    "boolean": T.BooleanType,
    "tinyint": T.ByteType,
    "byte": T.ByteType,
    "smallint": T.ShortType,
    "short": T.ShortType,
    "int": T.IntegerType,
    "integer": T.IntegerType,
    "bigint": T.LongType,
    "long": T.LongType,
    "float": T.FloatType,
    "real": T.FloatType,
    "double": T.DoubleType,
    "string": T.StringType,
    "binary": T.BinaryType,
    "date": T.DateType,
    "timestamp": T.TimestampType,
    "timestamp_ntz": T.TimestampNTZType,
    "void": T.NullType,
    "null": T.NullType,
}


def parse_ddl(s: str):
    """DDL/ORC-TypeDescription string → DataType. Pure Python (no JVM) —
    the reference parses the same syntax via TypeDescription/fromString
    (core.clj:626); Spark's own parser needs a live SparkContext."""
    t, rest = _parse_type(s.strip())
    if rest.strip():
        raise ValueError(f"trailing input in DDL: {rest!r}")
    return t


def _parse_type(s: str):
    s = s.lstrip()
    m = re.match(r"^(\w+)", s)
    if not m:
        raise ValueError(f"cannot parse DDL at: {s!r}")
    name = m.group(1).lower()
    rest = s[m.end():]
    if name == "decimal":
        m2 = re.match(r"^\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", rest)
        if m2:
            return T.DecimalType(int(m2.group(1)), int(m2.group(2))), rest[m2.end():]
        return T.DecimalType(10, 0), rest
    if name in ("varchar", "char"):
        m2 = re.match(r"^\s*\(\s*(\d+)\s*\)", rest)
        n = int(m2.group(1)) if m2 else 255
        rest = rest[m2.end():] if m2 else rest
        return (T.VarcharType(n) if name == "varchar" else T.CharType(n)), rest
    if name == "array":
        rest = _expect(rest, "<")
        child, rest = _parse_type(rest)
        return T.ArrayType(child), _expect(rest, ">")
    if name == "map":
        rest = _expect(rest, "<")
        k, rest = _parse_type(rest)
        rest = _expect(rest, ",")
        v, rest = _parse_type(rest)
        return T.MapType(k, v), _expect(rest, ">")
    if name == "struct":
        rest = _expect(rest, "<")
        fields = []
        while True:
            rest = rest.lstrip()
            if rest.startswith(">"):
                return T.StructType(fields), rest[1:]
            fm = re.match(r"^\s*`?([\w.\- ]+?)`?\s*:", rest)
            if not fm:
                raise ValueError(f"cannot parse struct field at: {rest!r}")
            fname = fm.group(1)
            child, rest = _parse_type(rest[fm.end():])
            fields.append(T.StructField(fname, child, True))
            rest = rest.lstrip()
            if rest.startswith(","):
                rest = rest[1:]
    if name == "uniontype":
        raise NotImplementedError(
            "uniontype is unsupported: Spark has no union type "
            "(reference writes-but-never-reads it, core.clj:352-355)"
        )
    if name in _PRIMITIVES:
        return _PRIMITIVES[name](), rest
    raise ValueError(f"unknown type name: {name}")


def _expect(s: str, ch: str) -> str:
    s = s.lstrip()
    if not s.startswith(ch):
        raise ValueError(f"expected {ch!r} at: {s!r}")
    return s[1:]


# ---------------------------------------------------------------------------
# optional integral narrowing for orca-style smallest-type files
# ---------------------------------------------------------------------------

def narrow_integral_types(df):
    """Downcast long/int columns to the smallest integral type that holds
    their observed min/max — parity with the reference's value-ranged
    inference (core.clj:178-189) for data arriving as int64.

    One distributed min/max aggregate over all integral columns (single
    job), then a zero-shuffle cast projection.
    """
    from pyspark.sql import functions as F

    int_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType))
    ]
    if not int_cols:
        return df
    aggs = []
    for c in int_cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = []
    for f in df.schema.fields:
        if f.name in int_cols:
            lo, hi = row[f"__min_{f.name}"], row[f"__max_{f.name}"]
            target = f.dataType if lo is None else merge_types(infer_type(lo), infer_type(hi))
            out.append(F.col(f.name).cast(target).alias(f.name))
        else:
            out.append(F.col(f.name))
    return df.select(*out)
