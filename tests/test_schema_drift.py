"""Schema-drift classification: the merge lattice as a drift policy."""

from pyspark.sql import types as T

from orca_spark.operators.schema_ops import schema_drift
from tests.conftest import SF_DIR


def _schema(**cols):
    return T.StructType([T.StructField(k, v) for k, v in cols.items()])


def test_classifications():
    a = _schema(
        id=T.LongType(),
        n=T.IntegerType(),
        gone=T.StringType(),
        flag=T.BooleanType(),
        shrunk=T.LongType(),
    )
    b = _schema(
        id=T.LongType(),
        n=T.DoubleType(),
        fresh=T.StringType(),
        flag=T.IntegerType(),
        shrunk=T.IntegerType(),
    )
    got = {r[0]: r for r in schema_drift(a, b)}
    assert got["id"][4] == "unchanged"
    assert got["n"][4] == "widened" and got["n"][3] == "double"
    assert got["gone"][4] == "removed"
    assert got["fresh"][4] == "added"
    # boolean + int is uncombinable in the lattice (core.clj:381-382)
    assert got["flag"][4] == "incompatible" and got["flag"][3] is None
    # int fits in long: the old type absorbs the new one
    assert got["shrunk"][4] == "narrowed" and got["shrunk"][3] == "bigint"


def test_registered_report_on_driver_corpus(spark):
    from orca_spark.queries import queries

    rows = {
        r.column: r
        for r in queries()["schema_drift_report"](spark, SF_DIR).collect()
    }
    assert rows["doc_id"].change == "unchanged"
    assert rows["text"].change == "unchanged"
    assert rows["n_chars"].change == "widened"
    assert rows["n_chars"].merged == "double"
    assert rows["lang"].change == "added"
