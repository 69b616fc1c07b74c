"""Snapshot diffing: classify every key across two table versions as
added / removed / changed / unchanged — the regression gate a pipeline
runs between yesterday's output and today's before publishing.

Rows compare by a content hash of their value columns, so the diff
never ships row payloads through the join — it is a full outer join of
(key, 8-byte hash) pairs whatever the row width.  The two "versions"
here are deterministic halves of the events table with a planted
overlap, giving every class a non-empty population at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, value_cols: list[str]
) -> DataFrame:
    """(key, status) for every key in either snapshot.

    Scale: each side reduces to (key, hash) before the join — the
    shuffle moves 16 bytes per row regardless of row width; the
    classification is a projection over the joined pair.  Works
    unchanged as the foreachBatch body of an incremental publisher.
    """
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in value_cols]))
    o = old.select(F.col(key).alias("k"), h.alias("oh"))
    n = new.select(F.col(key).alias("k"), h.alias("nh"))
    j = o.join(n, "k", "full")
    status = (
        F.when(F.col("oh").isNull(), "added")
        .when(F.col("nh").isNull(), "removed")
        .when(F.col("oh") != F.col("nh"), "changed")
        .otherwise("unchanged")
    )
    return j.select(F.col("k").alias(key), status.alias("status"))


@register(
    "snapshot_diff_events",
    oracle="""
        WITH old AS (
            SELECT event_id,
                   md5(concat_ws(chr(31), CAST(event_type AS VARCHAR),
                                 CAST(value AS VARCHAR))) AS h
            FROM events WHERE event_id % 3 <> 0
        ),
        new AS (
            SELECT event_id,
                   md5(concat_ws(chr(31), CAST(event_type AS VARCHAR),
                                 CAST(CASE WHEN event_id % 5 = 0
                                           THEN value + 1.0 ELSE value END
                                      AS VARCHAR))) AS h
            FROM events WHERE event_id % 3 <> 1
        )
        SELECT CASE WHEN o.h IS NULL THEN 'added'
                    WHEN n.h IS NULL THEN 'removed'
                    WHEN o.h <> n.h THEN 'changed'
                    ELSE 'unchanged' END AS status,
               count(*) AS n_keys
        FROM old o FULL JOIN new n USING (event_id)
        GROUP BY 1
    """,
    description="snapshot diff: two table versions (deterministic "
    "event halves, some values perturbed) classified added/removed/"
    "changed/unchanged per key by comparing md5 content hashes — the "
    "join ships (key, hash) pairs only, 16 bytes/row whatever the row "
    "width; the publish gate that catches a silent pipeline regression "
    "before downstream consumers do",
)
def snapshot_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    old = ev.where(F.col("event_id") % 3 != 0).select(
        "event_id", "event_type", "value"
    )
    new = ev.where(F.col("event_id") % 3 != 1).select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 5 == 0, F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("value"),
    )
    d = snapshot_diff(old, new, "event_id", ["event_type", "value"])
    return d.groupBy("status").agg(F.count(F.lit(1)).alias("n_keys"))
