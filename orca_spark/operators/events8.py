"""Marketing analytics: multi-touch attribution; text readability.

* ``events_multitouch_attribution`` — linear (equal-split) multi-touch
  attribution: every purchase's value is divided equally across the
  same user's touch events (view/click) in the 24 hours before it, and
  credit is rolled up per touch type. The single-touch
  ``range_join_view_attribution`` (ranges.py) answers "which view gets
  THE credit"; this answers the budget question every channel report
  actually asks — "how much revenue does each touch type drive" —
  under the simplest defensible model.
* ``text_readability_proxy`` — a Flesch-style reading-ease proxy per
  language: words per sentence and vowel-group runs per word (the
  classic syllable stand-in), combined with the standard 206.835 -
  1.015*(w/s) - 84.6*(vg/w) formula. Not a measurement of true
  syllables — a deterministic, cross-engine-exact RANKING signal that
  separates prose from listings and run-on boilerplate, used next to
  the entropy rate and sentence stats.

Determinism: attribution divides an exact per-purchase value by an
exact BIGINT touch count — identical doubles per touch — and per-type
sums are rounded at the surface; readability counts are BIGINT regex
counts with the formula applied to exact-integer ratios, rounded.

Scale: the attribution join is user-keyed with a bounded time
predicate — per-user event lists bound the pair work exactly like the
as-of join; the readability scan aggregates straight to |langs| rows
with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_WINDOW_H = 24
_TOUCH_TYPES = ("view", "click")
_VOWELS = "[aeiouAEIOU]+"
_SENT = "[.!?]+"


@register(
    "events_multitouch_attribution",
    oracle=f"""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value
            FROM events
            WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND user_id IS NOT NULL AND value IS NOT NULL
        ),
        touches AS (
            SELECT event_id, user_id, ts, event_type
            FROM events
            WHERE event_type IN ('view', 'click') AND ts IS NOT NULL
              AND user_id IS NOT NULL
        ),
        pt AS (
            SELECT p.event_id AS pid, p.value, t.event_type
            FROM purchases p
            JOIN touches t
              ON t.user_id = p.user_id
             AND t.ts <= p.ts
             AND t.ts > p.ts - INTERVAL {_WINDOW_H} HOUR
        ),
        counted AS (
            SELECT pid, value, event_type,
                   CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS n_t
            FROM pt
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_touches,
               round(sum(value / n_t), 4) AS attributed_value
        FROM counted
        GROUP BY event_type
    """,
    description=f"linear multi-touch attribution: each purchase's value "
    f"split equally across the same user's view/click touches in the "
    f"prior {_WINDOW_H}h, rolled up per touch type — the channel "
    "budget report (vs the single-touch last-view attribution in "
    "ranges.py); per-touch credit is an exact value over an exact "
    "BIGINT count, per-type sums rounded at the surface; the join is "
    "user-keyed with a bounded time predicate, never wider than "
    "per-user event lists",
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        "value",
    )
    touches = ev.where(
        F.col("event_type").isin(*_TOUCH_TYPES)
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select("user_id", F.col("ts").alias("tts"), "event_type")
    pt = purchases.join(touches, "user_id").where(
        (F.col("tts") <= F.col("pts"))
        & (
            F.col("tts")
            > F.col("pts") - F.expr(f"INTERVAL {_WINDOW_H} HOURS")
        )
    )
    from pyspark.sql import Window as W

    counted = pt.withColumn(
        "n_t", F.count(F.lit(1)).over(W.partitionBy("pid"))
    )
    return counted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum(F.col("value") / F.col("n_t")), 4).alias(
            "attributed_value"
        ),
    )


@register(
    "text_readability_proxy",
    oracle=f"""
        WITH per_doc AS (
            SELECT lang,
                   len(list_filter(string_split(text, ' '),
                                   t -> t <> '')) AS w,
                   len(regexp_extract_all(text, '{_SENT}')) AS s,
                   len(regexp_extract_all(text, '{_VOWELS}')) AS vg
            FROM documents
            WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        agg AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS words,
                   CAST(sum(s) AS BIGINT) AS sentences,
                   CAST(sum(vg) AS BIGINT) AS vowel_groups
            FROM per_doc GROUP BY lang
        )
        SELECT lang, n_docs, words, sentences, vowel_groups,
               round(206.835
                     - 1.015 * (words * 1.0 / nullif(sentences, 0))
                     - 84.6 * (vowel_groups * 1.0 / nullif(words, 0)),
                     4) AS flesch_proxy
        FROM agg
    """,
    description="per-language Flesch-style reading-ease proxy: words "
    "per sentence and vowel-group runs per word (the syllable "
    "stand-in) through the standard 206.835 formula — a deterministic "
    "ranking signal separating prose from listings/run-ons, not a "
    "true-syllable measurement; all counts are BIGINT regex counts, "
    "the formula applies to exact-integer ratios, rounded at the "
    "surface",
)
def text_readability_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    per_doc = docs.select(
        "lang",
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).alias("w"),
        F.regexp_count("text", F.lit(_SENT)).alias("s"),
        F.regexp_count("text", F.lit(_VOWELS)).alias("vg"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").cast("long").alias("words"),
        F.sum("s").cast("long").alias("sentences"),
        F.sum("vg").cast("long").alias("vowel_groups"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "words",
        "sentences",
        "vowel_groups",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("words") / F.nullif(F.col("sentences"), F.lit(0)))
            - F.lit(84.6)
            * (F.col("vowel_groups") / F.nullif(F.col("words"), F.lit(0))),
            4,
        ).alias("flesch_proxy"),
    )
