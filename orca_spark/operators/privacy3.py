"""Data-governance audit, part 3: t-closeness of sensitive values.

Completes the classic release-audit trio. k-anonymity (privacy.py)
counts group size; l-diversity (privacy2.py) counts distinct sensitive
values — and is itself famously insufficient when a group's values are
distinct but SKEWED relative to the population (a group that is 90%
one diagnosis in a population where it is 1% discloses plenty while
passing l=3). ``privacy_t_closeness_audit`` closes that gap: for the
same quasi-identifier groups (lang, source, size bucket), it reports
the total-variation distance between the group's sensitive-value
distribution and the corpus-wide distribution, flagging groups whose
distance exceeds t — the skew-attack surface the first two audits
miss. (Total variation is the standard t-closeness metric for
categorical attributes, where the EMD ground distance is uniform.)

The identity that keeps it one-pass: summing only over values PRESENT
in the group,

    TV_g = 0.5 * ( 1 + sum_v ( |c_gv/n_g - c_v/N| - c_v/N ) )

since absent values contribute exactly their global mass c_v/N — no
group x full-domain expansion is ever materialized.

Determinism: every ratio derives from exact BIGINT counts (identical
doubles both engines); the per-group sum is rounded at the surface,
and the t flag compares the ROUNDED distance so an order-dependent
last ulp can never flip it.

Scale: sensitive-value counts are one map-side-combinable groupBy;
the global distribution is vocabulary-sized and broadcast; the final
aggregation lands on the bounded quasi-identifier space, same as the
k and l audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.registry import register
from orca_spark.tables import load

_T = 0.5  # maximum allowed total-variation distance
_BUCKET = 100  # same size-bucket granularity as the k/l audits


@register(
    "privacy_t_closeness_audit",
    oracle=f"""
        WITH base AS (
            SELECT lang, source,
                   CAST((n_chars - ((n_chars % {_BUCKET} + {_BUCKET})
                                    % {_BUCKET})) // {_BUCKET} AS BIGINT)
                       AS size_bucket,
                   string_split(text, ' ')[1] AS sv
            FROM documents
            WHERE text IS NOT NULL
        ),
        gv AS (
            SELECT lang, source, size_bucket, sv,
                   CAST(count(*) AS BIGINT) AS c_gv
            FROM base GROUP BY 1, 2, 3, 4
        ),
        gw AS (
            -- group totals via a window, NOT a join: NULL-keyed
            -- quasi-identifier groups must stay in the audit, and a
            -- null-unsafe join would silently drop them
            SELECT lang, source, size_bucket, sv, c_gv,
                   CAST(sum(c_gv) OVER (PARTITION BY lang, source,
                                        size_bucket) AS BIGINT) AS n_g
            FROM gv
        ),
        gdist AS (
            SELECT sv, CAST(sum(c_gv) AS BIGINT) AS c_v FROM gv GROUP BY sv
        ),
        tot AS (SELECT CAST(sum(c_v) AS BIGINT) AS n FROM gdist),
        terms AS (
            SELECT gw.lang, gw.source, gw.size_bucket, gw.n_g,
                   abs(gw.c_gv * 1.0 / gw.n_g - gdist.c_v * 1.0 / tot.n)
                   - gdist.c_v * 1.0 / tot.n AS t
            FROM gw
            JOIN gdist USING (sv)
            CROSS JOIN tot
        )
        SELECT lang, source, size_bucket,
               n_g AS group_n,
               round(0.5 * (1 + sum(t)), 4) AS tv_distance,
               round(0.5 * (1 + sum(t)), 4) <= {_T} AS t_close
        FROM terms
        GROUP BY lang, source, size_bucket, n_g
    """,
    description=f"t-closeness audit (t={_T}, total-variation metric) "
    "over the same quasi-identifier groups as the k/l audits: distance "
    "between each group's sensitive-value distribution (leading token "
    "stand-in) and the corpus-wide one, flagging skewed groups the "
    "size and diversity audits pass; absent values fold into a "
    "closed-form 1+sum identity so no group x domain expansion exists, "
    "ratios derive from exact BIGINT counts, and the flag compares the "
    "ROUNDED distance so summation order cannot flip it",
)
def privacy_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    bucket = (
        (F.col("n_chars") - F.pmod(F.col("n_chars"), F.lit(_BUCKET)))
        / F.lit(_BUCKET)
    ).cast("long")
    base = docs.select(
        "lang",
        "source",
        bucket.alias("size_bucket"),
        F.split("text", " ").getItem(0).alias("sv"),
    )
    from pyspark.sql import Window as W

    gv = base.groupBy("lang", "source", "size_bucket", "sv").agg(
        F.count(F.lit(1)).alias("c_gv")
    )
    # group totals via a window, NOT a join: NULL-keyed groups must
    # stay in the audit (window partitioning groups NULLs together in
    # both engines; a null-unsafe join would silently drop them)
    gw = gv.withColumn(
        "n_g",
        F.sum("c_gv").over(W.partitionBy("lang", "source", "size_bucket")),
    )
    glob = gv.groupBy("sv").agg(F.sum("c_gv").alias("c_v"))
    tot = glob.agg(F.sum("c_v").alias("n"))
    term = F.abs(
        F.col("c_gv") / F.col("n_g") - F.col("c_v") / F.col("n")
    ) - F.col("c_v") / F.col("n")
    tv = F.round(F.lit(0.5) * (F.lit(1) + F.sum("t")), 4)
    return (
        gw.join(F.broadcast(glob), "sv")
        .crossJoin(F.broadcast(tot))
        .select("lang", "source", "size_bucket", "n_g", term.alias("t"))
        .groupBy("lang", "source", "size_bucket", "n_g")
        .agg(tv.alias("tv_distance"), (tv <= _T).alias("t_close"))
        .withColumnRenamed("n_g", "group_n")
    )
