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

Determinism: the per-value terms are brought to the common denominator
n_g·N, so the per-group sum is over EXACT BIGINT numerators

    S_g = sum_v ( |c_gv·N - c_v·n_g| - c_v·n_g ),
    TV_g = 0.5 * ( 1 + S_g / (n_g·N) )

and only ONE double division happens per group — identical integers
give identical doubles on both engines, so summation order cannot
move the result (a double per-term sum flipped the 4th decimal on 1 of
592 groups at sf0.1 — the r09 lane caught it). The BIGINT products are
exact up to ~3e9 documents (N² < 2^63); past that, the numerators move
to DECIMAL(38,0) with the same shape. The t flag compares the ROUNDED
distance, same as before.

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
            -- common denominator n_g*N: the numerator is exact BIGINT,
            -- so the per-group sum below is order-independent
            SELECT gw.lang, gw.source, gw.size_bucket, gw.n_g, tot.n,
                   abs(gw.c_gv * tot.n - gdist.c_v * gw.n_g)
                   - gdist.c_v * gw.n_g AS t_num
            FROM gw
            JOIN gdist USING (sv)
            CROSS JOIN tot
        )
        SELECT lang, source, size_bucket,
               n_g AS group_n,
               round(0.5 * (1 + sum(t_num) * 1.0 / (n_g * n)), 4)
                   AS tv_distance,
               round(0.5 * (1 + sum(t_num) * 1.0 / (n_g * n)), 4) <= {_T}
                   AS t_close
        FROM terms
        GROUP BY lang, source, size_bucket, n_g, n
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
    # common denominator n_g*N: exact BIGINT numerator per value, so the
    # per-group sum is order-independent; ONE double division per group
    term_num = F.abs(
        F.col("c_gv") * F.col("n") - F.col("c_v") * F.col("n_g")
    ) - F.col("c_v") * F.col("n_g")
    tv = F.round(
        F.lit(0.5)
        * (
            F.lit(1)
            + F.sum("t_num") * F.lit(1.0) / (F.col("n_g") * F.col("n"))
        ),
        4,
    )
    return (
        gw.join(F.broadcast(glob), "sv")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang", "source", "size_bucket", "n_g", "n", term_num.alias("t_num")
        )
        .groupBy("lang", "source", "size_bucket", "n_g", "n")
        .agg(tv.alias("tv_distance"), (tv <= _T).alias("t_close"))
        .withColumnRenamed("n_g", "group_n")
        .drop("n")
    )
