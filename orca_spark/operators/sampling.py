"""Weighted sampling without replacement — the data-mix curation
primitive (upsample high-quality sources, downsample boilerplate) in a
form that is deterministic, distributed, and oracle-checkable.

Efraimidis–Spirakis (A-ES): draw u ~ U(0,1) per item, rank by
``ln(u) / w`` descending, take the top k — exactly equivalent to
sequential weighted sampling without replacement.  The uniform is NOT
``rand()`` (irreproducible across retries/engines) but a content hash:
the first 8 hex digits of ``md5(doc_id)`` scaled into (0,1) — the same
derandomization the stratified sampler (``analytics.py``) uses, which
is what makes a DuckDB oracle possible and what a 100 TB pipeline
wants anyway (re-running a failed stage must not resample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

_K_PER_GROUP = 10

# (hash32 + 0.5) / 2^32 ∈ (0, 1): the +0.5 keeps ln() finite at hash 0
_SCALE = float(1 << 32)


def md5_uniform(col):
    """Deterministic uniform in (0,1) from a column's md5 — the single
    derandomization every sampler in this module shares (change it here
    and the weighted sampler and the mix resampler stay in lockstep)."""
    h32 = F.conv(
        F.substring(F.md5(F.encode(col.cast("string"), "UTF-8")), 1, 8), 16, 10
    ).cast("long")
    return (h32 + F.lit(0.5)) / F.lit(_SCALE)


@register(
    "sample_weighted_per_lang",
    oracle=f"""
        WITH keyed AS (
            SELECT lang, doc_id, n_chars,
                   ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       + 0.5) / {_SCALE!r}) / n_chars AS es_key
            FROM documents
            WHERE n_chars > 0
        ),
        ranked AS (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY es_key DESC, doc_id) AS rk
            FROM keyed
        )
        SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS sample_rank
        FROM ranked WHERE rk <= {_K_PER_GROUP}
    """,
    description=f"weighted sampling without replacement, {_K_PER_GROUP} "
    "docs per language with probability proportional to n_chars "
    "(Efraimidis-Spirakis ln(u)/w ranking): the uniform is md5-derived "
    "from doc_id so the sample is reproducible across runs, retries and "
    "engines, and the rank key is rounded to 12 decimals before the "
    "window (a last-ulp ln() difference between the two engines' libm "
    "must not flip the k-th rank); one window shuffle on lang",
)
def sample_weighted_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group under the A-ES key: one partitioned window.

    Scale: the only shuffle is the window's hash partitioning on the
    group key.  A skewed group (one language dominating a 100 TB
    corpus) turns the window into a single-task sort — the fix at that
    scale is the two-phase top-k (per-partition top-k, then merge),
    which ``relational4``'s top-k pattern already implements; this
    form is right while every group fits a task's sort spill budget.
    The selection probability is exactly proportional to the weight;
    ties on the double key are broken by doc_id for cross-engine
    determinism (a tie requires an md5 collision in the top 32 bits
    AND equal weights — broken deterministically anyway).
    """
    d = load(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = md5_uniform(F.col("doc_id"))
    keyed = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 12).alias("es_key"),
    )
    w = W.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= _K_PER_GROUP)
        .select("lang", "doc_id", "n_chars", "sample_rank")
    )


@register(
    "curriculum_order",
    oracle="""
        WITH dec AS (
            SELECT doc_id, n_chars,
                   ntile(10) OVER (ORDER BY n_chars NULLS FIRST,
                                   doc_id NULLS FIRST) AS decile
            FROM documents
        )
        SELECT doc_id, n_chars,
               CAST(decile AS BIGINT) AS decile,
               CAST(row_number() OVER (
                   ORDER BY decile NULLS FIRST,
                            md5(CAST(doc_id AS VARCHAR)) NULLS FIRST,
                            doc_id NULLS FIRST
               ) AS BIGINT) AS curriculum_rank
        FROM dec
    """,
    description="curriculum ordering: documents ranked easy-to-hard by "
    "length decile (ntile with deterministic tie-break), shuffled "
    "WITHIN each decile by content hash so every epoch's order is "
    "reproducible without an RNG — the data-ordering primitive for "
    "curriculum training schedules",
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile/rank are single-partition windows — correct here and
    at any scale where the ORDERING ITSELF must be materialized as one
    sequence. The distributed form at 100 TB: decile BOUNDS from
    approx_percentile (one agg), assign deciles by comparison (no
    window), then ``repartitionByRange(decile, h)`` +
    ``sortWithinPartitions`` writes the curriculum as a key-clustered
    layout (see parquet_compaction_roundtrip) whose files ARE the
    schedule — no global sequence ever materializes."""
    d = load(spark, sf_dir, "documents")
    wd = W.orderBy("n_chars", "doc_id")
    dec = d.select(
        "doc_id",
        "n_chars",
        F.ntile(10).over(wd).cast("long").alias("decile"),
    )
    h = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    wr = W.orderBy("decile", h, "doc_id")
    return dec.select(
        "doc_id",
        "n_chars",
        "decile",
        F.row_number().over(wr).cast("long").alias("curriculum_rank"),
    )


# per-source sampling multipliers for the registered mix: downsample the
# noisy half of sources, upsample two high-value ones. Fractional parts
# resolve per doc via the same md5-derived uniform as the samplers.
_MIX = {"src0": 2.0, "src1": 1.5, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 1.0


@register(
    "corpus_mix_resample",
    oracle=f"""
        WITH m AS (
            SELECT doc_id, source,
                   CASE source
                       WHEN 'src0' THEN 2.0 WHEN 'src1' THEN 1.5
                       WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.25
                       ELSE {_MIX_DEFAULT!r} END AS mult,
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    + 0.5) / {float(1 << 32)!r} AS u
            FROM documents
        ),
        c AS (
            SELECT doc_id, source,
                   CAST(floor(mult) AS BIGINT)
                   + CASE WHEN u < mult - floor(mult) THEN 1 ELSE 0 END AS copies
            FROM m
        )
        SELECT doc_id, source, CAST(t.c AS BIGINT) AS copy_id
        FROM c, unnest(range(1, copies + 1)) AS t(c)
    """,
    description="deterministic mixture resampling: per-source "
    "multipliers (2x/1.5x upsample, 0.5x/0.25x downsample) applied as "
    "floor(m) guaranteed copies plus one md5-hash-thresholded extra "
    "for the fractional part — E[copies] = m exactly, reproducible "
    "across runs/engines, emitted as (doc, copy_id) rows via one "
    "explode, no shuffle; the data-mixing primitive that reweights "
    "sources for a training run",
)
def corpus_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    mult = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(m)) for s, m in _MIX.items()],
        F.lit(_MIX_DEFAULT),
    )
    u = md5_uniform(F.col("doc_id"))
    copies = F.floor(mult).cast("long") + F.when(
        u < mult - F.floor(mult), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        d.select("doc_id", "source", copies.alias("copies"))
        .where(F.col("copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("copies"))).alias(
                "copy_id"
            ),
        )
    )
