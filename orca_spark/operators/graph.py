"""Graph analytics over the document near-duplicate graph.

Nodes are documents; edges are exact token-Jaccard >= 0.9 pairs (the
same verifiable edge set ``dedup_jaccard_exact`` emits). Two surfaces:

* ``graph_neardup_degree`` — per-node degree + the degree histogram's
  raw form: the standard duplication-structure profile (a heavy tail
  here means template/boilerplate families, the thing you inspect
  before choosing a dedup survivor policy).
* ``graph_label_propagation`` — semi-supervised label spread: clamp a
  20% seed set's ``lang`` labels and propagate by iterative majority
  vote over the edges. The weak-supervision primitive (label a sample,
  let near-duplicate structure label the rest); also the simplest
  message-passing template the engine exposes beyond connected
  components' pointer jumping.

Reference parity: the reference (core.clj) has no graph surface; these
are LLM-pipeline extensions graded as engine components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from orca_spark.registry import register
from orca_spark.tables import load

# Jaccard edge threshold as an exact rational (9/10): membership is
# decided by integer cross-multiplication, never a float compare
_THR_NUM = 9
_THR_DEN = 10

_LP_ROUNDS = 4  # synchronous propagation rounds (fixed, documented)
_LP_SEED_MOD = 5  # doc_id % 5 == 0 keeps its label: a deterministic 20% seed


def neardup_edges(docs: DataFrame) -> DataFrame:
    """Undirected near-dup edges (doc_a < doc_b) by exact token-set
    Jaccard >= 9/10, decided in integer arithmetic:
    ``i * den >= (sa + sb - i) * num``.

    Same SSJoin shape as dedup_jaccard_exact: the token self-join is
    word-keyed (frequent tokens are the skew hazard; the prefix-filter
    variant in text3.py is the scale escape), intersection counts
    partial-aggregate map-side."""
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .where(
            F.col("i") * _THR_DEN
            >= (F.col("za.sz") + F.col("zb.sz") - F.col("i")) * _THR_NUM
        )
        .select("doc_a", "doc_b")
    )


@register(
    "graph_neardup_degree",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
            FROM documents WHERE text IS NOT NULL
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        edges AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        kept AS (
            SELECT doc_a, doc_b
            FROM edges
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i * {_THR_DEN} >= (sa.sz + sb.sz - i) * {_THR_NUM}
        ),
        incident AS (
            SELECT doc_a AS doc_id FROM kept
            UNION ALL
            SELECT doc_b AS doc_id FROM kept
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
        FROM incident GROUP BY doc_id
    """,
    description="per-document degree in the exact-Jaccard (>= 9/10) "
    "near-dup graph: the duplication-structure profile inspected "
    "before choosing a survivor policy; integer threshold arithmetic, "
    "nodes with no edges omitted",
)
def graph_neardup_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: inherits dedup_jaccard_exact's SSJoin shape (word-keyed
    self-join + map-side partial agg); the degree count is one extra
    doc_id-keyed shuffle over the EDGE set (far smaller than the token
    stream). Isolated nodes are omitted — at 100 TB the node table
    never needs to be materialized just to emit zeros."""
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    e = neardup_edges(docs)
    incident = e.select(F.col("doc_a").alias("doc_id")).unionAll(
        e.select(F.col("doc_b").alias("doc_id"))
    )
    return incident.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))


def label_propagation(
    docs: DataFrame,
    rounds: int = _LP_ROUNDS,
    seed_mod: int = _LP_SEED_MOD,
) -> DataFrame:
    """Clamped-seed synchronous label propagation over the near-dup graph.

    Docs with ``doc_id % seed_mod == 0`` are seeds and keep their
    ``lang`` forever; every other node takes, each round, the majority
    label among its labeled neighbors (ties broken by smaller label
    string — fully deterministic). Unreached nodes stay NULL.

    Scale: each round is one edge->label join (doc_id-keyed) plus one
    majority vote (groupBy dst) — the same per-round cost profile as
    connected components, with the label table localCheckpoint'ed
    each round to truncate lineage (rounds are fixed, so no
    convergence collect is needed). Votes shuffle on (dst, label):
    bounded by the label alphabet, no skew beyond the graph's own."""
    nodes = docs.select("doc_id", "lang")
    seeds = F.pmod(F.col("doc_id"), F.lit(seed_mod)) == 0
    labels = nodes.select(
        "doc_id",
        F.when(seeds, F.col("lang")).alias("label"),
        seeds.alias("is_seed"),
    ).localCheckpoint(eager=True)

    e = neardup_edges(docs)
    # undirected: messages flow both ways
    edges = (
        e.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(e.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .localCheckpoint(eager=True)  # reused every round
    )

    for _ in range(rounds):
        votes = (
            edges.join(
                labels.where(F.col("label").isNotNull()).select(
                    F.col("doc_id").alias("src"), "label"
                ),
                "src",
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        best = (
            votes.withColumn(
                "rk",
                F.row_number().over(
                    W.partitionBy("dst").orderBy(F.col("n").desc(), F.col("label"))
                ),
            )
            .where(F.col("rk") == 1)
            .select(F.col("dst").alias("doc_id"), F.col("label").alias("vote"))
        )
        labels = (
            labels.join(best, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("is_seed"), F.col("label"))
                .otherwise(F.coalesce(F.col("vote"), F.col("label")))
                .alias("label"),
                "is_seed",
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("doc_id", "label", "is_seed")


@register(
    "graph_label_propagation",
    description=f"clamped-seed label propagation ({_LP_ROUNDS} synchronous "
    f"rounds, doc_id %% {_LP_SEED_MOD} == 0 seeds keep lang) over the "
    "exact-Jaccard near-dup graph: majority vote per round, "
    "smaller-label tiebreak — weak-supervision label spread; iterative, "
    "so behavior-tested (planted clusters) instead of SQL-oracled",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return label_propagation(docs)
