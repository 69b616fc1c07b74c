"""Node-level analytics of the document near-duplicate graph.

Three surfaces over the same exact-Jaccard (>= 9/10) edge set as
``graph_neardup_degree`` / ``graph_triangle_census``:

* ``graph_clustering_coefficient`` — PER-NODE local clustering
  coefficient (triangles at the node / wedges at the node). The census
  answers "is the graph clique-like overall"; this answers it per
  document, which is what a survivor policy actually consumes: a doc
  with cc ~ 1 sits inside a closed duplicate family (keep one member,
  drop the rest), a high-degree doc with low cc is a chain hub where
  transitive dedup would over-delete.
* ``graph_kcore`` — fixed-round k-core peel (k=3, 6 synchronous
  rounds): the dense duplication backbone. Surviving the 3-core means
  the document sits in heavily cross-linked template mass — the first
  candidates for aggressive removal budgets.
* ``graph_link_prediction_jaccard`` — neighborhood-Jaccard scores for
  NON-adjacent representative pairs that share a common neighbor: the
  classic common-neighbors link predictor, used here as a "families
  about to merge" diagnostic (two families whose neighborhoods overlap
  heavily are one threshold notch away from becoming one component).

Scale design: all three run on the EXACT-SET CONTRACTED graph (the
graph2.py move): documents with identical token sets collapse to one
weighted representative before any pair enumeration, so a 200-copy
boilerplate family costs one node. Per-node statistics lift back to
documents by closed-form combinatorics — every member of a weight-w
group has the same degree (w-1 + sum of neighbor weights) and the same
triangle count, so the per-doc answer is a set_key join, not a per-doc
graph computation. Rep triangles use the degree-ordered orientation
(out-neighborhoods bounded by arboricity); candidate pairs come from
dedup.py's adaptive generator — never all-pairs.

Determinism: degrees, triangle counts, and core degrees are BIGINT
combinatorics; coefficients are ratios of exact integers rounded at
the surface; the k-core peel runs a FIXED number of synchronous rounds
(documented) so both engines compute the identical partial fixpoint,
the same contract as graph.py's label propagation. The DuckDB oracles
compute the same numbers directly on the raw doc-level graph —
structurally different evaluation, identical values.

Reference parity: the reference (core.clj) has no graph surface; these
are LLM-pipeline extensions graded as engine components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.graph import _THR_DEN, _THR_NUM
from orca_spark.registry import register
from orca_spark.tables import load

_KEY_SHIFT = 1 << 40  # degree-major sortable key: deg * 2^40 + rep id

_KCORE_K = 3  # peel threshold: survive with degree >= 3
_KCORE_ROUNDS = 6  # fixed synchronous peel rounds (documented partial)

_LP_TOPK = 20  # link-prediction suggestions returned

# Shared doc-level edge CTEs for the oracles (same text as graph.py's
# degree oracle): tokens -> sizes -> shared-count pairs -> kept edges.
_EDGE_CTES = f"""
    tok AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    kept AS MATERIALIZED (
        SELECT doc_a, doc_b
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * {_THR_DEN} >= (sa.sz + sb.sz - i) * {_THR_NUM}
    ),
    sym AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM kept
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM kept
    )
"""


def _contracted(spark: SparkSession, sf_dir: str):
    """(groups, rep_edges): weighted identical-set groups and the
    exact-Jaccard >= 9/10 edges between their representatives."""
    from orca_spark.operators.dedup import _rep_pairs_adaptive

    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    # one tokenize+hash+sort pass: sets feeds BOTH the group agg and the
    # final per-doc lift (doc_sets); left lazy it re-tokenized the whole
    # corpus once per consumer
    sets = (
        docs.select(
            "doc_id",
            F.sort_array(
                F.array_distinct(
                    F.transform(F.split("text", " "), lambda t: F.xxhash64(t))
                )
            ).alias("ts"),
        )
        .withColumn("set_key", F.xxhash64("ts"))
        .localCheckpoint(eager=True)
    )
    groups = (
        sets.groupBy("set_key")
        .agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).alias("w"),
            F.min_by("ts", "doc_id").alias("ts"),
        )
        .localCheckpoint(eager=True)  # reused: pair gen, stats, doc join
    )
    rep_edges = _rep_pairs_adaptive(
        groups.select(F.col("rep").alias("doc_id"), "ts"), threshold=0.9
    ).localCheckpoint(eager=False)
    doc_sets = sets.select("doc_id", "set_key")
    return groups, rep_edges, doc_sets


def _weighted_oriented(rep_edges: DataFrame, weights: DataFrame) -> DataFrame:
    """Degree-ordered orientation of the rep graph with both endpoint
    weights attached: (src, dst, dk, wsrc, wdst), src's key < dst's key.
    Weight attachment rides the same two joins that build the keys, so
    triangle closure later needs NO extra weight joins."""
    incident = rep_edges.select(F.col("doc_a").alias("doc_id")).unionAll(
        rep_edges.select(F.col("doc_b").alias("doc_id"))
    )
    deg = incident.groupBy("doc_id").agg(F.count(F.lit(1)).alias("d"))
    keyed = (
        rep_edges.join(
            deg.select(F.col("doc_id").alias("doc_a"), F.col("d").alias("da")),
            "doc_a",
        )
        .join(
            deg.select(F.col("doc_id").alias("doc_b"), F.col("d").alias("db")),
            "doc_b",
        )
        .join(
            weights.select(F.col("rep").alias("doc_a"), F.col("w").alias("wa")),
            "doc_a",
        )
        .join(
            weights.select(F.col("rep").alias("doc_b"), F.col("w").alias("wb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "wa",
            "wb",
            (F.col("da") * _KEY_SHIFT + F.col("doc_a")).alias("ka"),
            (F.col("db") * _KEY_SHIFT + F.col("doc_b")).alias("kb"),
        )
    )
    lo_first = F.col("ka") < F.col("kb")
    return keyed.select(
        F.when(lo_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("src"),
        F.when(lo_first, F.col("doc_b")).otherwise(F.col("doc_a")).alias("dst"),
        F.greatest("ka", "kb").alias("dk"),
        F.when(lo_first, F.col("wa")).otherwise(F.col("wb")).alias("wsrc"),
        F.when(lo_first, F.col("wb")).otherwise(F.col("wa")).alias("wdst"),
    ).localCheckpoint(eager=False)


@register(
    "graph_clustering_coefficient",
    oracle=f"""
        WITH {_EDGE_CTES},
        deg AS (
            SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS degree
            FROM sym GROUP BY u
        ),
        tri AS (
            SELECT s1.u AS doc_id, CAST(count(*) AS BIGINT) AS t
            FROM sym s1
            JOIN sym s2 ON s2.u = s1.u AND s2.v > s1.v
            JOIN kept e ON e.doc_a = s1.v AND e.doc_b = s2.v
            GROUP BY s1.u
        )
        SELECT d.doc_id, d.degree,
               COALESCE(t.t, 0) AS triangles,
               round(2.0 * COALESCE(t.t, 0)
                     / (d.degree * (d.degree - 1)), 4) AS cc
        FROM deg d LEFT JOIN tri t USING (doc_id)
        WHERE d.degree >= 2
    """,
    description="per-document local clustering coefficient in the "
    "exact-Jaccard >= 9/10 near-dup graph (2*triangles/(deg*(deg-1)), "
    "docs with degree >= 2): cc ~ 1 marks closed duplicate families "
    "where transitive dedup is safe, low cc at high degree marks chain "
    "hubs where it over-deletes; identical-set families contract to "
    "weighted reps and per-doc values lift back by closed-form "
    "combinatorics, so counts are BIGINT-exact and only the final "
    "ratio is rounded",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangles on the contracted graph, for a node in group
    g with weight w and alien (cross-group) neighbor mass S1 = sum w_h:

        tri = C(w-1, 2)            (two co-members)
            + (w-1) * S1           (one co-member + one alien)
            + sum_h C(w_h, 2)      (two aliens in the same group)
            + sum_{{g,h,k}} w_h*w_k  (aliens in two adjacent groups)

    The last sum enumerates rep-level triangles once via the
    degree-ordered orientation and charges each corner the product of
    the OTHER two corners' weights. Every count is group-uniform, so
    the per-doc surface is a set_key join."""
    groups, rep_edges, doc_sets = _contracted(spark, sf_dir)
    weights = groups.select("rep", "w")

    halves = rep_edges.select(
        F.col("doc_a").alias("rep"), F.col("doc_b").alias("nbr")
    ).unionAll(
        rep_edges.select(F.col("doc_b").alias("rep"), F.col("doc_a").alias("nbr"))
    )
    nbr_stats = (
        halves.join(
            weights.select(F.col("rep").alias("nbr"), F.col("w").alias("wn")),
            "nbr",
        )
        .groupBy("rep")
        .agg(
            F.sum("wn").alias("s1"),
            F.sum(F.expr("wn * (wn - 1) div 2")).alias("s2c"),
        )
    )

    oriented = _weighted_oriented(rep_edges, weights)
    wedge = (
        oriented.alias("x")
        .join(oriented.alias("y"), F.col("x.src") == F.col("y.src"))
        .where(F.col("x.dk") < F.col("y.dk"))
        .select(
            F.col("x.src").alias("g"),
            F.col("x.dst").alias("h"),
            F.col("y.dst").alias("k"),
            F.col("x.wsrc").alias("wg"),
            F.col("x.wdst").alias("wh"),
            F.col("y.wdst").alias("wk"),
        )
    )
    closed = wedge.join(
        oriented.select(F.col("src").alias("h"), F.col("dst").alias("k")),
        ["h", "k"],
    )
    corner = (
        closed.select(
            F.col("g").alias("rep"), (F.col("wh") * F.col("wk")).alias("t")
        )
        .unionAll(
            closed.select(
                F.col("h").alias("rep"), (F.col("wg") * F.col("wk")).alias("t")
            )
        )
        .unionAll(
            closed.select(
                F.col("k").alias("rep"), (F.col("wg") * F.col("wh")).alias("t")
            )
        )
        .groupBy("rep")
        .agg(F.sum("t").alias("t_rep"))
    )

    per_group = (
        groups.select("set_key", "rep", "w")
        .join(nbr_stats, "rep", "left")
        .join(corner, "rep", "left")
        .select(
            "set_key",
            "w",
            F.coalesce("s1", F.lit(0).cast("long")).alias("s1"),
            F.coalesce("s2c", F.lit(0).cast("long")).alias("s2c"),
            F.coalesce("t_rep", F.lit(0).cast("long")).alias("t_rep"),
        )
        .select(
            "set_key",
            (F.col("w") - 1 + F.col("s1")).alias("degree"),
            (
                F.expr("(w - 1) * (w - 2) div 2")
                + (F.col("w") - 1) * F.col("s1")
                + F.col("s2c")
                + F.col("t_rep")
            ).alias("triangles"),
        )
        .where(F.col("degree") >= 2)
    )
    return doc_sets.join(per_group, "set_key").select(
        "doc_id",
        "degree",
        "triangles",
        F.round(
            F.lit(2.0)
            * F.col("triangles")
            / (F.col("degree") * (F.col("degree") - 1)),
            4,
        ).alias("cc"),
    )


def _kcore_oracle_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    """Doc-level unrolled peel: alive_r = nodes whose degree within
    alive_{r-1} is >= k; emit alive_R with the degree induced by
    alive_R (the same partial fixpoint the Spark loop computes)."""
    ctes = [f"a0 AS (SELECT u AS doc_id FROM sym GROUP BY u)"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""d{r} AS (
                SELECT s.u AS doc_id, count(*) AS c
                FROM sym s
                JOIN a{r - 1} x ON x.doc_id = s.u
                JOIN a{r - 1} y ON y.doc_id = s.v
                GROUP BY s.u
            ),
            a{r} AS MATERIALIZED (SELECT doc_id FROM d{r} WHERE c >= {k})"""
        )
    ctes.append(
        f"""dfin AS (
            SELECT s.u AS doc_id, count(*) AS c
            FROM sym s
            JOIN a{rounds} x ON x.doc_id = s.u
            JOIN a{rounds} y ON y.doc_id = s.v
            GROUP BY s.u
        )"""
    )
    body = ",\n".join(ctes)
    return f"""
        WITH {_EDGE_CTES},
        {body}
        SELECT a.doc_id, CAST(COALESCE(d.c, 0) AS BIGINT) AS core_degree
        FROM a{rounds} a LEFT JOIN dfin d USING (doc_id)
    """


@register(
    "graph_kcore",
    oracle=_kcore_oracle_sql(),
    description=f"documents surviving a {_KCORE_ROUNDS}-round synchronous "
    f"{_KCORE_K}-core peel of the near-dup graph, with their degree "
    "induced by the surviving set: the dense duplication backbone "
    "(first candidates under an aggressive removal budget); fixed "
    "round count makes the partial fixpoint engine-independent, all "
    "degrees BIGINT, peel runs on the contracted graph where every "
    "member of an identical-set family peels in lockstep by "
    "construction",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the peel loop runs on the GROUP graph (|distinct sets|
    nodes), not documents — a member of a weight-w group holds w-1
    internal edges, so group members share one degree and peel
    together, making the rep-level loop exactly the doc-level peel.
    Each round is one weight-join + groupBy over the shrinking alive
    set, lineage-truncated with a lazy localCheckpoint (the CC-loop
    hygiene from dedup.py); the edge set checkpoints once up front."""
    groups, rep_edges, doc_sets = _contracted(spark, sf_dir)
    weights = groups.select("set_key", "rep", "w")

    halves = (
        rep_edges.select(F.col("doc_a").alias("rep"), F.col("doc_b").alias("nbr"))
        .unionAll(
            rep_edges.select(
                F.col("doc_b").alias("rep"), F.col("doc_a").alias("nbr")
            )
        )
        .localCheckpoint(eager=False)
    )

    # start from ALL groups: a degree-0 group peels in round 1 and
    # contributes nothing to any neighbor's degree, so this matches the
    # oracle's incident-nodes-only a0 exactly from round 1 onward
    alive = weights

    def round_degrees(alive_df: DataFrame) -> DataFrame:
        live_halves = halves.join(
            alive_df.select("rep"), "rep", "left_semi"
        ).join(
            alive_df.select(F.col("rep").alias("nbr"), F.col("w").alias("wn")),
            "nbr",
        )
        mass = live_halves.groupBy("rep").agg(F.sum("wn").alias("s1"))
        return (
            alive_df.join(mass, "rep", "left")
            .select(
                "set_key",
                "rep",
                "w",
                (
                    F.col("w")
                    - 1
                    + F.coalesce("s1", F.lit(0).cast("long"))
                ).alias("deg"),
            )
        )

    for _ in range(_KCORE_ROUNDS):
        alive = (
            round_degrees(alive)
            .where(F.col("deg") >= _KCORE_K)
            .select("set_key", "rep", "w")
            .localCheckpoint(eager=False)
        )

    final = round_degrees(alive).select("set_key", F.col("deg").alias("core_degree"))
    return doc_sets.join(final, "set_key").select("doc_id", "core_degree")


@register(
    "graph_link_prediction_jaccard",
    oracle=f"""
        WITH setsig AS (
            SELECT doc_id,
                   list_sort(list_distinct(string_split(text, ' '))) AS ts
            FROM documents WHERE text IS NOT NULL
        ),
        groups AS (SELECT min(doc_id) AS rep FROM setsig GROUP BY ts),
        rtok AS (
            SELECT g.rep AS doc_id, unnest(s.ts) AS w
            FROM setsig s JOIN groups g ON g.rep = s.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM rtok GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM rtok a JOIN rtok b ON a.w = b.w AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        kept AS (
            SELECT doc_a, doc_b
            FROM shared
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i * {_THR_DEN} >= (sa.sz + sb.sz - i) * {_THR_NUM}
        ),
        sym AS (
            SELECT doc_a AS u, doc_b AS v FROM kept
            UNION ALL
            SELECT doc_b AS u, doc_a AS v FROM kept
        ),
        deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u),
        cn AS (
            SELECT s1.u AS doc_a, s2.u AS doc_b,
                   CAST(count(*) AS BIGINT) AS common_nbrs
            FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
            GROUP BY 1, 2
        ),
        cand AS (
            SELECT c.doc_a, c.doc_b, c.common_nbrs,
                   c.common_nbrs * 1.0
                   / (da.d + db.d - c.common_nbrs) AS raw
            FROM cn c
            JOIN deg da ON da.u = c.doc_a
            JOIN deg db ON db.u = c.doc_b
            WHERE NOT EXISTS (
                SELECT 1 FROM kept k
                WHERE k.doc_a = c.doc_a AND k.doc_b = c.doc_b
            )
        )
        SELECT doc_a, doc_b, common_nbrs, round(raw, 4) AS score
        FROM cand
        ORDER BY raw DESC, doc_a, doc_b
        LIMIT {_LP_TOPK}
    """,
    description=f"top-{_LP_TOPK} neighborhood-Jaccard link predictions "
    "between NON-adjacent duplicate-family representatives that share "
    "a near-dup neighbor: families one threshold notch from merging "
    "(the dedup analog of common-neighbors link prediction); computed "
    "on the contracted rep graph, score = |N(a) n N(b)| / |N(a) u "
    "N(b)| from BIGINT counts, ordered by the exact ratio with an id "
    "tie-break so the top-k set is engine-independent",
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the wedge join runs on the rep graph's symmetric halves
    (edge-set sized, never corpus sized); the non-adjacency check is a
    pair-keyed anti-join against the same edge set; the final top-k is
    a model-sized ORDER BY ... LIMIT. At extreme hub degrees the wedge
    join through one rep is C(deg, 2) — the standard mitigation
    (degree-cap the hub's candidate emission, or switch to the minhash
    of neighborhoods) is noted, not needed at current scales."""
    groups, rep_edges, _ = _contracted(spark, sf_dir)

    sym = rep_edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
        rep_edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    cn = (
        sym.alias("s1")
        .join(sym.alias("s2"), F.col("s1.v") == F.col("s2.v"))
        .where(F.col("s1.u") < F.col("s2.u"))
        .groupBy(F.col("s1.u").alias("doc_a"), F.col("s2.u").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common_nbrs"))
    )
    cand = (
        cn.join(rep_edges, ["doc_a", "doc_b"], "left_anti")
        .join(deg.select(F.col("u").alias("doc_a"), F.col("d").alias("da")), "doc_a")
        .join(deg.select(F.col("u").alias("doc_b"), F.col("d").alias("db")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common_nbrs",
            (
                F.col("common_nbrs")
                / (F.col("da") + F.col("db") - F.col("common_nbrs"))
            ).alias("raw"),
        )
    )
    return (
        cand.orderBy(F.col("raw").desc(), "doc_a", "doc_b")
        .limit(_LP_TOPK)
        .select("doc_a", "doc_b", "common_nbrs", F.round("raw", 4).alias("score"))
    )
