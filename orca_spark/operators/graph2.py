"""Triangle census of the document near-duplicate graph.

``graph_triangle_census`` reports the global triangle count, wedge
count, and clustering coefficient of the exact-Jaccard (>= 9/10) edge
set — the one-number answer to "are my duplicate families cliques or
chains?". Template/boilerplate families show up as near-cliques
(clustering → 1): dedup can safely keep one survivor per component.
A low coefficient with high degree means chained borderline pairs —
transitive dedup there is lossy, and a threshold bump is warranted.

The scale design is EXACT-SET CONTRACTION first — the same opening
move as ``dedup_connected_components``: documents with identical
token sets (Jaccard exactly 1, the bulk of real duplication) collapse
to one weighted representative, and every census total becomes
combinatorics over the contracted graph:

    edges     = sum_g C(w_g, 2)  +  sum_(a,b) w_a w_b
    triangles = sum_g C(w_g, 3)
              + sum_(a,b) [C(w_a,2) w_b + w_a C(w_b,2)]
              + sum_(a,b,c) w_a w_b w_c          (rep triangles)
    deg(doc in g) = (w_g - 1) + sum_{h in N(g)} w_h
    wedges    = sum_g w_g * C(deg_g, 2)

so a 200-copy boilerplate family costs ONE node instead of C(200,2)
edges and C(200,3) triangle-join rows. (The first form of this query
ran the wedge join on the raw edge set; at sf0.1's 965k-edge corpus
that was 31 s of clique re-enumeration — the contracted form computes
the identical totals from |distinct sets| nodes.) Rep-level triangles
still use the degree-ordered orientation (one BIGINT (degree, id) key,
out-neighborhoods bounded by arboricity), and rep candidate pairs come
from dedup.py's adaptive generator — never an all-pairs join.

Determinism: all counts are BIGINT combinatorics; the clustering
coefficient is a ratio of two exact integers rounded at the surface.
The DuckDB oracle computes the same totals directly on the raw doc
graph (id-ordered triangle enumeration) — structurally different
evaluation, identical numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orca_spark.operators.graph import _THR_DEN, _THR_NUM
from orca_spark.registry import register
from orca_spark.tables import load

_KEY_SHIFT = 1 << 40  # degree-major sortable key: deg * 2^40 + doc_id


def _rep_triangles_weighted(rep_edges: DataFrame, weights: DataFrame) -> DataFrame:
    """sum of w_a*w_b*w_c over triangles of the contracted graph, via
    degree-ordered orientation (each triangle counted exactly once)."""
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
        .select(
            "doc_a",
            "doc_b",
            (F.col("da") * _KEY_SHIFT + F.col("doc_a")).alias("ka"),
            (F.col("db") * _KEY_SHIFT + F.col("doc_b")).alias("kb"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("doc_b"))
        .otherwise(F.col("doc_a"))
        .alias("dst"),
        F.greatest("ka", "kb").alias("dk"),
    ).localCheckpoint(eager=False)
    wedge = (
        oriented.alias("x")
        .join(oriented.alias("y"), F.col("x.src") == F.col("y.src"))
        .where(F.col("x.dk") < F.col("y.dk"))
        .select(
            F.col("x.src").alias("u"),
            F.col("x.dst").alias("v"),
            F.col("y.dst").alias("w_"),
        )
    )
    tri = wedge.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w_")),
        ["v", "w_"],
    )
    wu = weights.select(F.col("rep").alias("u"), F.col("w").alias("wu"))
    wv = weights.select(F.col("rep").alias("v"), F.col("w").alias("wv"))
    ww = weights.select(F.col("rep").alias("w_"), F.col("w").alias("ww"))
    return (
        tri.join(wu, "u")
        .join(wv, "v")
        .join(ww, "w_")
        .agg(
            F.coalesce(
                F.sum(F.col("wu") * F.col("wv") * F.col("ww")), F.lit(0)
            ).alias("tri_rep")
        )
    )


@register(
    "graph_triangle_census",
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
            UNION ALL SELECT doc_b AS doc_id FROM kept
        ),
        deg AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS d
            FROM incident GROUP BY doc_id
        ),
        tri AS (
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM kept e1
            JOIN kept e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
            JOIN kept e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
        ),
        nodes AS (
            SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS wedges
            FROM deg
        ),
        ecnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM kept)
        SELECT n_nodes, n_edges, n_triangles, wedges,
               round(3.0 * n_triangles / nullif(wedges, 0), 4) AS clustering
        FROM nodes, tri, ecnt
    """,
    description="triangle census of the exact-Jaccard >= 9/10 near-dup "
    "graph: node/edge/triangle/wedge counts and the global clustering "
    "coefficient (3*triangles/wedges, exact-integer ratio rounded at "
    "the surface) — near-1 clustering certifies duplicate families as "
    "cliques (transitive dedup is safe), low clustering flags chained "
    "borderline pairs; identical-set families CONTRACT to weighted "
    "representatives first (totals become closed-form combinatorics "
    "over the contracted graph, so a 200-copy family costs one node, "
    "not C(200,3) join rows), rep triangles via degree-ordered "
    "orientation, rep candidates from the adaptive generator — never "
    "all-pairs",
)
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from orca_spark.operators.dedup import _rep_pairs_adaptive

    docs = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    sets = docs.select(
        "doc_id",
        F.sort_array(
            F.array_distinct(
                F.transform(F.split("text", " "), lambda t: F.xxhash64(t))
            )
        ).alias("ts"),
    ).withColumn("set_key", F.xxhash64("ts"))
    groups = (
        sets.groupBy("set_key")
        .agg(
            F.min("doc_id").alias("rep"),
            F.count(F.lit(1)).alias("w"),
            F.min_by("ts", "doc_id").alias("ts"),
        )
        .localCheckpoint(eager=True)  # reused: candidates, weights, degrees
    )
    weights = groups.select("rep", "w")
    rep_edges = (
        _rep_pairs_adaptive(groups.select(F.col("rep").alias("doc_id"), "ts"), threshold=0.9)
        .localCheckpoint(eager=False)
    )

    # neighbor weight mass per group: W_g = sum of w over rep-neighbors
    halves = rep_edges.select(
        F.col("doc_a").alias("rep"), F.col("doc_b").alias("nbr")
    ).unionAll(
        rep_edges.select(F.col("doc_b").alias("rep"), F.col("doc_a").alias("nbr"))
    )
    nbr_mass = (
        halves.join(
            weights.select(F.col("rep").alias("nbr"), F.col("w").alias("wn")),
            "nbr",
        )
        .groupBy("rep")
        .agg(F.sum("wn").alias("nw"))
    )
    per_group = (
        weights.join(nbr_mass, "rep", "left")
        .withColumn("nw", F.coalesce("nw", F.lit(0).cast("long")))
        .withColumn("degg", F.col("w") - 1 + F.col("nw"))
    )
    base = per_group.agg(
        F.coalesce(
            F.sum(F.when(F.col("degg") > 0, F.col("w"))), F.lit(0)
        ).alias("n_nodes"),
        F.coalesce(
            F.sum(F.expr("w * (w - 1) div 2")), F.lit(0)
        ).alias("e_internal"),
        F.coalesce(
            F.sum(F.expr("w * (w - 1) * (w - 2) div 6")), F.lit(0)
        ).alias("tri_internal"),
        F.coalesce(
            F.sum(F.expr("w * (degg * (degg - 1) div 2)")), F.lit(0)
        ).alias("wedges"),
    )
    ew = rep_edges.join(
        weights.select(F.col("rep").alias("doc_a"), F.col("w").alias("wa")),
        "doc_a",
    ).join(
        weights.select(F.col("rep").alias("doc_b"), F.col("w").alias("wb")),
        "doc_b",
    )
    cross = ew.agg(
        F.coalesce(F.sum(F.col("wa") * F.col("wb")), F.lit(0)).alias("e_cross"),
        F.coalesce(
            F.sum(
                F.expr("(wa * (wa - 1) div 2) * wb + wa * (wb * (wb - 1) div 2)")
            ),
            F.lit(0),
        ).alias("tri_edge"),
    )
    tri_rep = _rep_triangles_weighted(rep_edges, weights)
    return (
        base.crossJoin(F.broadcast(cross))
        .crossJoin(F.broadcast(tri_rep))
        .select(
            "n_nodes",
            (F.col("e_internal") + F.col("e_cross")).alias("n_edges"),
            (F.col("tri_internal") + F.col("tri_edge") + F.col("tri_rep")).alias(
                "n_triangles"
            ),
            "wedges",
            F.round(
                F.lit(3.0)
                * (F.col("tri_internal") + F.col("tri_edge") + F.col("tri_rep"))
                / F.expr("nullif(wedges, 0)"),
                4,
            ).alias("clustering"),
        )
    )
