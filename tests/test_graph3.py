"""Behavioral pins for the node-level graph analytics (graph3.py) on
planted graphs where the expected answer is computable by hand — the
oracle suite covers cross-engine agreement; these pin the SEMANTICS,
in particular that the exact-set contraction lifts back to the same
per-document numbers a doc-level computation would give."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from orca_spark.queries import queries

_T = [f"t{i}" for i in range(1, 20)]  # t1..t19


def _write_docs(d, rows):
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["s0"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_clustering_coefficient_lifts_contraction_to_doc_level(spark, tmp_path):
    # group A = docs 1,2 (identical 10-token sets, w=2); doc 3 drops one
    # token (Jaccard 9/10, adjacent to A). Doc-level graph = triangle
    # {1,2,3}: every doc has degree 2, one triangle, cc = 1.
    ten = " ".join(f"t{i}" for i in range(1, 11))
    nine = " ".join(f"t{i}" for i in range(1, 10))
    d = _write_docs(tmp_path, [(1, ten), (2, ten), (3, nine)])
    got = {
        r.doc_id: (r.degree, r.triangles, r.cc)
        for r in queries()["graph_clustering_coefficient"](spark, d).collect()
    }
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_kcore_keeps_dense_family_and_peels_isolated_pair(spark, tmp_path):
    # docs 1-5 identical (a 5-clique via contraction), doc 6 = 9/10
    # subset adjacent to all five -> 6-clique-ish core, every degree 5;
    # docs 7,8 an isolated identical pair (degree 1 each) -> peeled.
    ten = " ".join(f"t{i}" for i in range(1, 11))
    nine = " ".join(f"t{i}" for i in range(1, 10))
    other = " ".join(f"p{i}" for i in range(1, 11))
    rows = [(i, ten) for i in (1, 2, 3, 4, 5)] + [(6, nine), (7, other), (8, other)]
    d = _write_docs(tmp_path, rows)
    got = {
        r.doc_id: r.core_degree
        for r in queries()["graph_kcore"](spark, d).collect()
    }
    assert got == {i: 5 for i in (1, 2, 3, 4, 5, 6)}


def test_link_prediction_suggests_nonadjacent_pair_with_shared_neighbor(
    spark, tmp_path
):
    # B = t1..t19; A = B + {x} (J(A,B)=19/20); C = B + {y1,y2}
    # (J(B,C)=19/21 >= 0.9) but J(A,C)=19/22 < 0.9 -> A,C non-adjacent
    # with exactly one common neighbor B; both have degree 1 -> score 1.
    base = " ".join(_T)
    d = _write_docs(
        tmp_path,
        [(1, base + " x"), (2, base), (3, base + " y1 y2")],
    )
    got = [
        (r.doc_a, r.doc_b, r.common_nbrs, r.score)
        for r in queries()["graph_link_prediction_jaccard"](spark, d).collect()
    ]
    assert got == [(1, 3, 1, 1.0)]
