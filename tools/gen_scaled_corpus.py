#!/usr/bin/env python
"""Deterministic large-SF TIMING corpus, derived from the read-only
driver testdata (TESTDATA.md forbids regenerating /root/testdata, so
the scale-up lives under /tmp and is rebuilt on demand).

Motivation (r12 verdict item 8): at sf0.1 the bench is per-job
fixed-overhead-bound — the whole suite runs FASTER at 8 cores than at
32 — so sf0.1 deltas can no longer resolve scale claims for the
loop-shaped queries (connected components, label propagation, kmeans,
edit distance, langid, minhash). This generator scales sf0.1 by an
integer factor so an 8-vs-32-core pair at the larger SF can.

Construction (copy c in 0..k-1, copy 0 = the original rows verbatim):

* documents: doc_id' = doc_id + c * 10_000_000; for c > 0 every token
  is prefixed with the copy tag ``c<c>_`` — a bijective per-copy token
  rename, so each copy carries EXACTLY the original corpus's dup/near-
  dup family structure internally while cross-copy token overlap (and
  therefore cross-copy Jaccard/shingle/simhash similarity) is zero:
  components and candidate-pair counts scale linearly with k instead
  of quadratically. n_chars is recomputed from the rewritten text.
  Length-bucketed blocking (edit distance) still sees k-fold block
  growth — deliberately, that is the skew surface the lane probes.
* embeddings: vec_id' = vec_id + c * 10_000_000; the first component
  is shifted by c * 1e-3 (deterministic, keeps the cluster geometry).

Usage: python tools/gen_scaled_corpus.py [k] [out_dir]
Defaults: k=10 (an sf1-equivalent document count), out=/tmp/sfbig.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    parts = []
    for c in range(k):
        if c == 0:
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'"
            )
        else:
            parts.append(
                f"""SELECT doc_id + {c * OFFSET} AS doc_id,
                       CASE WHEN text IS NULL THEN NULL
                            ELSE array_to_string(
                                list_transform(string_split(text, ' '),
                                               t -> 'c{c}_' || t), ' ')
                       END AS text,
                       lang, source,
                       CASE WHEN text IS NULL THEN n_chars
                            ELSE length(array_to_string(
                                list_transform(string_split(text, ' '),
                                               t -> 'c{c}_' || t), ' '))
                       END AS n_chars
                FROM '{SRC}/documents.parquet'"""
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    eparts = []
    for c in range(k):
        if c == 0:
            eparts.append(f"SELECT * FROM '{SRC}/embeddings.parquet'")
        else:
            eparts.append(
                f"""SELECT vec_id + {c * OFFSET} AS vec_id,
                       list_prepend(embedding[1] + {c} * 0.001,
                                    embedding[2:]) AS embedding,
                       label
                FROM '{SRC}/embeddings.parquet'"""
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(eparts)}) TO '{out}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )
    n_d = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    n_e = con.execute(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"{out}: documents={n_d} embeddings={n_e} (k={k})")


if __name__ == "__main__":
    main()
