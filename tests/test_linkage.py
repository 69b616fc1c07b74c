"""Edit-distance near-dup verification: blocking losslessness and
threshold semantics on planted pairs (the properties the SQL oracle
can't isolate — it would agree even if both sides shared a lossy
blocking scheme)."""

from pyspark.sql import functions as F

from orca_spark.operators.linkage import _MAX_EDITS, edit_distance_pairs


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, n_chars long",
    )


def _pairs(df):
    return {(r.doc_a, r.doc_b): r.edit_distance for r in df.collect()}


def test_boundary_straddling_pair_is_found(spark):
    """A pair whose lengths fall in ADJACENT buckets (and a pair in the
    same bucket at maximal length delta) must still meet: the 3-bucket
    probe makes blocking lossless for distance <= T."""
    t = _MAX_EDITS
    base = "x" * (t * 3 - 1)  # length 59: bucket 2; +2 chars -> bucket 3
    rows = [
        (base, "en"),                    # doc 0, len 59 (bucket 2)
        (base + "yy", "en"),             # doc 1, len 61 (bucket 3), dist 2
        ("z" * t * 3, "en"),             # doc 2, len 60 (bucket 3), far in content
    ]
    got = _pairs(edit_distance_pairs(_docs(spark, rows)))
    assert got[(0, 1)] == 2
    # same-bucket far-content pair is refuted by the verify, not the block
    assert (1, 2) not in got and (0, 2) not in got


def test_threshold_is_strict_and_cross_lang_blocked(spark):
    """dist == T passes, dist == T+1 does not (even though the length
    prune admits it); equal texts in different langs never pair (lang
    is a hard blocking key)."""
    t = _MAX_EDITS
    a = "a" * 100
    rows = [
        (a, "en"),                  # doc 0
        (a[:-t] + "b" * t, "en"),   # doc 1: exactly t substitutions
        (a[: -(t + 1)] + "b" * (t + 1), "en"),  # doc 2: t+1 substitutions
        (a, "fr"),                  # doc 3: identical text, other lang
    ]
    got = _pairs(edit_distance_pairs(_docs(spark, rows)))
    assert got[(0, 1)] == t
    assert (0, 2) not in got
    assert (0, 3) not in got


def test_exactly_once_emission(spark):
    """The 3-bucket explode must not double-emit a pair (each pair meets
    only in the probe side's own bucket)."""
    rows = [("hello world", "en"), ("hello worle", "en")]
    df = edit_distance_pairs(_docs(spark, rows))
    assert df.count() == df.distinct().count() == 1


def test_null_text_excluded(spark):
    df = spark.createDataFrame(
        [(0, None, "en", 5), (1, "abcde", "en", 5), (2, "abcdf", "en", 5)],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = _pairs(edit_distance_pairs(df))
    assert got == {(1, 2): 1}


def test_hot_block_salting_preserves_pair_set(spark):
    """Blocks above ``block_cap`` are split across salt slices (probe
    picks one deterministic slice, build replicates to all) — the pair
    set and distances must be IDENTICAL to the unsalted form, and the
    salted plan must carry the salt in the probe repartition key. A
    tiny cap forces nsalt > 1 on a clique the default cap never splits
    (the r12 verdict's 100 TB hot-length-bucket skew item)."""
    # 30 same-lang docs of equal length -> one block of 30 rows; with
    # cap=8 the block salts 4 ways (ceil(30/8)); planted near pairs at
    # several distances plus far pairs refuted by the verify
    rows = []
    base = "m" * 100
    for i in range(30):
        # each doc differs from base by i substitutions: pair (i, j)
        # has distance |i - j| <= 20 iff within threshold
        rows.append((("n" * i) + base[i:], "en"))
    docs = _docs(spark, rows)
    unsalted = _pairs(edit_distance_pairs(docs, block_cap=10**9))
    salted = _pairs(edit_distance_pairs(docs, block_cap=8))
    assert salted == unsalted and len(salted) > 0
    # plan witness: the probe-side exchange hashes (lang, bucket, salt)
    plan = edit_distance_pairs(docs, block_cap=8)._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan


def test_unicode_distance_is_code_point_based(spark):
    """The engine operator counts CODE POINTS (Spark semantics): an
    accent substitution is distance 1 even though it is a multi-byte
    edit. (The registered oracle query restricts to single-byte text
    because DuckDB's levenshtein counts bytes — this pins the general
    operator's unicode behavior locally.)"""
    rows = [("héllo wörld", "xx"), ("hallo wörld", "xx")]
    got = _pairs(edit_distance_pairs(_docs(spark, rows)))
    assert got == {(0, 1): 1}
