"""Aggregated query surface: importing this module populates the registry."""

from __future__ import annotations

from orca_spark.registry import REGISTRY, QuerySpec

# Importing the operator modules registers their queries. Registration
# order here is only a stable tiebreak: since r05 the driver-facing
# adapter (__spark_entry__.verification_order) re-orders the registry
# from the committed CORRECTNESS_r*.json evidence — never-driver-green
# queries first, then green ones oldest-round first — so the driver's
# fixed 50-slot verification prefix always lands on the queries that
# need it most, with no manual import rotation (the r02–r05 approach,
# which went stale whenever a module mixed verified and unverified
# queries). Invariants pinned by test_registry_contract.py::
# test_verification_prefix_self_rotates.
from orca_spark.operators import similarity2, similarity  # noqa: F401
from orca_spark.operators import text6  # noqa: F401  (new in r05: TF-IDF/BM25)
from orca_spark.operators import multimodal  # noqa: F401
from orca_spark.streaming import jobs, jobs3, jobs2, jobs4  # noqa: F401
from orca_spark.operators import (  # noqa: F401
    io_ops,
    io_ops2,
)

# New in r05 — never driver-verified, so they sit inside the 50-slot
# prefix ahead of the multi-round-green relational7/pandas/bucketing
# families (every member of which has a green r04 row).
from orca_spark.operators import (  # noqa: F401
    dedup3,
    clustering,
    sampling,
    text7,
    timeseries,
    similarity3,
)

from orca_spark.operators import (  # noqa: F401
    relational7,
    pandas_ops,
    bucketing,
)

# Registered past the full r05 prefix — driver verification lands next
# round; locally gated now (oracle / behavior tests).
# profile2: profile_lineitem_approx already has its r04 driver row, and
# the new sketch-union query is bounds-tested in test_approx.py — the
# least-harmed deferral when the prefix overflowed by one.
from orca_spark.operators import (  # noqa: F401
    profile2,
    retrieval,
    diffing,
    schema_ops,
    audit,
    linkage,
    events2,
    text8,
    langid,
    sketches,
)
from orca_spark.streaming import jobs5  # noqa: F401

# Long-verified tail (green rows in r01-r04, or no-oracle scale paths
# whose driver check is rows-only and whose real gate is the local
# recall/behavior suite).
from orca_spark.operators import (  # noqa: F401
    dedup,
    dedup2,
    text5,
    events,
    ranges,
    relational4,
    text4,
    text3,
    relational6,
    relational,
    relational2,
    relational3,
    relational5,
    scalars2,
    skew,
    text,
    text2,
    analytics,
    asof,
    profile,
)

# r05 batch 3: LM scoring / collocations, BPE merge training, near-dup
# graph analytics, truncated EWMA. Verification slots are scheduled by
# __spark_entry__.verification_order (never-green first), not by this
# import's position.
from orca_spark.operators import (  # noqa: F401
    text9,
    bpe,
    graph,
    timeseries2,
)

# r05 batch 4: phrase search, categorical association, weighted
# similarity, quantile feature scaling.
from orca_spark.operators import (  # noqa: F401
    text10,
    stats2,
    similarity4,
    embeddings2,
)

# r05 batch 5: sequence mining, rolling reach, robust dispersion, RFM.
from orca_spark.operators import (  # noqa: F401
    events3,
    relational8,
)

# r05 batch 6: the composed corpus pipeline + the streaming MERGE INTO.
from orca_spark.operators import pipeline  # noqa: F401
from orca_spark.streaming import jobs6  # noqa: F401

# r05 batch 7: MapType pipelines + observation-piggybacked metrics,
# asymmetric containment dedup.
from orca_spark.operators import scalars3, containment, affinity, ivm  # noqa: F401
from orca_spark.operators import cohorts2, whitening  # noqa: F401

# r06 batch 1: duplicate-span coverage, per-source percentile quality
# gate, pair-free corpus diversity, fixed-point PageRank.
from orca_spark.operators import text11, embeddings3  # noqa: F401

# r06 batch 2: BPE train->apply token accounting, water-filling
# training-mix planner.
from orca_spark.operators import bpe2, mixture  # noqa: F401

# r07 batch 1: the three modules written in r06 but left unwired
# (VERDICT r06 item #1) — session path mining, k-anonymity audit,
# Gini token concentration.
from orca_spark.operators import paths, privacy, stats3  # noqa: F401

# r07 batch 2: training-input layout (sequence packing + context
# chunking), integer-exact burst detection, triangle census.
from orca_spark.operators import packing, events4, graph2  # noqa: F401

# r07 batch 3: count-preserving dedup, source KL drift, embedding
# outliers, watermark-evictable streaming dedup.
from orca_spark.operators import dedup4, text12, embeddings4  # noqa: F401
from orca_spark.streaming import jobs7  # noqa: F401

# r07 batch 4: l-diversity audit, ordered funnel, Zipf fit.
from orca_spark.operators import privacy2, events5, text13  # noqa: F401

# r07 batch 5: Matryoshka truncation fidelity, cross-source n-gram
# novelty, real resize kernel on the multimodal Arrow path, language-ID
# confusion matrix.
from orca_spark.operators import embeddings5, text14, multimodal2  # noqa: F401
from orca_spark.operators import langid2  # noqa: F401

# r07 batch 6: exact rank-based median, gaps-and-islands streaks,
# hashing-trick featurizer, composed chunk-dedup RAG index.
from orca_spark.operators import relational9, text15, pipeline2  # noqa: F401

# r07 batch 7: custom Python DataSource (Spark 4 API) round-trip,
# sliding-window streaming aggregation.
from orca_spark.sources import jsonl  # noqa: F401
from orca_spark.streaming import jobs8  # noqa: F401

# r07 batch 8: node-level near-dup graph analytics (local clustering
# coefficient, fixed-round k-core, common-neighbor link prediction).
from orca_spark.operators import graph3  # noqa: F401

# r07 batch 9: time-series diagnostics (hourly ACF, weekly seasonality
# index, user lifecycle), corpus-health lexical stats (hapax/TTR,
# source JSD, per-source dup rate, sentence shapes), and the
# adjacent-pair cosine histogram over embeddings.
from orca_spark.operators import embeddings6, events6, text16  # noqa: F401

# r07 batch 10: business-calendar analytics (YoY growth, SLA breach),
# budget-constrained curation manifest, and the Python-DataSource
# WRITE path (two-phase-commit JSONL sink, registered in sources.jsonl).
from orca_spark.operators import packing2, relational10  # noqa: F401

# r07 batch 11: t-closeness (completing the k/l/t governance trio),
# n-gram entropy rate, shared-prefix boilerplate manifest.
from orca_spark.operators import privacy3, text17  # noqa: F401

# r07 batch 12: structured-data fuzzy dup detection (double-charge
# pairs) and rule-based bot scoring.
from orca_spark.operators import events7, relational11  # noqa: F401

# r07 batch 13: linear multi-touch attribution and the Flesch-style
# readability proxy.
from orca_spark.operators import events8  # noqa: F401

# r07 batch 14: Spark-4 engine surfaces — VARIANT property bags,
# DataFrame.lateralJoin, and the pure-SQL (spark.sql) entry.
from orca_spark.operators import spark4  # noqa: F401

# r07 batch 15: classical seasonal decomposition and the cross-series
# hourly correlation map.
from orca_spark.operators import timeseries3  # noqa: F401

# r07 batch 16: the partitioned Python STREAMING source (jsonl shards
# replayed by offset) and the mapInArrow zero-copy digest path.
from orca_spark.operators import multimodal3  # noqa: F401
from orca_spark.streaming import jobs9  # noqa: F401

# r07 batch 17: built-in batch session_window, join-strategy hints,
# and the try_* ANSI-safe arithmetic surface.
from orca_spark.operators import events9, relational12  # noqa: F401

# r07 batch 18: supplier-concentration HHI and the composed per-source
# dedup funnel (raw -> exact survivors -> near-dup survivors).
from orca_spark.operators import analytics2  # noqa: F401

# r07 batch 19: Welch A/B statistic, cross-lingual exact contamination,
# and the code-vs-prose router.
from orca_spark.operators import stats4  # noqa: F401

# r07 batch 20: growth accounting (new vs returning), hourly gap
# interpolation, and boilerplate-strip accounting.
from orca_spark.operators import events10, text18  # noqa: F401

# r07 batch 21: monthly return-rate series and the SRE SLO burn rate.
from orca_spark.operators import analytics3  # noqa: F401

# r07 batch 22: month-over-month priority-mix drift (TV distance) and
# the exact median inter-order gap per nation.
from orca_spark.operators import analytics4  # noqa: F401

# r08 batch 1: the full composed RAG corpus build (chunk -> dedup ->
# embed-join -> per-language budget pack), r07 verdict item 8.
from orca_spark.operators import pipeline3  # noqa: F401

# r08 batch 2: the rest of the transformWithStateInPandas state family
# (ListState last-K buffer, MapState sub-keyed counts) — unlocked by
# the vendored protobuf runtime (orca_spark/vendor.py).
from orca_spark.streaming import jobs10  # noqa: F401

# r08 batch 3: CUSUM change-point localization, the published Gopher
# quality-rule scorecard + zlib compression-ratio signal, and the
# per-dimension embedding distribution monitor.
from orca_spark.operators import embeddings7, events11, text19  # noqa: F401

# r08 batch 4: WITH RECURSIVE (Spark 4 recursive CTE), interval x
# interval overlap join, the running-COUNT(DISTINCT) rewrite, and
# integer-exact sqrt temperature mixing weights.
from orca_spark.operators import mixture2, recursive, relational13  # noqa: F401

# r08 batch 5: null-safe joins + named-parameter SQL, the Benford
# fabricated-amounts screen, and DCT perceptual-hash image near-dup.
from orca_spark.operators import analytics5, multimodal4, relational14  # noqa: F401

# r08 batch 6: dynamic-gap session windows (per-event timeouts).
from orca_spark.operators import events12  # noqa: F401

# r08 batch 7: TWS event-time timers (emit-on-quiet flush) — completes
# the transformWithStateInPandas facility coverage.
from orca_spark.streaming import jobs11  # noqa: F401

# r08 batch 8: paper-backed curation trio — DSIR importance weights,
# CCNet perplexity terciles, inverted-index postings summary.
from orca_spark.operators import curation2  # noqa: F401

# r08 batch 9: TPC-H q2 completion lives in relational7; robust stats
# (Theil-Sen trend, Kaplan-Meier survival) and the C4 cleaning rules.
from orca_spark.operators import robust  # noqa: F401
from orca_spark.operators import text20  # noqa: F401

# r08 batch 10: audio/video modality kernels, chi-square contingency
# audit, boundary-overlap dedup.
from orca_spark.operators import multimodal5  # noqa: F401
from orca_spark.operators import analytics6  # noqa: F401

# r09: three registrations only, so the driver prefix spends its
# remaining 47 slots re-verifying the r01-r02-vintage cohort (r08
# verdict item 1): the composed end-to-end curation pipeline (gate ->
# dedup -> DSIR -> mix weights -> pack), the CCNet tail-drop mix
# schedule, and exact largest-remainder token-budget apportionment.
from orca_spark.operators import pipeline4  # noqa: F401
from orca_spark.operators import mixture3  # noqa: F401

# r10: two registrations (r09 verdict item 8), so the prefix's other 48
# slots retire the r03 cohort and start on r04: the incremental (IVM)
# curation-manifest delta against frozen history artifacts, and the
# streaming ingest -> gate -> exact-dedup TWS job.
from orca_spark.operators import pipeline5  # noqa: F401
from orca_spark.streaming import jobs12  # noqa: F401

# r10 batch 2: oracled real-container roundtrips — the WAV and Y4M
# decoders synthesize genuine containers from doc_id and the oracle
# states the closed-form expected features, converting the multimodal
# family's weakest (rows-only) driver evidence to hash-checked rows.
from orca_spark.operators import multimodal6  # noqa: F401

# r11: the image modality goes end-to-end real — genuine PPM containers
# through decode → grayscale → resample → DCT phash with a full SQL
# re-derivation oracle, plus the persisted-phash-index probe the hash's
# bit-stability was built for (also fully oracled: determinism makes
# even banded ANN recall SQL-replicable).
from orca_spark.operators import multimodal7  # noqa: F401

# r11 batch 2: ingest → curation as one continuous contract — the
# streaming twin of the incremental manifest, sharing pipeline5's
# scorer/finalizer and its oracle verbatim (must import after pipeline5
# so the oracle reuse sees the registered spec).
from orca_spark.streaming import jobs13  # noqa: F401

# r11 batch 3: the paper-exact ExactSubstr form (within-doc repeats +
# keep-one canonical copy — closes the r10 advisor's parity note as a
# registered operator, not a docstring caveat) and the int8
# scalar-quantized ANN path — the first compressed-domain similarity
# query with a full value oracle (integer dots are summation-order
# exact, unlike the float paths that keep PQ/LSH/IVF rows-only).
from orca_spark.operators import similarity5, text21  # noqa: F401

# r12: the two policy compositions (r11 verdict item 8) — the
# multimodal corpus build (gate -> text dedup -> phash near-dup drop ->
# manifest, every stage through its production kernel) and the
# two-granularity benchmark decontamination (doc drop + cross-corpus
# span scrub in one pass), both fully value-oracled.
from orca_spark.operators import pipeline6  # noqa: F401


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def describe() -> dict[str, str]:
    return {name: spec.description for name, spec in REGISTRY.items()}
