"""Semantic tests for the round-6 additions: per-source caps (q149),
co-visitation PageRank (q150), communities (q151), weighted sampling (q152).
Oracle parity is covered by tests/test_oracle_parity.py; these pin the
properties the oracle comparison cannot see (probabilistic bounds,
graph-theoretic invariants, cap semantics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_adcom_spark.queries.events import (
    COMMUNITY_MIN_SHARED,
    q140_covisitation_pairs,
)
from flink_adcom_spark.queries.text import SOURCE_CAP
from flink_adcom_spark.registry import get
from flink_adcom_spark.tables import load_table


def test_source_caps_keep_longest_per_source(spark, sf_dir):
    out = get("q149_source_caps").build(spark, sf_dir)
    rows = out.collect()
    docs = load_table(spark, sf_dir, "documents")
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}

    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    # cap semantics: exactly min(cap, |source|) rows per source
    for src, n in sizes.items():
        assert len(by_source.get(src, [])) == min(SOURCE_CAP, n), src
    # the kept docs are the longest: every kept doc's n_chars >= the max
    # n_chars among that source's dropped docs (ties broken by doc_id are
    # covered by the oracle-parity hash match)
    kept_ids = {r["doc_id"] for r in rows}
    for src in sizes:
        dropped_max = (
            docs.filter((F.col("source") == src) & ~F.col("doc_id").isin(kept_ids))
            .agg(F.max("n_chars"))
            .collect()[0][0]
        )
        if dropped_max is None:
            continue
        kept_min = min(r["n_chars"] for r in by_source[src])
        assert kept_min >= dropped_max, src


def test_pagerank_is_a_distribution(spark, sf_dir):
    out = get("q150_covisit_pagerank").build(spark, sf_dir).collect()
    assert out, "graph is non-empty at every SF"
    ranks = [r["pagerank"] for r in out]
    assert all(r > 0 for r in ranks)
    # no dangling nodes (undirected graph) => total rank mass is conserved
    # by every iteration: sum = 0.15 + 0.85 * 1 = 1 (up to rounding)
    assert math.isclose(sum(ranks), 1.0, abs_tol=1e-3 * len(ranks))


def test_pagerank_favors_heavier_vertices(spark, sf_dir):
    """The max-degree-weight vertex must outrank the min one: PageRank with
    uniform jump and 3 iterations orders extremes by weighted degree."""
    edges = q140_covisitation_pairs(spark, sf_dir)
    sym = edges.selectExpr("u1 AS v", "shared_hours AS w").unionByName(
        edges.selectExpr("u2 AS v", "shared_hours AS w")
    )
    deg = {r["v"]: r["s"] for r in sym.groupBy("v").agg(F.sum("w").alias("s")).collect()}
    pr = {r["user_id"]: r["pagerank"] for r in get("q150_covisit_pagerank").build(spark, sf_dir).collect()}
    vmax = max(deg, key=lambda v: (deg[v], -v))
    vmin = min(deg, key=lambda v: (deg[v], v))
    if deg[vmax] > deg[vmin]:
        assert pr[vmax] > pr[vmin]


def test_communities_partition_the_strong_subgraph(spark, sf_dir):
    edges = (
        q140_covisitation_pairs(spark, sf_dir)
        .filter(F.col("shared_hours") >= COMMUNITY_MIN_SHARED)
        .collect()
    )
    comm = get("q151_covisit_communities").build(spark, sf_dir).collect()
    # community sizes cover every strong-tie vertex exactly once
    vertices = {e["u1"] for e in edges} | {e["u2"] for e in edges}
    assert sum(r["n_users"] for r in comm) == len(vertices)
    # community_id is the min member, and id ranges are consistent
    for r in comm:
        assert r["community_id"] == r["min_user"]
        assert r["min_user"] <= r["max_user"]


def test_weighted_sample_size_and_monotonicity(spark, sf_dir):
    out = get("q152_weighted_sample").build(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    k = 100  # WSAMPLE_K
    # expected size ~ K (Poisson sampling): allow 5 sigma of binomial noise
    sigma = math.sqrt(k)
    assert abs(len(out) - k) <= 5 * sigma + 1, len(out)
    # weight-proportionality: the kept set's mean weight exceeds the corpus
    # mean (longer docs are more likely in)
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    kept_mean = sum(r["wt"] for r in out) / max(1, len(out))
    assert kept_mean > corpus_mean
    assert n_docs >= len(out)
