"""connected_components contracts: multi-hop chains converge (diameter >
1 iteration), disjoint components stay separate, min-id canonical labels."""

from __future__ import annotations

import pytest

from flink_adcom_spark.operators.components import connected_components


def test_chain_triangle_and_pair(spark):
    # chain 1-2-3-4-5-6 (diameter 5), triangle 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {r["v"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1)


def test_simhash_banding_is_lossless(spark, sf_dir):
    """Pigeonhole guarantee: the chunk-band equi-join returns EXACTLY the
    all-pairs hamming<=3 set (4 chunks of a 32-bit signature ⇒ any pair
    within hamming 3 agrees on >=1 chunk)."""
    from pyspark.sql import functions as F
    from flink_adcom_spark.queries.dedup import q43_simhash, simhash_banded_pairs

    sig = q43_simhash(spark, sf_dir).localCheckpoint(eager=True)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_banded_pairs(sig).collect()
    }
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
    naive = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == naive
    assert len(banded) > 0  # corpus must actually exercise the join


def test_hot_band_cap_bounds_candidates(spark, tmp_path):
    """Boilerplate guard: a corpus with a 300-clone template must NOT produce
    300^2/2 minhash candidate pairs — the hot-band cap (MAX_BAND_BUCKET=200)
    drops the template's band buckets, while an under-cap 10-doc duplicate
    group still pairs up fully."""
    from flink_adcom_spark.queries.dedup import MAX_BAND_BUCKET, N_BANDS
    from flink_adcom_spark.registry import get

    template = "the quick brown fox jumps over the lazy dog again and again"
    small_dup = "completely different words compose this other duplicated passage here"
    rows = [(i, template, "en", "syn", len(template)) for i in range(300)]
    rows += [(1000 + i, small_dup, "en", "syn", len(small_dup)) for i in range(10)]
    rows += [(2000 + i, f"unique filler document number {i} with token{i} salt{i * 7}", "en", "syn", 40) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    pairs = get("q41_minhash_lsh_pairs").build(spark, str(tmp_path)).collect()
    clone_pairs = [r for r in pairs if r["doc_a"] < 1000 and r["doc_b"] < 1000]
    small_pairs = [r for r in pairs if 1000 <= r["doc_a"] < 2000 and 1000 <= r["doc_b"] < 2000]
    assert clone_pairs == [], f"hot band not capped: {len(clone_pairs)} clone pairs"
    assert len(small_pairs) == 10 * 9 // 2  # full clique, all bands agree
    assert all(r["n_bands"] == N_BANDS for r in small_pairs)
    assert len(pairs) <= MAX_BAND_BUCKET ** 2  # global bound sanity


def _random_edges(spark, n_vertices, n_edges, seed):
    import random

    rnd = random.Random(seed)
    rows = [
        (rnd.randrange(n_vertices), rnd.randrange(n_vertices)) for _ in range(n_edges)
    ]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_twophase_matches_label_propagation(spark):
    from flink_adcom_spark.operators.components import (
        connected_components,
        connected_components_twophase,
    )

    for seed in (7, 21):
        edges = _random_edges(spark, 200, 150, seed)
        want = {
            (r["v"], r["cluster_id"])
            for r in connected_components(edges).collect()
        }
        got = {
            (r["v"], r["cluster_id"])
            for r in connected_components_twophase(edges).collect()
        }
        assert got == want


def test_twophase_handles_high_diameter_path(spark):
    """A 600-vertex path has diameter 599: label propagation's 50-round cap
    explodes, star contraction finishes in O(log n) rounds."""
    import pytest

    from flink_adcom_spark.operators.components import (
        connected_components,
        connected_components_twophase,
    )

    n = 600
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    got = connected_components_twophase(path).collect()
    assert len(got) == n
    assert {r["cluster_id"] for r in got} == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path, max_iter=10)


def test_label_propagation_supports_string_vertex_ids(spark):
    """The convergence probe must be type-agnostic: the old SUM(label) probe
    returned NULL for string ids, which compared equal to the None sentinel
    and silently stopped after one propagation round (a 3-hop chain then got
    two cluster ids)."""
    from flink_adcom_spark.operators.components import (
        connected_components,
        connected_components_twophase,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    for fn in (connected_components, connected_components_twophase):
        got = {r["v"]: r["cluster_id"] for r in fn(edges).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}, fn.__name__
