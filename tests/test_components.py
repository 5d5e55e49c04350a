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
