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
