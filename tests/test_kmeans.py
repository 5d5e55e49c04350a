"""Differential test: distributed Lloyd k-means vs a numpy reference.

Same deterministic init (k lowest vec_ids), same iteration count -> identical
assignments. float64 drift between Spark's and numpy's summation order only
matters if a point is near-equidistant to two centroids; asserted not to occur
on the synthetic embeddings (and the assignment comparison would catch it).
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_adcom_spark.operators.kmeans import lloyd_kmeans
from flink_adcom_spark.tables import load_table

from pyspark.sql import functions as F

K, ITERS = 4, 3


def _numpy_kmeans(ids, X, k, iters):
    order = np.argsort(ids, kind="stable")
    ids, X = ids[order], X[order]
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                C[j] = X[a == j].mean(axis=0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return dict(zip(ids.tolist(), d.argmin(axis=1).tolist())), d


def test_kmeans_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    assigned, centroids = lloyd_kmeans(e, "v", "vec_id", k=K, iters=ITERS)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    pdf = e.toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.array([np.array(v, dtype=np.float64) for v in pdf["v"]])
    want, d = _numpy_kmeans(ids, X, K, ITERS)

    # no near-ties: the argmin margin is far above fp drift
    s = np.sort(d, axis=1)
    assert (s[:, 1] - s[:, 0]).min() > 1e-9

    assert got == want
    assert len(centroids) == K and all(len(c) == X.shape[1] for c in centroids)


def test_kmeans_assignment_is_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a1, _ = lloyd_kmeans(e, "v", "vec_id", k=K, iters=1)
    a2, _ = lloyd_kmeans(e.repartition(7), "v", "vec_id", k=K, iters=1)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_diversity_sample_caps_per_cluster(spark, sf_dir):
    from flink_adcom_spark.queries.similarity import (
        DIVERSITY_PER_CLUSTER,
        q58_diversity_sample,
    )

    s = q58_diversity_sample(spark, sf_dir)
    per = s.groupBy("cluster").count().collect()
    assert per and all(r["count"] <= DIVERSITY_PER_CLUSTER for r in per)


def test_assign_clusters_ranked_matches_numpy(spark):
    """cluster/cluster2 from the scan-side position-masked argmin must equal
    numpy's argsort of squared distances (ties -> lower index)."""
    import numpy as np

    from flink_adcom_spark.operators.kmeans import assign_clusters_ranked

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(40, 6)).round(3)
    cents = rng.normal(size=(5, 6)).round(3).tolist()
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, v array<double>",
    )
    got = {
        r["id"]: (r["cluster"], r["cluster2"])
        for r in assign_clusters_ranked(df, "v", cents).collect()
    }
    d = ((pts[:, None, :] - np.array(cents)[None, :, :]) ** 2).sum(axis=2)
    for i in range(len(pts)):
        order = np.lexsort((np.arange(len(cents)), d[i]))  # dist, then index
        assert got[i] == (order[0], order[1]), i


def test_assign_clusters_ranked_tie_breaks_to_lower_index(spark):
    """Two identical centroids: rank-1 must be the LOWER index and rank-2
    the duplicate (masking by POSITION, not by value)."""
    from flink_adcom_spark.operators.kmeans import assign_clusters_ranked

    df = spark.createDataFrame([(0, [1.0, 1.0])], "id long, v array<double>")
    cents = [[5.0, 5.0], [1.0, 1.0], [1.0, 1.0]]
    row = assign_clusters_ranked(df, "v", cents).collect()[0]
    assert (row["cluster"], row["cluster2"]) == (1, 2)
