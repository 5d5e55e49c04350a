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


def test_derive_kmeans_k_law():
    from flink_adcom_spark.queries.similarity import (
        KMEANS_K,
        derive_kmeans_k,
    )

    assert derive_kmeans_k(0) == KMEANS_K
    assert derive_kmeans_k(500) == KMEANS_K      # gate sf0.01 scale
    assert derive_kmeans_k(2000) == KMEANS_K     # sf0.1 scale
    assert derive_kmeans_k(6000) == 10           # the two-k fixture below
    assert derive_kmeans_k(4096 * 64) == 64      # exact dyadic boundary
    assert derive_kmeans_k(10**9) == 3953
    ks = [derive_kmeans_k(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert ks == sorted(ks)  # corpus growth never shrinks k


def test_derived_k_matches_oracle_at_large_n(spark, tmp_path_factory):
    """Two-k oracle check (the q51 two-width pattern): a 6000-vector fixture
    (sf0.1 embeddings replayed 3x under distinct ids) derives k = 10 > the
    floor 8, so the dynamically-derived k is exercised END-TO-END on both
    engines — Spark computes it in python (derive_kmeans_k) while the oracle
    computes it inside the LIMIT scalar subquery (_k_sql)."""
    import duckdb

    from flink_adcom_spark.queries.similarity import derive_kmeans_k
    from flink_adcom_spark.registry import get

    src = "/root/testdata/sf0.1/embeddings.parquet"
    dst = tmp_path_factory.mktemp("bign_emb")
    con = duckdb.connect()
    con.sql(
        f"""COPY (
          SELECT vec_id, embedding, label FROM '{src}'
          UNION ALL SELECT vec_id + 10000, embedding, label FROM '{src}'
          UNION ALL SELECT vec_id + 20000, embedding, label FROM '{src}'
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    assert derive_kmeans_k(6000) == 10

    spec = get("q57_kmeans")
    sdf = spec.build(spark, str(dst))
    got = {(r["vec_id"], r["cluster"]) for r in sdf.collect()}
    assert len({c for _, c in got}) == 10  # all 10 derived clusters used

    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{dst}/embeddings.parquet'")
    want = set(map(tuple, con.sql(spec.oracle).fetchall()))
    con.close()
    assert got == want
