"""IVF recall contract: probing more cells can only help. Recall is measured
against the exact brute-force top-k (q50) — the property that justifies
shipping IVF as the scale path."""

from __future__ import annotations

from flink_adcom_spark.registry import get


def _pairs(df):
    return {(r["q_id"], r["n_id"]) for r in df.collect()}


def test_ivf_nprobe2_recall_at_least_nprobe1(spark, sf_dir):
    exact = _pairs(get("q50_knn_bruteforce").build(spark, sf_dir))
    ivf1 = _pairs(get("q54_ivf_knn").build(spark, sf_dir))
    ivf2 = _pairs(get("q55_ivf_knn_nprobe2").build(spark, sf_dir))
    r1 = len(ivf1 & exact) / len(exact)
    r2 = len(ivf2 & exact) / len(exact)
    # monotone: more probes never lose neighbors. Absolute recall is modest
    # here because cells are the synthetic label column, not trained k-means
    # centroids (the centroid-update step is q52) — measured r2 ~ 0.3.
    assert 0 < r1 <= r2 <= 1, (r1, r2)
    assert r2 >= 0.2, r2
