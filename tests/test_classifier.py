"""Trained quality classifier (q178): the hashed-bigram batch perceptron.

Three contracts:
  1. The distributed trainer is bit-identical to a pure-Python reference
     perceptron over the same features (the q159 differential discipline).
  2. On a PLANTED linearly separable corpus — clean docs with diverse
     bigrams vs junk docs that are one token stuttered — the trained model
     actually separates (accuracy >= 0.9), so the green gate row proves a
     working classifier, not just matching arithmetic.
  3. Training is partitioning-invariant: integer gradients commute, so a
     repartitioned feature relation trains the identical weight vector.
"""
from __future__ import annotations

import pyspark.sql.functions as F

from flink_adcom_spark.queries.text import (
    CLF_BUCKETS,
    CLF_ROUNDS,
    clf_features_and_labels,
    perceptron_train,
    q178_quality_classifier,
)


def _planted_docs(spark):
    """60 docs: even ids are 'good' (diverse word sequences — distinct ratio
    1.0 -> label +1), odd ids are 'junk' (one word stuttered 40x — distinct
    ratio ~0 -> label -1). Bigram features separate them linearly: junk mass
    concentrates on self-bigrams of a handful of words."""
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    rows = []
    for i in range(60):
        if i % 2 == 0:
            # diverse: rotate through the vocab, no repeated adjacent pair
            words = [vocab[(i + j) % len(vocab)] for j in range(12)]
        else:
            words = [vocab[i % len(vocab)]] * 40
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _python_perceptron(feat_rows, rounds=CLF_ROUNDS):
    """Reference implementation: same features, same integer fold."""
    docs: dict[int, list[tuple[int, int]]] = {}
    label: dict[int, int] = {}
    for doc_id, bucket, cnt, y in feat_rows:
        docs.setdefault(doc_id, []).append((bucket, cnt))
        label[doc_id] = y
    w = [0] * (CLF_BUCKETS + 1)
    for _ in range(rounds):
        grad = [0] * (CLF_BUCKETS + 1)
        for d, feats in docs.items():
            margin = sum(cnt * w[b] for b, cnt in feats)
            if label[d] * margin <= 0:
                for b, cnt in feats:
                    grad[b] += label[d] * cnt
        w = [a + g for a, g in zip(w, grad)]
    return w


def test_perceptron_matches_python_reference(spark, sf_dir):
    from flink_adcom_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fl = clf_features_and_labels(docs)
    rows = [
        (int(r["doc_id"]), int(r["bucket"]), int(r["cnt"]), int(r["y"]))
        for r in fl.collect()
    ]
    assert perceptron_train(fl) == _python_perceptron(rows)


def test_classifier_separates_planted_corpus(spark):
    docs = _planted_docs(spark)
    fl = clf_features_and_labels(docs)
    w = perceptron_train(fl)
    assert any(v != 0 for v in w), "trained weights are all zero"
    # score every doc with the final weights, exactly as q178 does
    w_arr = F.array(*[F.lit(int(v)) for v in w])
    scored = (
        fl.groupBy("doc_id")
        .agg(
            F.min("y").alias("label"),
            F.sum(F.col("cnt") * F.element_at(w_arr, F.col("bucket") + 1)).alias("score"),
        )
        .collect()
    )
    # the labels really are the planted classes (sanity on the weak-label rule)
    for r in scored:
        assert r["label"] == (1 if r["doc_id"] % 2 == 0 else -1)
    acc = sum(1 for r in scored if r["label"] * r["score"] > 0) / len(scored)
    assert acc >= 0.9, f"planted separable corpus not separated: acc={acc}"


def test_training_is_partitioning_invariant(spark, sf_dir):
    from flink_adcom_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fl = clf_features_and_labels(docs)
    w1 = perceptron_train(fl.repartition(1))
    w17 = perceptron_train(fl.repartition(17, "bucket"))
    assert w1 == w17


def test_q178_output_contract(spark, sf_dir):
    out = q178_quality_classifier(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == ["doc_id", "label", "score", "correct"]
    rows = out.collect()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(rows) == n_docs  # every doc scored, even token-poor ones
    assert {r["label"] for r in rows} <= {1, -1}
    # the model must beat label-marginal guessing on its own training set
    # (weak labels, hashed features — but 50% means it learned nothing)
    acc = sum(1 for r in rows if r["correct"]) / len(rows)
    assert acc > 0.55, acc
