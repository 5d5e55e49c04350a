"""Semantic properties of the sampling/weighting operators (the oracle mirror
proves engine parity; these prove the operators do the RIGHT thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.queries.text import KEEP_BUDGET_DIV
from flink_adcom_spark.registry import get
from flink_adcom_spark.tables import load_table


def test_temperature_mixture_respects_budget_and_flattens(spark, sf_dir):
    kept = get("q132_temperature_mixture").build(spark, sf_dir)
    kept_by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    corpus = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # never keeps more than exists; every language survives
    assert set(kept_by_lang) == set(corpus)
    for lang, n in kept_by_lang.items():
        assert 0 < n <= corpus[lang]
    # budget: hash-threshold sampling is binomial around the target, so allow
    # generous slack around total/KEEP_BUDGET_DIV
    total, budget = sum(corpus.values()), sum(corpus.values()) / KEEP_BUDGET_DIV
    assert 0.6 * budget <= sum(kept_by_lang.values()) <= 1.4 * budget
    # T=2 flattening: keep RATE decreases as corpus share increases — the
    # head language is down-sampled hardest
    rates = sorted(
        (corpus[lang], kept_by_lang[lang] / corpus[lang]) for lang in corpus
    )
    head_rate = rates[-1][1]
    tail_rate = rates[0][1]
    assert head_rate < tail_rate
    # flattened but NOT uniform-capped: the head language still keeps the
    # most documents (sqrt preserves order; realized counts carry binomial
    # noise, so only the wide head-vs-rest gap is asserted)
    head_lang = max(corpus, key=corpus.get)
    assert kept_by_lang[head_lang] == max(kept_by_lang.values())


def test_dsir_weights_separate_target_from_rest(spark, sf_dir):
    w = get("q130_importance_weights").build(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    by_lang = (
        w.join(docs, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_weight").alias("mean_w"))
        .collect()
    )
    means = {r["(lang = en)"]: r["mean_w"] for r in by_lang}
    # English documents must score higher under the English-target LM ratio
    assert means[True] > means[False]
    # and the kept flag mirrors the weight sign
    bad = w.filter((F.col("dsir_weight") > 0) != F.col("kept")).count()
    assert bad == 0


def test_signal_fusion_ranks_are_calibrated(spark, sf_dir):
    """Fusion sanity: ranks live on the 0-99 grid, fused is their mean on
    [0,1], keep mirrors the threshold, and the r_len rank is monotone in
    the underlying token count (longer doc -> never a lower length rank)."""
    rows = get("q148_signal_fusion").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for k in ("r_len", "r_uniq", "r_lm"):
            assert 0 <= r[k] <= 99
        assert 0.0 <= r["fused"] <= 1.0
        assert r["keep"] == (r["fused"] >= 0.5)
    docs = {
        d["doc_id"]: len([t for t in d["text"].lower().split(" ") if t])
        for d in load_table(spark, sf_dir, "documents").collect()
    }
    by_len = sorted((docs[r["doc_id"]], r["r_len"]) for r in rows)
    for (n1, rk1), (n2, rk2) in zip(by_len, by_len[1:]):
        if n1 < n2:
            assert rk1 <= rk2, f"rank not monotone: {n1}->{rk1}, {n2}->{rk2}"


def test_temperature_targets_match_python_reference(spark):
    """The q132 target/threshold integer math (isqrt via floor(sqrt(c*1e6)),
    integer divisions) pinned against a pure-Python reference on randomized
    count tables — the engine-parity oracle proves Spark==DuckDB; this
    proves both match the intended arithmetic."""
    import math
    import random

    from flink_adcom_spark.queries.text import BALANCE_RES, KEEP_BUDGET_DIV

    rng = random.Random(7)
    for _ in range(5):
        counts = {f"l{i}": rng.randint(1, 10_000_000) for i in range(rng.randint(2, 8))}
        n = sum(counts.values())
        sq = {l: math.isqrt(c * 1_000_000) for l, c in counts.items()}
        sum_sq = sum(sq.values())
        want = {
            l: min(
                counts[l],
                math.floor(float(n // KEEP_BUDGET_DIV) * (float(sq[l]) / float(sum_sq))),
            )
            for l in counts
        }
        want_thresh = {l: (want[l] * BALANCE_RES) // counts[l] for l in counts}

        from flink_adcom_spark.queries.text import temperature_targets

        df = spark.createDataFrame(list(counts.items()), "lang string, c long")
        got = {
            r["lang"]: (r["target"], r["thresh"])
            for r in temperature_targets(df).collect()
        }
        for l in counts:
            assert got[l] == (want[l], want_thresh[l]), (l, counts)
