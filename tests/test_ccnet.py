"""CCNet LM family unit tests (q241-q247): planted-corpus scoring laws the
oracle mirror only exercises incidentally — the <unk> smoothing floor, the
no-reference-language drop — plus the permutation/packing invariants of the
curriculum relations on the real fixture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_adcom_spark import registry
from flink_adcom_spark.queries.text import (
    CCNET_REF_SOURCE,
    _ccnet_lm,
    ccnet_score_vs_lm,
)


@pytest.fixture(scope="module")
def planted_ccnet_dir(spark, tmp_path_factory):
    """documents table with a hand-checkable reference LM: lang 'xx' has one
    reference doc 'aa bb aa bb' (vocab {aa, bb}, V = 3 with <unk>; bigram
    counts aa->bb: 2, bb->aa: 1; predecessor counts aa: 2, bb: 1); lang 'yy'
    has NO reference doc at all."""
    d = str(tmp_path_factory.mktemp("ccnet") / "sf")
    rows = [
        (0, "aa bb aa bb", "xx", CCNET_REF_SOURCE),
        (1, "aa bb", "xx", "src1"),  # in-vocab: p(bb|aa) = (2+1)/(2+3)
        (2, "aa zz", "xx", "src1"),  # OOV zz -> <unk>: p = (0+1)/(2+3)
        (3, "aa bb", "yy", "src1"),  # no 'yy' reference LM -> dropped
    ]
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _scores(spark, d):
    vw, v, bc, uc = _ccnet_lm(spark, d)
    from flink_adcom_spark.tables import load_table

    out = ccnet_score_vs_lm(load_table(spark, d, "documents"), vw, v, bc, uc)
    return {r["doc_id"]: r for r in out.collect()}


def test_planted_smoothed_probabilities(spark, planted_ccnet_dir):
    got = _scores(spark, planted_ccnet_dir)
    # reference doc scores its own bigrams: ln p(bb|aa)=ln(3/5), ln p(aa|bb)
    # =ln(2/4), three bigrams averaged
    ref_ce = -(2 * math.log(3 / 5) + math.log(2 / 4)) / 3
    assert got[0]["cross_entropy"] == pytest.approx(round(ref_ce, 6), abs=1e-6)
    assert got[1]["cross_entropy"] == pytest.approx(
        round(-math.log(3 / 5), 6), abs=1e-6
    )
    assert got[1]["n_bigrams"] == 1


def test_planted_oov_falls_to_smoothing_floor(spark, planted_ccnet_dir):
    got = _scores(spark, planted_ccnet_dir)
    # (aa, zz) -> (aa, <unk>): c12 = 0, c1(aa) = 2, V = 3 -> p = 1/5
    assert got[2]["cross_entropy"] == pytest.approx(
        round(-math.log(1 / 5), 6), abs=1e-6
    )
    # the OOV doc must score WORSE than the same-shape in-vocab doc
    assert got[2]["cross_entropy"] > got[1]["cross_entropy"]


def test_planted_unmodeled_language_drops(spark, planted_ccnet_dir):
    got = _scores(spark, planted_ccnet_dir)
    assert 3 not in got
    assert set(got) == {0, 1, 2}


def test_curriculum_positions_are_a_permutation(spark, sf_dir):
    out = registry.get("q243_curriculum_order").build(spark, sf_dir)
    rows = out.select("pos", "stage").collect()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    # stages are contiguous blocks: stage never decreases along pos
    by_pos = [r["stage"] for r in sorted(rows, key=lambda r: r["pos"])]
    assert by_pos == sorted(by_pos)


def test_curriculum_pack_offsets_are_contiguous(spark, sf_dir):
    out = registry.get("q246_curriculum_pack").build(spark, sf_dir)
    pos = registry.get("q243_curriculum_order").build(spark, sf_dir)
    j = out.join(pos.select("doc_id", "pos"), "doc_id").orderBy("pos").collect()
    expect = 0
    for r in j:
        assert r["start_tok"] == expect
        assert r["win_first"] == r["start_tok"] // 2048
        assert r["win_last"] == (r["start_tok"] + r["n_tokens"] - 1) // 2048
        expect += r["n_tokens"]


def test_fim_segments_partition_the_doc(spark, sf_dir):
    out = registry.get("q245_fim_samples").build(spark, sf_dir)
    bad = out.filter(
        (F.col("prefix_len") < 1)
        | (F.col("middle_len") < 1)
        | (F.col("suffix_len") < 1)
        | (
            F.col("prefix_len") + F.col("middle_len") + F.col("suffix_len")
            != F.col("n_tokens")
        )
        | (F.length("fim_fp") != 32)
    ).count()
    assert bad == 0


def test_domain_reweight_is_a_distribution(spark, sf_dir):
    rows = registry.get("q247_domain_reweight").build(spark, sf_dir).collect()
    total = sum(r["weight"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-4)
    ref = [r for r in rows if r["source"] == CCNET_REF_SOURCE][0]
    # the reference feed's excess is zero by construction and its weight is
    # the minimum (everything else is >= the exp(0) numerator)
    assert ref["excess_ce"] == 0.0
    assert ref["weight"] == min(r["weight"] for r in rows)
