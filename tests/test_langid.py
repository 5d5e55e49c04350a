"""Planted multilingual proof for q190 trained language-ID (VERDICT r9 #5).

The gate corpus's text is ASCII pseudo-words with no real language signal, so
detection is proven here: a fixture whose documents are built from per-language
vocabulary pools — half the docs carry the q32 marker stopwords, half are
MARKER-FREE (only language-typical content words). The trained trigram
perceptron must reach acc >= 0.9 overall, and on the marker-free half it must
beat the q32 heuristic decisively (the heuristic sees zero markers there and
falls back to its tie order; it also can never predict zh at all)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from _parity import assert_engine_parity, open_views

from flink_adcom_spark.registry import get

SF_SMALL = "/root/testdata/sf0.001"

# 3 marker words (the q32 LANG_MARKERS) + distinct content words per language
_POOLS_MARKED = {
    "en": "the and of house time people water small world because".split(),
    "de": "der die und haus zeit leute wasser klein welt weil".split(),
    "es": "el los las casa tiempo gente agua mundo porque donde".split(),
    "fr": "le les et maison temps gens eau monde parce quand".split(),
    "zh": "zhong wen shui ren jia shi hou yin wei shan".split(),
}
# marker-free pools: language-typical words only, NO marker stopwords
_POOLS_BARE = {
    "en": "house time people water small world because window street green".split(),
    "de": "haus zeit leute wasser klein welt weil fenster strasse gruen".split(),
    "es": "casa tiempo gente agua mundo porque ventana calle verde cielo".split(),
    "fr": "maison temps gens eau monde parce fenetre rue vert ciel".split(),
    "zh": "shui ren jia shi hou yin wei shan chuan tian".split(),
}
_N_PER_LANG = 30  # per (lang, pool kind)
_DOC_LEN = 30


def _doc_text(pool: list[str], i: int) -> str:
    return " ".join(pool[(i + j) % len(pool)] for j in range(_DOC_LEN))


@pytest.fixture(scope="module")
def multilingual_dir(tmp_path_factory):
    doc_ids, texts, langs, sources = [], [], [], []
    next_id = 0
    for kind, pools in (("marked", _POOLS_MARKED), ("bare", _POOLS_BARE)):
        for lang in sorted(pools):
            for i in range(_N_PER_LANG):
                doc_ids.append(next_id)
                texts.append(_doc_text(pools[lang], i))
                langs.append(lang)
                sources.append(kind)
                next_id += 1
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    dst = tmp_path_factory.mktemp("multilingual")
    pq.write_table(out, f"{dst}/documents.parquet")
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(f"{SF_SMALL}/{t}.parquet", f"{dst}/{t}.parquet")
    return str(dst)


def test_trained_langid_acc_and_heuristic_audit(spark, multilingual_dir):
    rows = get("q190_trained_langid").build(spark, multilingual_dir).collect()
    assert len(rows) == 2 * 5 * _N_PER_LANG
    by_id = {r["doc_id"]: r for r in rows}
    acc = sum(r["pred_lang"] == r["labeled_lang"] for r in rows) / len(rows)
    assert acc >= 0.9, acc

    # marker-free half: doc_ids >= 5 * _N_PER_LANG (the 'bare' block)
    bare = [r for i, r in by_id.items() if i >= 5 * _N_PER_LANG]
    trained_bare = sum(r["pred_lang"] == r["labeled_lang"] for r in bare) / len(bare)
    heur_bare = sum(r["heuristic_lang"] == r["labeled_lang"] for r in bare) / len(bare)
    assert trained_bare >= 0.9, trained_bare
    # no markers to count -> the heuristic collapses to its tie order (and
    # can never answer zh), so it must sit at or below 1-in-5 here
    assert heur_bare <= 0.25, heur_bare

    # the audit column is consistent with the two predictions
    assert all(r["agree"] == (r["pred_lang"] == r["heuristic_lang"]) for r in rows)


def test_trained_langid_oracle_parity_on_planted_fixture(spark, multilingual_dir):
    con = open_views(multilingual_dir)
    try:
        assert_engine_parity(
            get("q190_trained_langid"), spark, multilingual_dir, con, name="q190"
        )
    finally:
        con.close()


def test_q190_heuristic_column_is_q32(spark, multilingual_dir):
    """Drift tripwire: the disagreement audit's heuristic_lang must equal
    q32's pred_lang row-for-row (one shared heuristic_lang_col definition;
    this catches anyone re-forking it)."""
    q32 = {
        r["doc_id"]: r["pred_lang"]
        for r in get("q32_lang_id").build(spark, multilingual_dir).collect()
    }
    q190 = {
        r["doc_id"]: r["heuristic_lang"]
        for r in get("q190_trained_langid").build(spark, multilingual_dir).collect()
    }
    assert q32 == q190
