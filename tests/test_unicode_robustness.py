"""Engine-parity under Unicode text: accents, CJK, combining marks, emoji,
and the case-mapping landmines (Turkish dotted capital I, Greek sigma,
German sharp s, ligatures).

Companion to the NULL and boundary robustness suites. The round-6 sweep this
suite descends from found 10 text queries diverging on planted Unicode —
root cause: full Unicode lower() is ENGINE-DEPENDENT (Spark maps 'İ' to
"i" + combining dot while DuckDB drops the dot). The fix is the explicit
ASCII-only fold (queries/text.py::fold_col / _FOLD_TEXT_SQL), identical by
construction on both engines and a no-op on the ASCII fixtures; real Unicode
casefolding is an ingestion-time ICU concern, stated in the fold's docs.
"""

from __future__ import annotations

import pytest

from _parity import assert_engine_parity, make_fixture_dir, open_views
from flink_adcom_spark.registry import get

# The ten queries that diverged before the ASCII-fold change, plus the other
# text-family members whose tokenization flows through the shared fold.
QUERIES = [
    "q10_wordcount",
    "q33_fingerprint",
    "q34_regex_token_count",
    "q36_bigram_counts",
    "q40_exact_dedup",
    "q41_minhash_lsh_pairs",
    "q43_simhash",
    "q114_quality_gate",
    "q117_bpe_pair_counts",
    "q153_inverted_index",
    # sentinels on the same fold
    "q35_tfidf_top_terms",
    "q42_ngram_jaccard_pairs",
    "q77_unigram_logprob",
    "q128_token_chunks",
    "q148_signal_fusion",
    # CCNet LM family (round 12): unicode text must fold/tokenize/md5
    # identically through the bigram extraction, <unk> joins, FIM slices
    "q241_ccnet_lm_score",
    "q245_fim_samples",
]

_TABLE_SQL = {
    "documents": """SELECT doc_id,
        CASE WHEN doc_id % 50 = 0
             THEN 'Größe STRASSE café naïve İstanbul ﬁne 東京 données ' || text
             WHEN doc_id % 50 = 25
             THEN 'ΣΙΣΥΦΟΣ σίσυφος ÅNGSTRÖM é' || chr(769) || ' 🚀 ' || text
             ELSE text END AS text,
        lang, source, n_chars FROM '{src}'""",
}


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    return make_fixture_dir(tmp_path_factory, "unidata", _TABLE_SQL)


@pytest.fixture(scope="module")
def uni_duck(uni_dir):
    con = open_views(uni_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_parity_with_unicode_text(name, spark, uni_dir, uni_duck):
    assert_engine_parity(get(name), spark, uni_dir, uni_duck, name)
