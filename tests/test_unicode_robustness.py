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

import os

import duckdb
import pytest

from _parity import duck_sorted_rows, spark_sorted_rows
from flink_adcom_spark.registry import get

SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

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
]


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("unidata")
    con = duckdb.connect()
    con.sql(
        f"""COPY (SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0
                      THEN 'Größe STRASSE café naïve İstanbul ﬁne 東京 données ' || text
                      WHEN doc_id % 50 = 25
                      THEN 'ΣΙΣΥΦΟΣ σίσυφος ÅNGSTRÖM é' || chr(769) || ' 🚀 ' || text
                      ELSE text END AS text,
                 lang, source, n_chars
                 FROM '{SRC}/documents.parquet')
            TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), p)
    return str(dst)


@pytest.fixture(scope="module")
def uni_duck(uni_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{uni_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_parity_with_unicode_text(name, spark, uni_dir, uni_duck):
    spec = get(name)
    _, srows = spark_sorted_rows(spec.build(spark, uni_dir))
    _, drows = duck_sorted_rows(uni_duck.sql(spec.oracle))

    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    mism = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mism, f"{name}: {len(mism)} row mismatches; first: {mism[:2]}"
