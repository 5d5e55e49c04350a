"""Property-based check of token-window chunking (q128): on arbitrary corpora
every chunk agrees with the pure-Python sliding-window reference — coverage
(every token appears in some chunk), stride alignment, and overlap content."""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from flink_adcom_spark.queries.prep import CHUNK_OVERLAP, CHUNK_STRIDE, CHUNK_TOKENS
from flink_adcom_spark.registry import get

_word = st.sampled_from(["a", "bb", "ccc", "d"])
_doc = st.lists(_word, min_size=0, max_size=2 * CHUNK_TOKENS + 7)
_corpus = st.lists(_doc, min_size=1, max_size=5)

# boundary corpora: empty doc, exactly one window, one past the stride rule
_EDGE = [[], ["w"] * CHUNK_TOKENS, ["w"] * (CHUNK_TOKENS + CHUNK_STRIDE)]


def _py_chunks(words: list[str]) -> list[tuple[int, int, str]]:
    starts = range(0, max(len(words) - CHUNK_OVERLAP, 1), CHUNK_STRIDE)
    return [
        (i, len(words[s : s + CHUNK_TOKENS]), " ".join(words[s : s + CHUNK_TOKENS]))
        for i, s in enumerate(starts)
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(corpus=_EDGE)
@given(corpus=_corpus)
def test_chunking_matches_reference_on_arbitrary_corpora(
    spark, tmp_path_factory, corpus
):
    sf = str(tmp_path_factory.mktemp("chunksf"))
    rows = [
        (i, " ".join(words), "en", "gen", len(" ".join(words)))
        for i, words in enumerate(corpus)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got: dict[int, list] = {i: [] for i in range(len(corpus))}
    for r in get("q128_token_chunks").build(spark, sf).collect():
        got[r["doc_id"]].append((r["chunk_idx"], r["n_tokens"], r["chunk_text"]))
    for i, words in enumerate(corpus):
        assert sorted(got[i]) == _py_chunks(words), f"doc {i}: {words}"
