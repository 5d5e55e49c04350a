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


def test_cdc_chunks_survive_insertion(spark):
    """The CDC promise (q158): after inserting tokens at the head of a
    document, the vast majority of chunk digests are UNCHANGED — only the
    head region and the chunks straddling the position-based hard cuts
    (the scan-parallel compromise for FastCDC's max-length rule; one
    broken pair per cut) re-chunk. Fixed-stride windows (the q128 shape)
    share ZERO digests under the same insertion — the contrast that makes
    CDC the dedup chunking unit."""
    import uuid
    from collections import Counter

    from pyspark.sql import functions as F

    from flink_adcom_spark.queries.text import CDC_MAX_TOKENS, cdc_chunks_df

    n_words = 400
    words = [uuid.uuid5(uuid.NAMESPACE_DNS, str(i)).hex[:6] for i in range(n_words)]
    base = " ".join(words)
    shifted = "zzz qqq xxx " + base  # 3-token head insertion

    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    rows = cdc_chunks_df(df).select("doc_id", "digest").collect()
    b = Counter(r["digest"] for r in rows if r["doc_id"] == 0)
    s = Counter(r["digest"] for r in rows if r["doc_id"] == 1)
    shared = sum((b & s).values())
    n_base = sum(b.values())
    n_cuts = n_words // CDC_MAX_TOKENS
    # each hard cut can break at most 2 chunks; + a small head region
    assert shared >= n_base - (2 * n_cuts + 4), (
        f"only {shared}/{n_base} chunk digests survived a head insertion"
    )

    # contrast: fixed 64-token windows all shift -> zero shared digests
    fixed = (
        df.select(
            "doc_id",
            F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks), {CDC_MAX_TOKENS}), s -> "
                    f"concat_ws(' ', slice(toks, s, {CDC_MAX_TOKENS})))"
                )
            ).alias("w"),
        )
        .select("doc_id", F.md5("w").alias("digest"))
        .collect()
    )
    fb = {r["digest"] for r in fixed if r["doc_id"] == 0}
    fs = {r["digest"] for r in fixed if r["doc_id"] == 1}
    assert not (fb & fs), "fixed windows unexpectedly aligned"
