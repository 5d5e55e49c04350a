"""Property-based check of span-level dedup (q111): on arbitrary corpora the
per-document audit must reconcile exactly with first-occurrence election —
sum over docs of kept spans == number of DISTINCT span texts in the corpus,
and token accounting closes per document. Includes the hot-span case (one
boilerplate span shared by every document)."""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from flink_adcom_spark.queries.dedup import SPAN_W
from flink_adcom_spark.registry import get

# small word alphabet -> frequent whole-span collisions across docs
_word = st.sampled_from(["a", "b", "c", "dd", "ee"])
_doc = st.lists(_word, min_size=1, max_size=3 * SPAN_W + 5)
_corpus = st.lists(_doc, min_size=1, max_size=6)

_HOT = [["x"] * SPAN_W + ["a"], ["x"] * SPAN_W + ["b"], ["x"] * SPAN_W]


def _expected_distinct_spans(corpus: list[list[str]]) -> int:
    spans = set()
    for words in corpus:
        for k in range(0, len(words), SPAN_W):
            spans.add(" ".join(words[k : k + SPAN_W]))
    return len(spans)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(corpus=_HOT)
@given(corpus=_corpus)
def test_span_dedup_reconciles(spark, tmp_path_factory, corpus):
    sf = str(tmp_path_factory.mktemp("spansf"))
    rows = [
        (i, " ".join(words), "en", "gen", len(" ".join(words)))
        for i, words in enumerate(corpus)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    out = {r["doc_id"]: r for r in get("q111_span_dedup").build(spark, sf).collect()}
    assert set(out) == set(range(len(corpus)))
    kept_total = 0
    for i, words in enumerate(corpus):
        r = out[i]
        n = len(words)
        n_spans = (n + SPAN_W - 1) // SPAN_W
        assert r["n_tokens"] == n
        assert r["n_spans"] == n_spans
        assert 0 <= r["n_dup_spans"] <= n_spans
        # token accounting closes: dropped tokens = tokens of the dup spans
        dup_tokens = n - r["surviving_tokens"]
        assert 0 <= dup_tokens <= n
        kept_total += n_spans - r["n_dup_spans"]
    # first-occurrence election: exactly one kept occurrence per distinct span
    assert kept_total == _expected_distinct_spans(corpus)
