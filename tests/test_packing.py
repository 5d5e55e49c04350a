"""Sequence-packing invariants: q86 (concat-and-chunk offsets) and q87
(no-split next-fit) against pure-Python reference packers."""

from __future__ import annotations

from flink_adcom_spark.queries.text import CTX_TOKENS
from flink_adcom_spark.registry import get


def _token_counts(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_adcom_spark.queries.text import words_col
    from flink_adcom_spark.tables import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(words_col()).cast("bigint").alias("n"))
        .filter(F.col("n") >= 1)
        .collect()
    )
    return {r["doc_id"]: r["n"] for r in rows}


def test_sequence_pack_offsets_are_exact(spark, sf_dir):
    """q86's distributed two-phase prefix sum == the sequential prefix sum."""
    toks = _token_counts(spark, sf_dir)
    got = {r["doc_id"]: r for r in get("q86_sequence_pack").build(spark, sf_dir).collect()}
    start = 0
    for doc_id in sorted(toks):
        r = got[doc_id]
        assert r["start_tok"] == start
        assert r["win_first"] == start // CTX_TOKENS
        assert r["win_last"] == (start + toks[doc_id] - 1) // CTX_TOKENS
        start += toks[doc_id]
    assert len(got) == len(toks)


def test_greedy_pack_matches_python_reference(spark, sf_dir):
    """q87's sharded next-fit == a sequential next-fit run per shard."""
    rows = get("q87_greedy_pack").build(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["shard"], r["window_id"], r["oversize"]) for r in rows}
    toks = _token_counts(spark, sf_dir)
    assert set(got) == set(toks)

    shards = sorted({s for s, _, _ in got.values()})
    for shard in shards:
        docs = sorted(d for d in toks if got[d][0] == shard)
        win, fill = 0, 0
        for d in docs:
            n = toks[d]
            if fill > 0 and fill + n > CTX_TOKENS:
                win, fill = win + 1, 0
            assert got[d][1] == shard * (1 << 32) + win, f"doc {d}"
            assert got[d][2] == (n > CTX_TOKENS)
            fill += n
            if fill >= CTX_TOKENS:
                win, fill = win + 1, 0


def test_greedy_pack_window_capacity(spark, sf_dir):
    """No window exceeds CTX unless it holds a single oversize doc."""
    from collections import defaultdict

    rows = get("q87_greedy_pack").build(spark, sf_dir).collect()
    by_win = defaultdict(list)
    for r in rows:
        by_win[r["window_id"]].append(r)
    for win, members in by_win.items():
        total = sum(r["n_tokens"] for r in members)
        if total > CTX_TOKENS:
            assert len(members) == 1 and members[0]["oversize"], win
