"""Unigram-LM tokenizer (q179): Viterbi scoring + usage pruning.

Contracts:
  1. The full Spark pipeline (inventory seed -> Viterbi -> prune ->
     renormalize -> Viterbi) is bit-identical to a pure-Python reference
     implementation (the q159 differential discipline).
  2. Every emitted segmentation reassembles its word exactly, and its score
     equals the sum of the current inventory's piece log-probs.
  3. On the real corpus, pruning is NON-vacuous: at least one word's
     segmentation changes between rounds (the r8 vacuous-green lesson).
  4. On a planted corpus with strong compound structure, frequent
     multi-char pieces win over character soup (fertility < 1 piece/char).
"""
from __future__ import annotations

import math

import pyspark.sql.functions as F

from flink_adcom_spark.queries.text import (
    ULM_PIECE_MAX,
    ULM_PRUNE_K,
    ULM_TOP_MULTI,
    ULM_WMAX,
    q179_unigram_lm_tokenizer,
)


def _py_unigram_lm(word_freq: dict[str, int]):
    """Pure-Python reference of the whole q179 pipeline."""
    vocab = {w: f for w, f in word_freq.items() if 1 <= len(w) <= ULM_WMAX}

    subs: dict[str, int] = {}
    for w, f in vocab.items():
        for i in range(len(w)):
            for L in range(1, ULM_PIECE_MAX + 1):
                if i + L <= len(w):
                    subs[w[i : i + L]] = subs.get(w[i : i + L], 0) + f

    singles = {p: c for p, c in subs.items() if len(p) == 1}
    multi_ranked = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )
    multi1 = dict(multi_ranked[:ULM_TOP_MULTI])

    def scores(inv: dict[str, int]) -> dict[str, float]:
        tot = sum(inv.values())
        return {p: math.log(c / tot) for p, c in inv.items()}

    def viterbi(w: str, sc: dict[str, float]):
        best = {0: (0.0, 0, "")}
        for j in range(1, len(w) + 1):
            cands = []
            for L in range(1, min(ULM_PIECE_MAX, j) + 1):
                piece = w[j - L : j]
                if piece not in sc or (j - L) not in best:
                    continue
                prev = best[j - L]
                seg = piece if prev[2] == "" else prev[2] + "|" + piece
                cands.append((-(prev[0] + sc[piece]), prev[1] + 1, seg))
            if cands:
                s, n, seg = sorted(cands)[0]
                best[j] = (-s, n, seg)
        return best[len(w)]

    sc1 = scores({**singles, **multi1})
    r1 = {w: viterbi(w, sc1) for w in vocab}

    usage: dict[str, int] = {}
    for w, (s, n, seg) in r1.items():
        for piece in seg.split("|"):
            if len(piece) >= 2:
                usage[piece] = usage.get(piece, 0) + vocab[w]
    prune_order = sorted(multi1, key=lambda p: (usage.get(p, 0), p))
    pruned = set(prune_order[:ULM_PRUNE_K])
    multi2 = {p: c for p, c in multi1.items() if p not in pruned}

    sc2 = scores({**singles, **multi2})
    r2 = {w: viterbi(w, sc2) for w in vocab}
    return {
        w: (
            vocab[w],
            r1[w][1],
            r2[w][1],
            r2[w][2],
            round(r2[w][0], 6),
        )
        for w in vocab
    }, sc2


def _word_freq_from_corpus(spark, sf_dir) -> dict[str, int]:
    import re

    from flink_adcom_spark.queries.text import words_col
    from flink_adcom_spark.tables import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(words_col()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    )
    # mirror q179's ASCII contract (_ASCII_WORD_RE) so the reference pipeline
    # sees the same vocabulary even if the corpus grows non-ASCII words
    return {
        r["word"]: int(r["f"]) for r in rows if re.fullmatch(r"[!-~]+", r["word"])
    }


def test_q179_matches_python_reference(spark, sf_dir):
    want, _ = _py_unigram_lm(_word_freq_from_corpus(spark, sf_dir))
    got = {
        r["word"]: (r["freq"], r["n_pieces_r1"], r["n_pieces"], r["seg"], r["score"])
        for r in q179_unigram_lm_tokenizer(spark, sf_dir).collect()
    }
    assert got == want


def test_q179_segments_reassemble_and_scores_add_up(spark, sf_dir):
    _, sc2 = _py_unigram_lm(_word_freq_from_corpus(spark, sf_dir))
    rows = q179_unigram_lm_tokenizer(spark, sf_dir).collect()
    assert rows
    for r in rows:
        pieces = r["seg"].split("|")
        assert "".join(pieces) == r["word"]
        assert len(pieces) == r["n_pieces"]
        assert abs(sum(sc2[p] for p in pieces) - r["score"]) < 1e-5


def test_q179_pruning_is_not_vacuous(spark, sf_dir):
    rows = q179_unigram_lm_tokenizer(spark, sf_dir).collect()
    assert any(r["n_pieces"] != r["n_pieces_r1"] for r in rows), (
        "round-2 inventory identical in effect to round 1 — pruning never "
        "reached a used piece; ULM_PRUNE_K is miscalibrated for this corpus"
    )


def test_unigram_lm_learns_compounds_on_planted_corpus():
    """A corpus of compounds over the morphemes {data, base, load, work}:
    the inventory must learn multi-char pieces and the Viterbi must prefer
    them — mean pieces-per-word well under character count (fertility the
    whole point of a trained tokenizer). Pure-Python reference path (the
    Spark pipeline equals it exactly by test_q179_matches_python_reference)."""
    corpus = {}
    for w, f in [
        ("database", 100), ("dataload", 80), ("workload", 90),
        ("workbase", 70), ("loadbase", 60), ("basework", 50),
        ("datawork", 40), ("loaddata", 30),
    ]:
        corpus[w] = f
    out, _ = _py_unigram_lm(corpus)
    mean_pieces = sum(v[2] for v in out.values()) / len(out)
    mean_chars = sum(len(w) for w in out) / len(out)
    assert mean_pieces <= mean_chars / 2, (mean_pieces, mean_chars)
    # the 4-char morphemes themselves should appear in segmentations
    seen = {p for v in out.values() for p in v[3].split("|")}
    assert {"data", "base", "load", "work"} & seen, seen


# --- property: the Viterbi DP equals brute-force segmentation search ------------
def _brute_force_best(word: str, sc: dict[str, float]):
    """Enumerate EVERY segmentation of `word` into inventory pieces (length
    <= ULM_PIECE_MAX) and return the (score, n_pieces, seg) the DP's
    ordering contract should pick: max score, then fewest pieces, then
    lexicographically smallest seg string."""
    results = []

    def rec(i: int, score: float, pieces: list[str]):
        if i == len(word):
            results.append((score, len(pieces), "|".join(pieces)))
            return
        for L in range(1, ULM_PIECE_MAX + 1):
            if i + L > len(word):
                break
            p = word[i : i + L]
            if p in sc:
                rec(i + L, score + sc[p], pieces + [p])

    rec(0, 0.0, [])
    if not results:
        return None
    return sorted(results, key=lambda r: (-r[0], r[1], r[2]))[0]


def test_viterbi_dp_matches_brute_force_enumeration():
    """Hypothesis sweep: on random small corpora the reference pipeline's
    per-word result (which q179's Spark DP equals exactly, by
    test_q179_matches_python_reference) must match an exhaustive search
    over all segmentations — proving the sliding-window DP and its
    (score, n_pieces, seg) tie-break are not just self-consistent but
    OPTIMAL."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=6,
        unique=True,
    )

    @settings(max_examples=150, deadline=None)
    @given(words=words, freqs=st.lists(st.integers(1, 50), min_size=6, max_size=6))
    def run(words, freqs):
        wf = {w: f for w, f in zip(words, freqs)}
        out, sc2 = _py_unigram_lm(wf)
        for w, (freq, n1, n2, seg, score) in out.items():
            best = _brute_force_best(w, sc2)
            assert best is not None
            b_score, b_n, b_seg = best
            assert seg == b_seg, (w, seg, b_seg)
            assert n2 == b_n
            assert abs(round(b_score, 6) - score) < 1e-9

    run()
