"""Token-window chunking and PII scrubbing: edge cases against a pure-Python
reference, plus redaction on realistic literal PII that the fixture corpus
cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.functions.pii import pii_count, redact_pii
from flink_adcom_spark.queries.prep import CHUNK_OVERLAP, CHUNK_STRIDE, CHUNK_TOKENS
from flink_adcom_spark.registry import get


def _py_chunks(text: str) -> list[tuple[int, int, str]]:
    toks = [t for t in text.split() if t]
    starts = list(range(0, max(len(toks) - CHUNK_OVERLAP, 1), CHUNK_STRIDE))
    out = []
    for i, s in enumerate(starts):
        chunk = toks[s : s + CHUNK_TOKENS]
        out.append((i, len(chunk), " ".join(chunk)))
    return out


def test_chunking_matches_python_reference(spark, sf_dir):
    rows = (
        get("q128_token_chunks")
        .build(spark, sf_dir)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        )
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == _py_chunks(text), f"doc {doc_id}"


def test_chunking_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (1, ""),  # empty -> one empty chunk
            (2, "one"),  # single token
            (3, "  padded   tokens  "),  # whitespace runs collapse
            (4, " ".join(f"w{i}" for i in range(CHUNK_TOKENS))),  # exactly one window
            (5, " ".join(f"w{i}" for i in range(CHUNK_TOKENS + 1))),  # spills over
        ],
        "doc_id long, text string",
    )
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("t") - CHUNK_OVERLAP - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunks = (
        df.select("doc_id", toks.alias("t"))
        .select("doc_id", F.explode(starts).alias("start"), "t")
        .select(
            "doc_id",
            F.slice("t", F.col("start") + 1, F.lit(CHUNK_TOKENS)).alias("chunk"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.size("chunk")).alias("tok_sum"),
        )
        .collect()
    )
    by_id = {r["doc_id"]: (r["n_chunks"], r["tok_sum"]) for r in chunks}
    assert by_id[1] == (1, 0)
    assert by_id[2] == (1, 1)
    assert by_id[3] == (1, 2)
    # exactly one window: the would-be tail at 48 is fully contained
    assert by_id[4] == (1, CHUNK_TOKENS)
    # 65 tokens -> windows at 0 (64 toks) and 48 (17 toks)
    assert by_id[5] == (2, CHUNK_TOKENS + (CHUNK_TOKENS + 1 - CHUNK_STRIDE))


def test_pii_redaction_on_real_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org today"),
            (2, "call 555-019-9044 or visit 192.168.1.254 now"),
            (3, "no pii here at all"),
            (4, "two mails: a@b.co and x_y%z@sub.domain.io"),
            # negatives the tightened patterns must NOT redact: numeric
            # range, bare 7-digit number, out-of-range octets
            (5, "range 100-2000, ext 555-0199, bad ip 999.1.1.300"),
            # parenthesized area-code phone form
            (6, "dial (212) 555-0199 today"),
        ],
        "id long, text string",
    )
    out = df.select(
        "id",
        redact_pii("text").alias("clean"),
        pii_count("text", "email").alias("ne"),
        pii_count("text", "phone").alias("np"),
        pii_count("text", "ipv4").alias("ni"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["clean"] == "reach me at [EMAIL] today"
    assert by_id[1]["ne"] == 1
    assert by_id[2]["clean"] == "call [PHONE] or visit [IP] now"
    assert (by_id[2]["np"], by_id[2]["ni"]) == (1, 1)
    assert by_id[3]["clean"] == "no pii here at all"
    assert (by_id[3]["ne"], by_id[3]["np"], by_id[3]["ni"]) == (0, 0, 0)
    assert by_id[4]["clean"] == "two mails: [EMAIL] and [EMAIL]"
    assert by_id[4]["ne"] == 2
    assert by_id[5]["clean"] == "range 100-2000, ext 555-0199, bad ip 999.1.1.300"
    assert (by_id[5]["ne"], by_id[5]["np"], by_id[5]["ni"]) == (0, 0, 0)
    assert by_id[6]["clean"] == "dial [PHONE] today"
    assert by_id[6]["np"] == 1


def test_pii_audit_residual_zero(spark, sf_dir):
    rows = get("q129_pii_scrub_audit").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["residual_pii"] == 0
        assert r["emails_found"] == r["docs"]
        assert r["phones_found"] == r["docs"]
        # every doc plants exactly one IP; phone/email strings never parse as IPs
        assert r["ips_found"] == r["docs"]


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """q159's window-algebra merge loop must agree with a direct Python
    implementation of Sennrich-style BPE (greedy left-to-right merging,
    ties to the lexicographically smallest pair) on the same vocabulary."""
    from collections import Counter

    from flink_adcom_spark.queries.text import BPE_ROUNDS, BPE_VOCAB_TOP
    from flink_adcom_spark.registry import get
    from flink_adcom_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    words = Counter()
    from flink_adcom_spark.queries.text import words_col

    for r in docs.filter(F.col("text").isNotNull()).select(
        F.explode(words_col()).alias("w")
    ).collect():
        words[r["w"]] += 1
    vocab = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_VOCAB_TOP]
    seqs = {w: list(w) for w, _ in vocab}
    freq = dict(vocab)

    expected = []
    for rnd in range(1, BPE_ROUNDS + 1):
        pairs = Counter()
        for w, s in seqs.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += freq[w]
        (p1, p2), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rnd, p1, p2, p1 + p2, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out

    got = [
        (r["round"], r["p1"], r["p2"], r["merged"], r["pair_count"])
        for r in sorted(
            get("q159_bpe_train_merges").build(spark, sf_dir).collect(),
            key=lambda r: r["round"],
        )
    ]
    assert got == expected
