"""Positive-path proofs for the queries whose external green rows were only
ever 0-row matches (VERDICT r7: q53/q88 embedding near-dup, q74 TPC-H Q22,
q67 viewers-never-purchased). Each test plants deterministic positives,
asserts the query finds EXACTLY them, and hash-checks the non-empty result
against the DuckDB oracle over the same fixture — detection proven, not just
plumbing."""

from __future__ import annotations

from _parity import assert_engine_parity, make_fixture_dir, open_views

from flink_adcom_spark.registry import get

# --- embedding near-dup: perturbed copies must be detected, decoys must not ---


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


def test_q53_finds_exactly_the_planted_neardups(spark, planted_embeddings_dir):
    fixture, expected = planted_embeddings_dir
    got = _pairs(get("q53_embed_neardup_pairs").build(spark, fixture))
    assert got == expected  # every planted pair found, decoy pairs with nothing


def test_q88_multiprobe_finds_exactly_the_planted_neardups(spark, planted_embeddings_dir):
    fixture, expected = planted_embeddings_dir
    got = _pairs(get("q88_embed_neardup_multiprobe").build(spark, fixture))
    assert got == expected


def test_neardup_oracle_parity_on_nonempty_relation(spark, planted_embeddings_dir):
    """The hash-match logic itself, exercised where rows EXIST: Spark and
    DuckDB must agree row-for-row (incl. the rounded cosine values) on the
    planted fixture for both the single-bucket and multiprobe variants."""
    fixture, expected = planted_embeddings_dir
    con = open_views(fixture)
    try:
        for name in ("q53_embed_neardup_pairs", "q88_embed_neardup_multiprobe"):
            spec = get(name)
            assert spec.build(spark, fixture).count() == len(expected) > 0
            assert_engine_parity(spec, spark, fixture, con, name=name)
    finally:
        con.close()


def test_q164_planted_twin_nonempty_at_gate_data(spark, sf_dir):
    """The externally-gated twin: verbatim replays under fresh NEGATED ids
    (collision-free at any corpus size) must all surface at cosine 1.0 over
    the UNMODIFIED gate data."""
    from flink_adcom_spark.queries.similarity import PLANT_MOD, PLANT_RESIDUE

    rows = get("q164_embed_neardup_planted").build(spark, sf_dir).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}
    expected = {
        (-i - 1, i)  # the planted negative id sorts below its original
        for i in range(500)
        if i % PLANT_MOD == PLANT_RESIDUE
    }
    assert set(got) == expected and expected
    assert all(c == 1.0 for c in got.values()), got


# --- q67 EXCEPT: a planted view-only user must survive the subtraction --------

_EVENTS_PLANT = {
    "events": """SELECT * FROM '{src}'
        UNION ALL
        SELECT event_id + 1000000 AS event_id, ts, 999999 AS user_id,
               event_type, value, props
        FROM '{src}' WHERE event_type = 'view' AND event_id % 20 = 3"""
}


def test_q67_finds_the_planted_view_only_user(spark, tmp_path_factory):
    fixture = make_fixture_dir(tmp_path_factory, "planted_viewer", _EVENTS_PLANT)
    spec = get("q67_viewers_never_purchased")
    rows = spec.build(spark, fixture).collect()
    assert {r["user_id"] for r in rows} == {999999}
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q67")
    finally:
        con.close()


# --- q74 anti-join: a planted rich no-orders customer must survive ------------

_CUSTOMER_PLANT = {
    "customer": """SELECT * FROM '{src}'
        UNION ALL
        SELECT 999999 AS c_custkey, 'Customer#999999' AS c_name,
               c_nationkey, 9999.99 AS c_acctbal, c_mktsegment
        FROM '{src}' WHERE c_custkey = 1"""
}


def test_q74_finds_the_planted_idle_rich_customer(spark, tmp_path_factory):
    fixture = make_fixture_dir(tmp_path_factory, "planted_idle_rich", _CUSTOMER_PLANT)
    spec = get("q74_tpch_q22_idle_rich")
    rows = spec.build(spark, fixture).collect()
    assert len(rows) == 1 and rows[0]["numcust"] == 1
    assert abs(rows[0]["totacctbal"] - 9999.99) < 1e-9
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q74")
    finally:
        con.close()


def test_planted_twins_registered_with_oracles():
    """The gate-able twins exist, carry oracles, and are distinct from the
    structurally-empty originals."""
    for name in (
        "q164_embed_neardup_planted",
        "q67b_viewers_no_big_purchase",
        "q74b_tpch_q22_planted",
    ):
        assert get(name).oracle is not None


# --- q169/q170: the round-8 additions must fire non-vacuously -----------------


def test_q169_contaminated_flag_fires(spark, sf_dir):
    rows = get("q169_embed_decontaminate").build(spark, sf_dir).collect()
    flagged = [r for r in rows if r["contaminated"]]
    assert flagged, "DECON_COS must flag at least one corpus vector"
    assert all(r["max_eval_cos"] >= 0.4 for r in flagged)
    assert len(flagged) < len(rows)  # and the keep path fires too


def test_q170_detects_every_planted_variant(spark, sf_dir):
    """Every base word >= FUZZY_MIN_LEN must pair with its planted
    append-'x' variant (insertion) at dist 1; every base >= MIN+1 with its
    drop-last variant (deletion)."""
    from flink_adcom_spark.queries.text import FUZZY_MIN_LEN, _documents, words_col
    from pyspark.sql import functions as F

    base = {
        r["word"]
        for r in _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(F.explode(words_col()).alias("word"))
        .filter(F.length("word") >= FUZZY_MIN_LEN)
        .distinct()
        .collect()
    }
    got = {
        (r["word_a"], r["word_b"]): r["dist"]
        for r in get("q170_symspell_pairs").build(spark, sf_dir).collect()
    }
    pairs = set(got)
    for w in base:
        key = (w, w + "x") if w < w + "x" else (w + "x", w)
        assert key in pairs, f"missing insertion variant pair for {w!r}"
        assert got[key] == 1
        if len(w) >= FUZZY_MIN_LEN + 1:
            d = w[:-1]
            key = (d, w) if d < w else (w, d)
            assert key in pairs, f"missing deletion variant pair for {w!r}"
    assert all(d <= 1 for d in got.values())


def test_q172_counts_planted_payload_duplicates(spark, tmp_path_factory):
    """The pristine corpus has no duplicate payloads (q172's duplicate and
    reclaimable columns read 0), so prove the reclaim math on a fixture with
    re-keyed replays: every 40th doc duplicated under a fresh id must
    surface as one duplicate row + its full payload size reclaimable."""
    fixture = make_fixture_dir(
        tmp_path_factory,
        "planted_media_dupes",
        {
            "documents": """SELECT * FROM '{src}'
                UNION ALL SELECT doc_id + 1000000 AS doc_id, text, lang,
                                 source, n_chars
                FROM '{src}' WHERE doc_id % 40 = 2 AND text IS NOT NULL"""
        },
    )
    spec = get("q172_media_dedup_stats")
    rows = {r["media_type"]: r for r in spec.build(spark, fixture).collect()}
    assert sum(r["n_duplicate_rows"] for r in rows.values()) > 0
    assert all(
        r["reclaimable_bytes"] > 0
        for r in rows.values()
        if r["n_duplicate_rows"] > 0
    )
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q172")
    finally:
        con.close()


def test_q174_detects_the_planted_template(spark, sf_dir):
    from flink_adcom_spark.queries.text import BOILER_TEMPLATE

    rows = get("q174_boilerplate_prefixes").build(spark, sf_dir).collect()
    assert rows, "planted template replicas must surface"
    want_prefix = " ".join(BOILER_TEMPLATE.split()[:8])
    assert any(r["prefix"] == want_prefix and r["n_docs"] >= 3 for r in rows)


def test_q173_fertility_bounds(spark, sf_dir):
    rows = get("q173_bpe_fertility_by_lang").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # merges only ever SHRINK the per-word token count from its char
        # length, and a word is always >= 1 token
        assert 1.0 <= r["fertility"], r
        assert r["n_bpe_tokens"] <= 8 * r["n_words"]  # max word length


def test_q177_negatives_are_sound_and_deterministic(spark, sf_dir):
    """Negative-sampling soundness: no sampled (customer, part) pair may be
    a true interaction, every customer gets its full NEG_K quota on this
    data, and a re-run under a different partitioning returns the identical
    set (seeded hash, not RNG)."""
    from flink_adcom_spark.queries.tpch import NEG_K
    from flink_adcom_spark.tables import load_table

    spec = get("q177_negative_samples")
    rows = spec.build(spark, sf_dir).collect()
    neg = {(r["c_custkey"], r["p_partkey"]) for r in rows}
    pos = {
        (r["c_custkey"], r["p_partkey"])
        for r in load_table(spark, sf_dir, "orders")
        .selectExpr("o_orderkey", "o_custkey AS c_custkey")
        .join(
            load_table(spark, sf_dir, "lineitem").selectExpr(
                "l_orderkey AS o_orderkey", "l_partkey AS p_partkey"
            ),
            "o_orderkey",
        )
        .select("c_custkey", "p_partkey")
        .distinct()
        .collect()
    }
    assert neg and not (neg & pos)  # sound: never a true interaction
    per_cust: dict = {}
    for c, p in neg:
        per_cust[c] = per_cust.get(c, 0) + 1
    # EVERY customer must be represented (a dropped customer would otherwise
    # silently shrink the denominator of the quota check below)
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert len(per_cust) == n_cust, (len(per_cust), n_cust)
    # quota is best-effort by design (oversample 2x, then validate+anti-join):
    # at the tiny test SF the part space is small enough that a customer can
    # run out of clean candidates — never over quota, mostly full quota
    assert max(per_cust.values()) <= NEG_K
    full = sum(1 for v in per_cust.values() if v == NEG_K)
    assert full >= 0.8 * len(per_cust), (full, len(per_cust))

    # re-run under a DIFFERENT shuffle layout (the test_partition_invariance
    # recipe): every upstream exchange really re-executes with 7 partitions
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        again = {
            (r["c_custkey"], r["p_partkey"], r["rnk"])
            for r in spec.build(spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert again == {(r["c_custkey"], r["p_partkey"], r["rnk"]) for r in rows}


# --- q156b pool-bounded contrastive mining: planted twins become positives ----


def test_q156b_pool_recalls_planted_twins_as_positives(spark, planted_embeddings_dir):
    """The SRP-LSH pool must RECALL the planted near-duplicates: for anchors
    that carry a perturbed twin (cosine 0.92-0.9999, far above everything
    else in the near-random corpus), the mined positive should be that twin.
    Recall is probabilistic in the banding (4 bands x r bits), so assert a
    floor rather than totality — the construction is fully deterministic, so
    this is a fixed number, not flake: measured 1.0 on the fixture."""
    fixture, expected_pairs = planted_embeddings_dir
    rows = get("q156b_contrastive_pool").build(spark, fixture).collect()
    pos_by_anchor = {r["anchor_id"]: (r["pos_id"], r["pos_cos"]) for r in rows}
    hits = 0
    for lo, hi in expected_pairs:
        if lo in pos_by_anchor and pos_by_anchor[lo][0] == hi:
            assert pos_by_anchor[lo][1] >= 0.92
            hits += 1
    assert hits >= 0.8 * len(expected_pairs), (hits, len(expected_pairs))
    # and the triple structure is sound: pos_cos >= neg_cos everywhere
    assert all(r["pos_cos"] >= r["neg_cos"] for r in rows)


def test_q156b_oracle_parity_on_planted_fixture(spark, planted_embeddings_dir):
    """Engine parity where the positives are REAL near-duplicates, not just
    the near-random gate corpus."""
    fixture, _ = planted_embeddings_dir
    con = open_views(fixture)
    try:
        spec = get("q156b_contrastive_pool")
        assert spec.build(spark, fixture).count() > 0
        assert_engine_parity(spec, spark, fixture, con, name="q156b")
    finally:
        con.close()


# --- q188 any-length substring dedup: off-grid shared paragraph ----------------

# a 30-token paragraph of corpus-foreign words, inserted at offset 0 in one
# planted doc and offset 7 (< 16, so NO q111 grid span of the two docs ever
# aligns on it) in the other
_PARA = " ".join(f"zqplant{i}" for i in range(30))
_SUBSTR_PLANT = {
    "documents": f"""SELECT * FROM '{{src}}'
        UNION ALL SELECT 9000001 AS doc_id, '{_PARA}' AS text,
               'en' AS lang, 'plant' AS source,
               CAST(len('{_PARA}') AS BIGINT) AS n_chars
        UNION ALL SELECT 9000002 AS doc_id,
               concat('fila filb filc fild file filf filg ', '{_PARA}',
                      ' tailx taily') AS text,
               'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars"""
}


def test_q188_finds_the_offgrid_shared_paragraph_q111_misses(
    spark, tmp_path_factory
):
    """The planted paragraph sits at token offset 0 in doc 9000001 and
    offset 7 in doc 9000002 — never aligned on q111's fixed 16-token grid,
    so q111 reports ZERO duplicate spans for both docs, while q188's
    sliding grams recover the full 30-token span at both offsets."""
    fixture = make_fixture_dir(tmp_path_factory, "planted_substr", _SUBSTR_PLANT)

    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in get("q188_substring_dedup").build(spark, fixture).collect()
        if r["doc_id"] >= 9000000
    }
    assert spans[9000001] == (0, 29, 30), spans
    assert spans[9000002] == (7, 36, 30), spans

    q111 = {
        r["doc_id"]: r["n_dup_spans"]
        for r in get("q111_span_dedup").build(spark, fixture).collect()
        if r["doc_id"] >= 9000000
    }
    assert q111 == {9000001: 0, 9000002: 0}, q111

    # and engine parity holds on the planted fixture too
    con = open_views(fixture)
    try:
        assert_engine_parity(
            get("q188_substring_dedup"), spark, fixture, con, name="q188"
        )
    finally:
        con.close()


# --- q193 KS drift: a planted shifted source must be flagged -------------------

_DRIFT_PLANT = {
    "documents": """SELECT doc_id, text, lang, source,
        CASE WHEN source = 'src3' THEN n_chars + 5000 ELSE n_chars END
          AS n_chars
        FROM '{src}'"""
}


def test_q193_flags_exactly_the_planted_drifted_source(spark, tmp_path_factory):
    """Shift src3's whole n_chars distribution by +5000 (total ECDF
    separation -> KS ~ 1.0 against the rest): q193 must flag src3 and ONLY
    src3, and the flag must be the thresholded ks_stat it reports."""
    fixture = make_fixture_dir(tmp_path_factory, "planted_drift", _DRIFT_PLANT)
    rows = get("q193_source_drift_ks").build(spark, fixture).collect()
    flagged = {r["source"] for r in rows if r["drifted"]}
    assert flagged == {"src3"}, flagged
    by_src = {r["source"]: r["ks_stat"] for r in rows}
    assert by_src["src3"] >= 0.9, by_src["src3"]

    con = open_views(fixture)
    try:
        assert_engine_parity(
            get("q193_source_drift_ks"), spark, fixture, con, name="q193"
        )
    finally:
        con.close()


# --- q191 Gopher law: a planted repetition loop must be dropped ----------------

_LOOP = " ".join(["loopa loopb loopc loopd loope loopf"] * 10)  # 60 tokens
_CLEAN = " ".join(f"uniqw{i}" for i in range(40))
_GOPHER_PLANT = {
    "documents": f"""SELECT * FROM '{{src}}'
        UNION ALL SELECT 9100001 AS doc_id, '{_LOOP}' AS text, 'en' AS lang,
               'plant' AS source, CAST(len('{_LOOP}') AS BIGINT) AS n_chars
        UNION ALL SELECT 9100002 AS doc_id, '{_CLEAN}' AS text, 'en' AS lang,
               'plant' AS source, CAST(len('{_CLEAN}') AS BIGINT) AS n_chars"""
}


def test_q191_drops_the_planted_loop_and_keeps_the_clean_doc(
    spark, tmp_path_factory
):
    """A document that is one 6-gram repeated 10x saturates every duplicate
    fraction (dup6_frac ~ 1.0) and must be dropped; a 40-distinct-word doc
    has no repeated n-gram at all (dup fractions 0.0) and must be kept."""
    fixture = make_fixture_dir(tmp_path_factory, "planted_gopher", _GOPHER_PLANT)
    rows = {
        r["doc_id"]: r
        for r in get("q191_gopher_repetition").build(spark, fixture).collect()
        if r["doc_id"] >= 9100000
    }
    assert rows[9100001]["keep"] is False
    assert rows[9100001]["dup6_frac"] >= 0.9, rows[9100001]
    assert rows[9100002]["keep"] is True
    assert rows[9100002]["dup5_frac"] == 0.0

    con = open_views(fixture)
    try:
        assert_engine_parity(
            get("q191_gopher_repetition"), spark, fixture, con, name="q191"
        )
    finally:
        con.close()


# --- q202 incremental substring dedup: batch-vs-corpus spans only ---------------

_PARA2 = " ".join(f"yqplant{i}" for i in range(25))
_INCR_PLANT = {
    "documents": f"""SELECT * FROM '{{src}}'
        UNION ALL SELECT 9000001 AS doc_id, '{_PARA}' AS text,
               'en' AS lang, 'plant' AS source,
               CAST(len('{_PARA}') AS BIGINT) AS n_chars
        UNION ALL SELECT 9000004 AS doc_id,
               concat('fila filb filc fild file filf filg ', '{_PARA}',
                      ' tailx taily') AS text,
               'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
        UNION ALL SELECT 9000009 AS doc_id, '{_PARA2}' AS text,
               'en', 'plant', CAST(0 AS BIGINT)
        UNION ALL SELECT 9000014 AS doc_id, '{_PARA2}' AS text,
               'en', 'plant', CAST(0 AS BIGINT)"""
}


def test_q202_flags_batch_vs_corpus_only_and_is_batching_invariant(
    spark, tmp_path_factory
):
    """Doc 9000004 (batch: id%5==4) shares the off-grid paragraph with
    corpus doc 9000001 (id%5==1) -> q202 must emit exactly the 25+-token
    span for the BATCH doc and nothing for the corpus doc. Docs
    9000009/9000014 are BOTH in the batch and duplicate only each other:
    index-frozen semantics must NOT flag them (q188 on the same fixture
    does — that contrast is the incremental contract). And splitting the
    batch arbitrarily, probing each part against the same index, must
    union to the identical span set (the q161 batching-invariance
    discipline)."""
    from pyspark.sql import functions as F

    from flink_adcom_spark.queries.dedup import (
        NEW_BATCH_MOD, SUBSTR_L, _documents, substring_spans_vs_index,
        _substr_grams, words_col,
    )

    fixture = make_fixture_dir(tmp_path_factory, "planted_incr_substr", _INCR_PLANT)
    rows = get("q202_incremental_substring_dedup").build(spark, fixture).collect()
    planted = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
               for r in rows if r["doc_id"] >= 9000000}
    assert 9000004 in planted and planted[9000004][2] >= 25, planted
    assert 9000001 not in planted, planted  # corpus docs never emitted
    assert 9000009 not in planted and 9000014 not in planted, planted
    # ...while the batch-global q188 DOES see the within-batch twins
    q188_docs = {r["doc_id"] for r in
                 get("q188_substring_dedup").build(spark, fixture).collect()}
    assert {9000009, 9000014} <= q188_docs

    # batching invariance: split the batch by doc_id parity, probe each
    # half against the SAME frozen index, union == whole-batch result
    docs = _documents(spark, fixture)
    base = docs.select("doc_id", words_col().alias("w")).withColumn(
        "n", F.size("w").cast("bigint")
    ).filter(F.col("n") >= SUBSTR_L)
    is_new = F.col("doc_id") % NEW_BATCH_MOD == NEW_BATCH_MOD - 1
    index = _substr_grams(base.filter(~is_new)).select("gd").distinct()
    whole = {tuple(r) for r in rows}
    parts = set()
    for par in (0, 1):
        half = base.filter(is_new & (F.col("doc_id") % 2 == par))
        parts |= {tuple(r) for r in
                  substring_spans_vs_index(half, index).collect()}
    assert parts == whole

    con = open_views(fixture)
    try:
        assert_engine_parity(
            get("q202_incremental_substring_dedup"), spark, fixture, con,
            name="q202",
        )
    finally:
        con.close()


# --- q204 embedding drift: a planted off-manifold source must be flagged -------

# src3 = doc_id % 20 == 3 (the synthetic source law); its vectors are moved
# to a constant far-off point, forming their own k-means cell that no other
# source occupies -> TV(src3 vs rest) ~ 1.0, everyone else's TV moves by at
# most src3's ~5% mass share
_EMB_DRIFT_PLANT = {
    "embeddings": """SELECT vec_id,
        CASE WHEN vec_id % 20 = 3
             THEN list_transform(embedding, x -> CAST(100.0 AS FLOAT))
             ELSE embedding END AS embedding,
        label FROM '{src}'"""
}


def test_q204_flags_exactly_the_planted_drifted_embedding_source(
    spark, tmp_path_factory
):
    fixture = make_fixture_dir(tmp_path_factory, "planted_embdrift", _EMB_DRIFT_PLANT)
    rows = get("q204_embedding_drift_tv").build(spark, fixture).collect()
    flagged = {r["source"] for r in rows if r["drifted"]}
    assert flagged == {"src3"}, flagged
    by_src = {r["source"]: r["tv_dist"] for r in rows}
    assert by_src["src3"] >= 0.9, by_src["src3"]

    con = open_views(fixture)
    try:
        assert_engine_parity(
            get("q204_embedding_drift_tv"), spark, fixture, con, name="q204"
        )
    finally:
        con.close()
