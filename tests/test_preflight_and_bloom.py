"""Round-11 additions: the bloom-prefiltered incremental substring dedup
(q206 — must equal q202 exactly while provably pruning the probe), the
cross-source overlap matrix (q209 — planted mirror pair must surface), and
the two pre-flight shuffle diagnostics (q207 skew profile / q208 join
explosion — their claims are checked against independently computed truth:
the salt formula, and the REAL join row count)."""

from __future__ import annotations

from _parity import assert_engine_parity, make_fixture_dir, open_views
from pyspark.sql import functions as F

from flink_adcom_spark.plans import explain
from flink_adcom_spark.registry import get

# --- q206: bloom prefilter must be invisible in the result, visible in the plan


def test_q206_equals_q202_exactly_on_gate_data(spark, sf_dir):
    q202 = {tuple(r) for r in
            get("q202_incremental_substring_dedup").build(spark, sf_dir).collect()}
    q206 = {tuple(r) for r in
            get("q206_bloom_substring_dedup").build(spark, sf_dir).collect()}
    assert q202 == q206
    assert len(q206) > 0  # non-vacuous: the gate data carries planted dups


def test_q206_bloom_actually_prunes_the_probe(spark, sf_dir):
    """The serving claim: bloom-negative grams never reach the confirm
    join. Measured — the bloom-positive gram count must be well below the
    batch gram count (most batch grams are novel) and at least the true
    hit count (no false negatives, by bloom construction)."""
    from flink_adcom_spark.queries.dedup import (
        BLOOM_HASHES,
        NEW_BATCH_MOD,
        SUBSTR_L,
        _bloom_pos,
        _documents,
        _substr_grams,
        words_col,
    )

    docs = _documents(spark, sf_dir)
    base = (
        docs.select("doc_id", words_col().alias("w"))
        .withColumn("n", F.size("w").cast("bigint"))
        .filter(F.col("n") >= SUBSTR_L)
    )
    is_new = F.col("doc_id") % NEW_BATCH_MOD == NEW_BATCH_MOD - 1
    index = _substr_grams(base.filter(~is_new)).select("gd").distinct()
    bloom = index.select(
        F.explode(
            F.array_distinct(
                F.array(*[_bloom_pos(F.col("gd"), i) for i in range(BLOOM_HASHES)])
            )
        ).alias("pos")
    ).distinct()
    g = _substr_grams(base.filter(is_new))
    n_batch_grams = g.count()
    probe = g
    for i in range(BLOOM_HASHES):
        probe = probe.join(
            F.broadcast(bloom), _bloom_pos(F.col("gd"), i) == F.col("pos"), "left_semi"
        )
    n_positive = probe.count()
    n_true = g.join(index, "gd").count()
    assert n_true <= n_positive  # no false negatives
    assert n_positive < n_batch_grams / 2  # the prefilter pays its way


def test_q206_plan_broadcast_semi_probe_pinned(spark, sf_dir):
    """The scale shape: the bloom reaches the probe as BROADCAST left-semi
    joins (fixed-size side), before the digest-keyed confirm join."""
    plan = explain.formatted_plan(
        get("q206_bloom_substring_dedup").build(spark, sf_dir)
    )
    assert plan.count("BroadcastHashJoin") >= 2  # one per bloom hash
    assert "LeftSemi" in plan


def test_q206_parity_on_planted_off_grid_paragraph(spark, tmp_path_factory):
    """q202's planted contract holds verbatim for the bloom variant: the
    batch doc sharing a 25+-token off-grid paragraph with a corpus doc is
    flagged, within-batch twins are not, and the non-empty relation
    hash-matches the oracle."""
    para = " ".join(f"blplant{i}" for i in range(30))
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT 9400001 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9400004 AS doc_id,
                   concat('blfa blfb blfc blfd blfe blff blfg ', '{para}') AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_bloom_substr", plant)
    spec = get("q206_bloom_substring_dedup")
    planted = {
        r["doc_id"]: r["span_tokens"]
        for r in spec.build(spark, fixture).collect()
        if r["doc_id"] >= 9400000
    }
    assert 9400004 in planted and planted[9400004] >= 30, planted
    assert 9400001 not in planted, planted  # corpus side never emitted
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q206")
    finally:
        con.close()


# --- q209: cross-source overlap matrix ----------------------------------------


def test_q209_planted_mirror_pair_surfaces_with_full_containment(
    spark, tmp_path_factory
):
    """Two fresh sources whose only docs are the SAME 25-token paragraph:
    the (plantA, plantB) cell must report exactly the paragraph's
    25-16+1 = 10 shared grams at containment 1e6 ppm (the smaller side is
    fully contained), and the non-empty matrix hash-matches the oracle."""
    para = " ".join(f"ovplant{i}" for i in range(25))
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT 9500001 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plantA' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9500002 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plantB' AS source, CAST(0 AS BIGINT) AS n_chars"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_source_overlap", plant)
    spec = get("q209_source_overlap_matrix")
    rows = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["containment_ppm"])
        for r in spec.build(spark, fixture).collect()
    }
    assert rows[("plantA", "plantB")] == (10, 1000000)
    # planted sources share nothing with the synthetic corpus vocabulary
    assert not any(
        ("plant" in a) ^ ("plant" in b) for (a, b) in rows
    ), sorted(rows)
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q209")
    finally:
        con.close()


def test_q209_matrix_shape_on_gate_data(spark, sf_dir):
    rows = get("q209_source_overlap_matrix").build(spark, sf_dir).collect()
    assert len(rows) > 0  # the synthetic corpus DOES carry cross-source grams
    for r in rows:
        assert r["src_a"] < r["src_b"]  # unordered pairs, one row each
        assert 0 < r["containment_ppm"] <= 1_000_000


# --- q207: skew profile --------------------------------------------------------


def test_q207_planted_hot_key_gets_rank1_and_correct_salt(
    spark, tmp_path_factory
):
    """300 planted rows on one user over sf0.001's 1000-row events table:
    the hot key must rank 1 and its salt factor must equal the formula
    computed INDEPENDENTLY here (ceil(cnt / ceil(total/32)))."""
    plant = {
        "events": """SELECT * FROM '{src}'
            UNION ALL
            SELECT 8000000 + i AS event_id,
                   TIMESTAMP '2024-01-01 00:00:00' AS ts,
                   CAST(99999 AS BIGINT) AS user_id,
                   'view' AS event_type, 1.0 AS value, '' AS props
            FROM range(300) t(i)"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_skew", plant)
    spec = get("q207_key_skew_profile")
    from flink_adcom_spark.tables import load_table

    rows = {r["rnk"]: r for r in spec.build(spark, fixture).collect()}
    ev = load_table(spark, fixture, "events")
    total = ev.filter(F.col("user_id").isNotNull()).count()
    ideal = -(-total // 32)
    assert rows[1]["user_id"] == 99999
    assert rows[1]["cnt"] == 300
    assert rows[1]["salt_factor"] == -(-300 // ideal)
    assert rows[1]["share_ppm"] == 300 * 1_000_000 // total
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q207")
    finally:
        con.close()


def test_q207_plan_uses_distributed_topk_not_global_sort(spark, sf_dir):
    """The rank must come from a bounded top-k (TakeOrderedAndProject),
    never a full global sort/window over every key."""
    plan = explain.formatted_plan(get("q207_key_skew_profile").build(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


# --- q208: join-explosion audit -------------------------------------------------


def test_q208_total_matches_the_real_join_row_count(spark, sf_dir):
    """The audit's whole point: sum(nl*nr) over ALL shared keys equals the
    actual view x purchase join cardinality — verified against the real
    (small-SF) join here, so at 100 TB the audit can be trusted INSTEAD of
    running the join."""
    from flink_adcom_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "event_id")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pe")
    )
    true_rows = v.join(p, "user_id").count()

    rows = get("q208_join_explosion_audit").build(spark, sf_dir).collect()
    assert len(rows) > 0
    # reconstruct the audit total from any row: share_ppm = prod*1e6 div total
    # -> cross-check every row against the true join count
    for r in rows:
        assert r["prod"] == r["nl"] * r["nr"]
        assert r["share_ppm"] == r["prod"] * 1_000_000 // true_rows
    # ranks are contiguous from 1 and ordered by prod desc
    ranks = [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert ranks == list(range(1, len(rows) + 1))
    prods = [r["prod"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert prods == sorted(prods, reverse=True)


def test_q208_planted_fanout_key_dominates(spark, tmp_path_factory):
    """A planted user with 50 views and 40 purchases contributes 2000
    output rows and must take rank 1."""
    plant = {
        "events": """SELECT * FROM '{src}'
            UNION ALL
            SELECT 8100000 + i AS event_id,
                   TIMESTAMP '2024-01-01 00:00:00' AS ts,
                   CAST(88888 AS BIGINT) AS user_id,
                   CASE WHEN i < 50 THEN 'view' ELSE 'purchase' END AS event_type,
                   1.0 AS value, '' AS props
            FROM range(90) t(i)"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_fanout", plant)
    spec = get("q208_join_explosion_audit")
    rows = {r["rnk"]: r for r in spec.build(spark, fixture).collect()}
    top = rows[1]
    assert top["user_id"] == 88888
    assert (top["nl"], top["nr"]) >= (50, 40)  # planted + any base-table rows
    assert top["prod"] == top["nl"] * top["nr"] >= 2000
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q208")
    finally:
        con.close()


# --- q210: leakage-safe split ----------------------------------------------------


def _split_law(x: int) -> int:
    return ((x % 2**31) * 2654435761) % 2**32 % 10


def _split_class(x: int) -> str:
    b = _split_law(x)
    return "train" if b < 8 else ("val" if b == 8 else "test")


def test_q210_twins_share_a_split_the_naive_law_would_separate(
    spark, tmp_path_factory
):
    """Two identical planted docs whose doc_ids land in DIFFERENT splits
    under q49's raw-id law must land in the SAME split under q210 (keyed
    on the cluster canonical) — the leakage q210 exists to prevent,
    proven on ids chosen so the naive law demonstrably separates them."""
    a = 9600001
    b = next(
        i for i in range(9600002, 9600200) if _split_class(i) != _split_class(a)
    )
    text = " ".join(f"lkplant{i}" for i in range(30))
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT {a} AS doc_id, '{text}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT {b} AS doc_id, '{text}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_leakage_split", plant)
    spec = get("q210_leakage_safe_split")
    rows = {
        r["doc_id"]: (r["cluster_key"], r["split"])
        for r in spec.build(spark, fixture).collect()
    }
    assert _split_class(a) != _split_class(b)  # the naive law WOULD leak
    assert rows[a] == rows[b] == (a, _split_class(a))  # canonical = min id
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q210")
    finally:
        con.close()


def test_q210_no_cluster_straddles_and_the_split_actually_moves_docs(
    spark, sf_dir
):
    """Invariants on the gate data: (a) every near-dup cluster maps to
    exactly one split; (b) the operator is non-vacuous — some clustered
    docs sit in a DIFFERENT split than the raw-id law would give them
    (62 of 500 at sf0.001); (c) singleton docs keep q49's assignment."""
    rows = get("q210_leakage_safe_split").build(spark, sf_dir).collect()
    by_cluster = {}
    moved = 0
    for r in rows:
        by_cluster.setdefault(r["cluster_key"], set()).add(r["split"])
        if r["split"] != _split_class(r["doc_id"]):
            assert r["cluster_key"] != r["doc_id"]  # only cluster members move
            moved += 1
        if r["cluster_key"] == r["doc_id"]:
            assert r["split"] == _split_class(r["doc_id"])
    assert all(len(s) == 1 for s in by_cluster.values())
    assert moved > 0


# --- q211: retrieval-MRR audit ---------------------------------------------------


def test_q211_verbatim_copy_ranks_first_above_partial_distractor(
    spark, tmp_path_factory
):
    """A query doc planted as a verbatim copy of a corpus doc must retrieve
    it at rank 1 (rr = 1.0) even with a distractor corpus doc that shares
    10 of the 30 query tokens (a candidate by term overlap, but NOT a
    truth partner — under the 16-token gram law — and scored below the
    full copy)."""
    para = " ".join(f"mrplant{i}" for i in range(30))
    distract = " ".join(f"mrplant{i}" for i in range(10)) + " " + " ".join(
        f"mrnoise{i}" for i in range(10)
    )
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT 9700001 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9700011 AS doc_id, '{distract}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9700004 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_mrr", plant)
    spec = get("q211_retrieval_mrr")
    rows = {r["query_doc"]: r for r in spec.build(spark, fixture).collect()}
    planted = rows[9700004]
    assert planted["n_truth"] == 1  # only the verbatim copy shares a 16-gram
    assert planted["best_rank"] == 1
    assert planted["rr"] == 1.0
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q211")
    finally:
        con.close()


def test_q211_eval_set_is_nonempty_on_gate_data(spark, sf_dir):
    rows = get("q211_retrieval_mrr").build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["best_rank"]
        assert r["n_truth"] >= 1
        assert 0 < r["rr"] <= 1.0


# --- q212: incremental split assignment -------------------------------------------


def test_q212_batch_doc_inherits_corpus_side_and_within_batch_twins_do_not(
    spark, tmp_path_factory
):
    """A batch doc identical to a CORPUS doc must inherit the corpus doc's
    split (ids chosen so the naive law would place them apart); two batch
    docs that duplicate only EACH OTHER must both keep their own ids under
    the frozen index (they join the index; the NEXT batch inherits) —
    q210's global contraction would have merged them, which is exactly the
    incremental-semantics contrast."""
    a = 9800001  # corpus (id%5==1)
    b = next(
        i
        for i in range(9800004, 9800400, 5)  # batch ids (%5==4)
        if _split_class(i) != _split_class(a)
    )
    t1, t2 = 9800104, 9800109  # batch twins (%5==4)
    text = " ".join(f"isplant{i}" for i in range(30))
    twin = " ".join(f"istwin{i}" for i in range(30))
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT {a} AS doc_id, '{text}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT {b} AS doc_id, '{text}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT {t1} AS doc_id, '{twin}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT {t2} AS doc_id, '{twin}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_incr_split", plant)
    spec = get("q212_incremental_split_assign")
    rows = {
        r["doc_id"]: (r["cluster_key"], r["split"])
        for r in spec.build(spark, fixture).collect()
    }
    assert rows[b] == (a, _split_class(a))  # inherited the corpus side
    assert _split_class(b) != _split_class(a)  # ...which the naive law refuses
    assert rows[t1] == (t1, _split_class(t1))  # frozen index: own ids
    assert rows[t2] == (t2, _split_class(t2))
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q212")
    finally:
        con.close()


def test_q212_matches_are_nonvacuous_on_gate_data(spark, sf_dir):
    rows = get("q212_incremental_split_assign").build(spark, sf_dir).collect()
    inherited = [r for r in rows if r["cluster_key"] != r["doc_id"]]
    assert len(inherited) > 0  # 61/100 batch docs at sf0.001
    for r in rows:
        assert r["split"] in ("train", "val", "test")


# --- q213: the streaming assigner must equal the batch assigner --------------------


def test_q213_stream_equals_q212_batch(spark, sf_dir):
    batch = {tuple(r) for r in
             get("q212_incremental_split_assign").build(spark, sf_dir).collect()}
    stream = {tuple(r) for r in
              get("q213_stream_split_assign").build(spark, sf_dir).collect()}
    assert stream == batch
    assert len(stream) > 0


# --- q214: impact-capped retrieval recall audit -------------------------------------


def test_q214_cap_crowds_out_a_weak_partner_that_exact_retrieval_finds(
    spark, tmp_path_factory
):
    """70 short decoy docs with tf=3 of every paragraph word outrank the
    one true partner (tf=1, diluted by 100 filler tokens) in EVERY capped
    posting list (cap 64 < 70), so the capped searcher cannot retrieve it:
    n_found 0, best_rank NULL, rr 0.0 — while q211's exact searcher still
    finds it. This is the recall loss the audit exists to measure, and it
    exercises the NULL/zero branch through the oracle hash too."""
    words = [f"capw{i}" for i in range(16)]
    para = " ".join(words)
    partner = para + " " + " ".join(f"pfill{i}" for i in range(100))
    decoy = " ".join(w for w in words for _ in range(3))
    decoys = "\n".join(
        f"""UNION ALL SELECT {9900006 + 5 * k} AS doc_id, '{decoy}' AS text,
            'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars"""
        for k in range(70)
    )
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT 9900001 AS doc_id, '{partner}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9900004 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plant' AS source, CAST(0 AS BIGINT) AS n_chars
            {decoys}"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_cap_miss", plant)

    exact = {
        r["query_doc"]: r
        for r in get("q211_retrieval_mrr").build(spark, fixture).collect()
    }
    assert exact[9900004]["n_truth"] == 1
    assert exact[9900004]["rr"] > 0  # the exact searcher finds the partner

    capped = {
        r["query_doc"]: r
        for r in get("q214_retrieval_mrr_capped").build(spark, fixture).collect()
    }
    row = capped[9900004]
    assert row["n_truth"] == 1
    assert row["n_found"] == 0
    assert row["best_rank"] is None
    assert row["rr"] == 0.0

    con = open_views(fixture)
    try:
        assert_engine_parity(
            get("q214_retrieval_mrr_capped"), spark, fixture, con, name="q214"
        )
    finally:
        con.close()


def test_q214_cap_keeps_every_gate_partner_findable(spark, sf_dir):
    """On the gate corpus the 64-doc cap keeps every truth partner
    RETRIEVABLE (n_found == n_truth, rr > 0) — ranks may shift in either
    direction because capping removes score mass from partners and
    competitors alike (the shared ~60-word vocabulary makes every posting
    corpus-length, i.e. the cap is aggressive here, which is exactly what
    the audit's rr column is for: q211 exact 0.0333 vs capped 0.0079 on
    one sf0.001 query). The eval sets must coincide."""
    exact = {
        r["query_doc"]: r for r in
        get("q211_retrieval_mrr").build(spark, sf_dir).collect()
    }
    capped = {
        r["query_doc"]: r for r in
        get("q214_retrieval_mrr_capped").build(spark, sf_dir).collect()
    }
    assert set(capped) == set(exact) and len(capped) > 0
    for q, r in capped.items():
        assert r["n_truth"] == exact[q]["n_truth"]
        assert r["n_found"] == r["n_truth"]
        assert r["rr"] > 0


# --- q215: split-leakage audit -------------------------------------------------------


def test_q215_safe_law_leaks_zero_and_naive_law_leaks(spark, sf_dir):
    rows = get("q215_split_leakage_audit").build(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_neardup_pairs"] > 0
    assert r["safe_leaky_pairs"] == 0  # the q210 guarantee, measured
    assert r["naive_leaky_pairs"] > 0  # what splitting on raw ids ships
    # ~26% straddle at sf0.001 — consistent with a 20% eval share
    # (P(different sides) = 2*0.8*0.2 = 0.32 under independent hashing)
    assert r["naive_leaky_pairs"] < r["n_neardup_pairs"]


# --- q216: per-source calibrated quality gate --------------------------------------


def test_q216_gibberish_planted_in_one_source_is_dropped_there_only(
    spark, tmp_path_factory
):
    """A fresh source with six ordinary-vocabulary docs and two rare-token
    docs: exactly the two gibberish docs (the source's bottom quartile) are
    dropped, the six ordinary ones kept — per-source calibration never
    consults other sources' scores."""
    common = "the a key value table row scan fast part hash join query line sort batch merge"
    normal = "\n".join(
        f"""UNION ALL SELECT {9950000 + k} AS doc_id, '{common}' AS text,
            'en' AS lang, 'plantQ' AS source, CAST(0 AS BIGINT) AS n_chars"""
        for k in range(6)
    )
    gib = "\n".join(
        f"""UNION ALL SELECT {9950010 + k} AS doc_id,
            'zzrare{k}a zzrare{k}b zzrare{k}c zzrare{k}d zzrare{k}e' AS text,
            'en' AS lang, 'plantQ' AS source, CAST(0 AS BIGINT) AS n_chars"""
        for k in range(2)
    )
    plant = {"documents": f"SELECT * FROM '{{src}}'\n{normal}\n{gib}"}
    fixture = make_fixture_dir(tmp_path_factory, "planted_src_quality", plant)
    spec = get("q216_per_source_quality_gate")
    rows = {
        r["doc_id"]: r
        for r in spec.build(spark, fixture).collect()
        if r["source"] == "plantQ"
    }
    assert len(rows) == 8
    assert all(not rows[9950010 + k]["keep"] for k in range(2))  # bottom quartile
    assert all(rows[9950000 + k]["keep"] for k in range(6))
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q216")
    finally:
        con.close()


def test_q216_keeps_exactly_the_top_three_quarters_per_source(spark, sf_dir):
    rows = get("q216_per_source_quality_gate").build(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        n = rs[0]["src_n"]
        assert len(rs) == n
        kept = sum(1 for r in rs if r["keep"])
        assert kept == n - n // 4  # drop exactly floor(n/4)


# --- q217: per-source batch novelty rate ----------------------------------------------


def test_q217_replayed_feed_spikes_to_full_duplication(spark, tmp_path_factory):
    """A planted feed whose batch doc is a verbatim copy of its own corpus
    doc must report dup_ppm == 1e6 (every gram already indexed), while a
    planted all-novel feed reports 0 — the spike/quiet contrast the
    dashboard exists to show."""
    para = " ".join(f"nvplant{i}" for i in range(30))
    fresh = " ".join(f"nvfresh{i}" for i in range(30))
    plant = {
        "documents": f"""SELECT * FROM '{{src}}'
            UNION ALL SELECT 9960001 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plantR' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9960004 AS doc_id, '{para}' AS text,
                   'en' AS lang, 'plantR' AS source, CAST(0 AS BIGINT) AS n_chars
            UNION ALL SELECT 9960009 AS doc_id, '{fresh}' AS text,
                   'en' AS lang, 'plantN' AS source, CAST(0 AS BIGINT) AS n_chars"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_novelty", plant)
    spec = get("q217_batch_novelty_by_source")
    rows = {r["source"]: r for r in spec.build(spark, fixture).collect()}
    assert rows["plantR"]["dup_ppm"] == 1_000_000
    assert rows["plantR"]["n_dup_grams"] == rows["plantR"]["n_grams"] == 15
    assert rows["plantN"]["dup_ppm"] == 0
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q217")
    finally:
        con.close()


# --- q218: KMV source-overlap sketch ---------------------------------------------------


def test_q218_sketch_bound_holds_and_small_pools_are_exact(spark, sf_dir):
    """All pairs within the 5-sigma bound on gate data; additionally, the
    planted-mirror case (pool < K) must degenerate to the EXACT Jaccard —
    the merged pool of two tiny sources is smaller than the sketch, so the
    estimator has nothing to estimate."""
    rows = get("q218_source_overlap_kmv").build(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["within_bound"] for r in rows)


def test_q218_matches_q209_exact_counts(spark, sf_dir):
    """The exact columns restate q209 (hv-keyed instead of gd-keyed): with a
    collision-free 60-bit hash the shared counts must be identical."""
    kmv = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in get("q218_source_overlap_kmv").build(spark, sf_dir).collect()
    }
    exact = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in get("q209_source_overlap_matrix").build(spark, sf_dir).collect()
    }
    assert kmv == exact


# --- q219: streamed novelty counters must merge to the batch audit ------------------


def test_q219_merged_epochs_equal_q217(spark, sf_dir):
    batch = {tuple(r) for r in
             get("q217_batch_novelty_by_source").build(spark, sf_dir).collect()}
    stream = {tuple(r) for r in
              get("q219_stream_novelty_counters").build(spark, sf_dir).collect()}
    assert stream == batch
    assert len(stream) > 0


# --- q220: preference pairs ---------------------------------------------------------


def test_q220_rank_aligned_pairing_on_planted_ordered_source(
    spark, tmp_path_factory
):
    """Four planted docs with strictly ordered LM scores (common words =
    high score, unique rare words = low): ranks 1..4 must pair as
    (1st,3rd) and (2nd,4th), gaps positive."""
    # graded quality: more common-corpus words -> higher avg logprob
    texts = {
        9970001: "the a key value table row scan fast part hash",   # best
        9970002: "the a key value table row scan fast pfx0 pfx1",
        9970003: "the a key value pfy0 pfy1 pfy2 pfy3 pfy4 pfy5",
        9970004: "pfz0 pfz1 pfz2 pfz3 pfz4 pfz5 pfz6 pfz7 pfz8 pfz9",  # worst
    }
    rows_sql = "\n".join(
        f"""UNION ALL SELECT {i} AS doc_id, '{t}' AS text, 'en' AS lang,
            'plantP' AS source, CAST(0 AS BIGINT) AS n_chars"""
        for i, t in texts.items()
    )
    plant = {"documents": f"SELECT * FROM '{{src}}'\n{rows_sql}"}
    fixture = make_fixture_dir(tmp_path_factory, "planted_pref_pairs", plant)
    spec = get("q220_preference_pairs")
    pairs = {
        (r["chosen_doc"], r["rejected_doc"]): r["score_gap"]
        for r in spec.build(spark, fixture).collect()
        if r["source"] == "plantP"
    }
    assert set(pairs) == {(9970001, 9970003), (9970002, 9970004)}
    assert all(g > 0 for g in pairs.values())
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q220")
    finally:
        con.close()


def test_q220_each_doc_used_once_and_gaps_nonnegative(spark, sf_dir):
    rows = get("q220_preference_pairs").build(spark, sf_dir).collect()
    assert len(rows) > 0
    used = {}
    for r in rows:
        assert r["score_gap"] >= 0  # chosen ranks above rejected by law
        for d in (r["chosen_doc"], r["rejected_doc"]):
            assert (r["source"], d) not in used  # at most one role per doc
            used[(r["source"], d)] = True


# --- q221: index-selection report -----------------------------------------------------


def test_q221_report_agrees_with_its_constituent_audits(spark, sf_dir):
    """The composition can never disagree with its audits: each variant's
    avg_recall must equal the mean of the constituent per-query relation,
    and the flat baseline is definitionally 1.0 at 64x4 bytes."""
    rows = {r["variant"]: r for r in
            get("q221_index_selection_report").build(spark, sf_dir).collect()}
    assert rows["float32_flat"]["avg_recall"] == 1.0
    assert rows["float32_flat"]["bytes_per_vec"] == 256
    pq = [r["recall"] for r in get("q197_pq_recall").build(spark, sf_dir).collect()]
    assert rows["pq_adc"]["n_queries"] == len(pq) > 0
    assert abs(rows["pq_adc"]["avg_recall"] - sum(pq) / len(pq)) < 1e-6
    ivf = [r["recall"] for r in
           get("q201_ivfpq_recall").build(spark, sf_dir).collect()]
    assert abs(rows["ivfpq_probed"]["avg_recall"] - sum(ivf) / len(ivf)) < 1e-6
    # routing can only lose recall vs the flat scan over the same codes
    assert rows["ivfpq_probed"]["avg_recall"] <= rows["pq_adc"]["avg_recall"]


# --- q222: classifier calibration ------------------------------------------------------


def test_q222_deciles_are_equal_population_ordered_and_rankable(spark, sf_dir):
    rows = sorted(
        get("q222_classifier_calibration").build(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    n = sum(r["n_docs"] for r in rows)
    assert all(abs(r["n_docs"] - n // 10) <= 1 for r in rows)  # equal-population
    # score ranges tile in order (decile edges come from the same rank law)
    for a, b in zip(rows, rows[1:]):
        assert a["max_score"] <= b["min_score"]
        assert a["n_pos"] * 1_000_000 // a["n_docs"] == a["pos_ppm"]
    # rankable: the top decile's positive rate strictly exceeds the bottom's
    assert rows[-1]["pos_ppm"] > rows[0]["pos_ppm"]


# --- q223: rank-aware nDCG audit ---------------------------------------------------------


def test_q223_ndcg_bounded_and_consistent_with_recall(spark, sf_dir):
    """nDCG in [0,1]; a query with zero set-recall must have nDCG 0, and a
    query whose hit list equals the exact top-k IN ORDER must score 1."""
    ndcg = {
        (r["variant"], r["q_id"]): r["ndcg"]
        for r in get("q223_index_ndcg_audit").build(spark, sf_dir).collect()
    }
    assert len(ndcg) == 40  # 2 variants x 20 queries
    assert all(0.0 <= v <= 1.0 for v in ndcg.values())
    recall = {
        ("pq_adc", r["q_id"]): r["recall"]
        for r in get("q197_pq_recall").build(spark, sf_dir).collect()
    }
    for (variant, q), v in ndcg.items():
        if variant == "pq_adc" and recall[("pq_adc", q)] == 0.0:
            assert v == 0.0  # no truth hits -> no gain at any rank


# --- q224: cluster-size audit ------------------------------------------------------------


def test_q224_flags_the_giant_template_cluster_only(spark, sf_dir):
    """The synthetic corpus's one giant near-dup component (313 docs, 62.6%
    share at sf0.001) must be flagged as template spam; ordinary 2-4 doc
    clusters must not. Share arithmetic is exact ppm."""
    rows = get("q224_cluster_size_audit").build(spark, sf_dir).collect()
    assert len(rows) > 0
    flagged = [r for r in rows if r["is_template"]]
    assert len(flagged) == 1 and flagged[0]["cluster_size"] > 100
    total_docs = 500
    for r in rows:
        assert r["cluster_size"] >= 2  # q45 emits only paired docs
        assert r["share_ppm"] == r["cluster_size"] * 1_000_000 // total_docs
        assert r["is_template"] == (r["share_ppm"] > 10_000)


# --- q225: packing-efficiency scorecard -----------------------------------------------


def test_q225_scorecard_internally_consistent(spark, sf_dir):
    rows = {r["packer"]: r for r in
            get("q225_packing_efficiency").build(spark, sf_dir).collect()}
    assert set(rows) == {"concat_chunk", "cdc_chunk_pack", "greedy_whole_doc"}
    for r in rows.values():
        assert r["padded_tokens"] == r["n_windows"] * 2048 - r["total_tokens"]
        assert 0 < r["fill_ppm"] <= 1_000_000
    # concat and greedy pack the SAME corpus tokens (greedy had no oversize)
    assert rows["greedy_whole_doc"]["n_oversize"] == 0
    assert (rows["concat_chunk"]["total_tokens"]
            == rows["greedy_whole_doc"]["total_tokens"])
    # the whole point: document-respecting bins pay real padding
    assert rows["concat_chunk"]["fill_ppm"] > rows["greedy_whole_doc"]["fill_ppm"]


# --- q226: dataset-version diff --------------------------------------------------------


def test_q226_all_change_classes_fire_and_deltas_reconcile(spark, sf_dir):
    rows = {r["change_type"]: r for r in
            get("q226_dataset_version_diff").build(spark, sf_dir).collect()}
    assert set(rows) == {"added", "changed", "removed", "unchanged"}
    assert rows["unchanged"]["token_delta"] == 0
    assert rows["removed"]["token_delta"] == -rows["removed"]["n_tokens"]
    assert rows["added"]["token_delta"] == rows["added"]["n_tokens"]
    assert rows["changed"]["token_delta"] > 0  # the re-crawl COMPLETED prefixes
    # the changelog reconciles to the snapshot-over-snapshot token growth
    from flink_adcom_spark.queries.dedup import NEW_BATCH_MOD
    from flink_adcom_spark.queries.text import words_col
    from flink_adcom_spark.tables import load_table

    ws = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(words_col()).cast("bigint").alias("n")
    )
    new_total = (
        ws.filter(F.col("doc_id") % 50 != 21).agg(F.sum("n")).collect()[0][0]
    )
    old_total = (
        ws.filter(F.col("doc_id") % NEW_BATCH_MOD != NEW_BATCH_MOD - 1)
        .selectExpr(
            "CASE WHEN doc_id % 20 = 3 THEN (n + 1) DIV 2 ELSE n END AS o"
        )
        .agg(F.sum("o"))
        .collect()[0][0]
    )
    assert sum(r["token_delta"] for r in rows.values()) == new_total - old_total


# --- q227: length-bucketed batches -------------------------------------------------------


def test_q227_bucketed_batches_pad_far_less_than_random_batches(spark, sf_dir):
    """The operator's reason to exist, measured: total padding under
    length-bucketed batching must be well under half the padding of
    hash-random batches of the same size over the same corpus."""
    from flink_adcom_spark.queries.text import BATCH_DOCS, words_col
    from flink_adcom_spark.tables import load_table
    from pyspark.sql import Window

    rows = get("q227_length_bucket_batches").build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["n_docs"] <= BATCH_DOCS
        assert r["pad_ppm"] == (
            (r["n_docs"] * r["max_tokens"] - r["sum_tokens"]) * 1_000_000
            // (r["n_docs"] * r["max_tokens"])
        )
    bucketed_pad = sum(r["n_docs"] * r["max_tokens"] - r["sum_tokens"] for r in rows)

    t = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(words_col()).cast("bigint").alias("n"))
        .filter(F.col("n") >= 1)
    )
    w = Window.orderBy(F.xxhash64("doc_id"), "doc_id")  # hash-random order
    rand = (
        t.withColumn("rk", F.row_number().over(w))
        .groupBy(F.expr(f"(rk - 1) DIV {BATCH_DOCS}").alias("b"))
        .agg(
            (F.count(F.lit(1)) * F.max("n") - F.sum("n")).alias("pad")
        )
        .agg(F.sum("pad"))
        .collect()[0][0]
    )
    assert bucketed_pad * 2 < rand, (bucketed_pad, rand)


# --- q228: mixture-shift report ----------------------------------------------------------


def test_q228_shift_reconciles_and_detects_penalized_feeds(spark, sf_dir):
    rows = get("q228_mixture_shift_report").build(spark, sf_dir).collect()
    assert len(rows) == 20  # every source reported
    for r in rows:
        assert r["n_after"] <= r["n_before"]
        assert r["shift_ppm"] == r["share_after_ppm"] - r["share_before_ppm"]
    # shares sum to ~1e6 on both sides (integer-division remainder only)
    assert abs(sum(r["share_before_ppm"] for r in rows) - 1_000_000) < 20
    assert abs(sum(r["share_after_ppm"] for r in rows) - 1_000_000) < 20
    # the rules gate is NOT mixture-neutral on this corpus: some feed moves
    assert any(r["shift_ppm"] != 0 for r in rows)


# --- q229: embedding-norm audit -------------------------------------------------------------


def test_q229_collapsed_label_flagged_exclusively(spark, tmp_path_factory):
    """Scale one label's vectors by 0.01 (norm collapse): exactly that label
    must be flagged degenerate, every other label stays healthy, and the
    non-trivially-flagged relation hash-matches the oracle."""
    plant = {
        "embeddings": """SELECT vec_id,
            CASE WHEN label = 3
                 THEN list_transform(embedding, x -> x * 0.01)
                 ELSE embedding END AS embedding,
            label FROM '{src}'"""
    }
    fixture = make_fixture_dir(tmp_path_factory, "planted_norm_collapse", plant)
    spec = get("q229_embedding_norm_audit")
    rows = {r["label"]: r for r in spec.build(spark, fixture).collect()}
    assert rows[3]["degenerate"] is True
    assert rows[3]["mean_norm"] < 0.1
    assert all(not r["degenerate"] for lbl, r in rows.items() if lbl != 3)
    con = open_views(fixture)
    try:
        assert_engine_parity(spec, spark, fixture, con, name="q229")
    finally:
        con.close()


def test_q229_gate_corpus_is_healthy(spark, sf_dir):
    rows = get("q229_embedding_norm_audit").build(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert not r["degenerate"]
        assert 0 < r["min_norm"] <= r["mean_norm"] <= r["max_norm"]
