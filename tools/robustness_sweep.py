#!/usr/bin/env python3
"""Full-registry adversarial parity sweep: run EVERY oracle-bearing query on
Spark and DuckDB over fixture copies with planted adversarial shapes, and
report any divergence.

Four axes (the first three also have curated permanent suites; this tool is
the exhaustive version that FOUND the round-6 bugs):
  nulls     — NULL text/lang/user_id/value (incl. guaranteed purchase NULLs)
  boundary  — empty/whitespace docs, zero/negative values
  unicode   — accents, CJK, case-mapping landmines, combining marks, emoji
  dupes     — exact-duplicate rows (ingestion replays); known primary-key
              contract divergences are annotated, see EXPECTED_CONTRACT

Run: python tools/robustness_sweep.py [nulls|boundary|unicode|dupes|all] [query...]
Exit code 0 = clean; 1 = divergences (printed). ~6 min per axis for the full
registry on 8 cpus.
"""

from __future__ import annotations

import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from _parity import duck_sorted_rows, spark_sorted_rows  # noqa: E402

SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

AXES: dict[str, dict[str, str]] = {
    "nulls": {
        "documents": """SELECT doc_id,
            CASE WHEN doc_id % 50 = 0 THEN NULL ELSE text END AS text,
            CASE WHEN doc_id % 70 = 3 THEN NULL ELSE lang END AS lang,
            source, n_chars FROM '{src}'""",
        "events": """SELECT event_id, ts,
            CASE WHEN event_id % 40 = 0 THEN NULL ELSE user_id END AS user_id,
            event_type,
            CASE WHEN event_id % 60 = 7
                   OR (event_type = 'purchase' AND event_id % 15 = 1)
                 THEN NULL ELSE value END AS value,
            props FROM '{src}'""",
    },
    "boundary": {
        "documents": """SELECT doc_id,
            CASE WHEN doc_id % 50 = 0 THEN ''
                 WHEN doc_id % 50 = 25 THEN '   ' ELSE text END AS text,
            lang, source,
            CASE WHEN doc_id % 50 = 0 THEN 0
                 WHEN doc_id % 50 = 25 THEN 3 ELSE n_chars END AS n_chars
            FROM '{src}'""",
        "events": """SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 60 = 7 THEN 0.0
                 WHEN event_id % 45 = 3 THEN -value ELSE value END AS value,
            props FROM '{src}'""",
    },
    "unicode": {
        "documents": """SELECT doc_id,
            CASE WHEN doc_id % 50 = 0
                 THEN 'Größe STRASSE café naïve İstanbul ﬁne 東京 données ' || text
                 WHEN doc_id % 50 = 25
                 THEN 'ΣΙΣΥΦΟΣ σίσυφος ÅNGSTRÖM é' || chr(769) || ' 🚀 ' || text
                 ELSE text END AS text,
            lang, source, n_chars FROM '{src}'""",
    },
    # EXACT duplicate rows (identical in every column, including the id):
    # ingestion replays and at-least-once sinks produce these. Rank windows
    # tie-break on ids, so duplicated rows get arbitrary rank ASSIGNMENT —
    # but identical rows make any assignment the same multiset; a divergence
    # here means an operator depends on id uniqueness more deeply.
    "dupes": {
        "documents": """SELECT * FROM '{src}'
            UNION ALL SELECT * FROM '{src}' WHERE doc_id % 40 = 2""",
        "events": """SELECT * FROM '{src}'
            UNION ALL SELECT * FROM '{src}' WHERE event_id % 40 = 2""",
    },
    # RE-KEYED duplicate rows (same content, FRESH primary keys): the shape a
    # crawler re-fetch or a mirrored feed produces — and the one the plain
    # dupes axis structurally cannot test for pair-producing operators, since
    # pairs require distinct ids (vec_a < vec_b never fires on identical
    # ids). Under this axis the pair-producing near-dup queries (MUST_DETECT
    # below) must return rows — the sweep prints their pair counts, and a
    # zero is a detection failure, not parity noise.
    "dupes_rekeyed": {
        "documents": """SELECT * FROM '{src}'
            UNION ALL SELECT doc_id + 1000000 AS doc_id, text, lang, source,
                             n_chars
            FROM '{src}' WHERE doc_id % 40 = 2""",
        "embeddings": """SELECT * FROM '{src}'
            UNION ALL SELECT vec_id + 1000000 AS vec_id, embedding, label
            FROM '{src}' WHERE vec_id % 40 = 2""",
    },
}

# On dupes_rekeyed, these queries' results must be NON-EMPTY (the planted
# re-keyed copies are exact duplicates, the strongest possible near-dup);
# a 0-row result is reported as a detection failure.
MUST_DETECT = {
    "dupes_rekeyed": {
        "q41_minhash_lsh_pairs", "q42_ngram_jaccard_pairs",
        "q44_simhash_neardup", "q53_embed_neardup_pairs",
        "q88_embed_neardup_multiprobe", "q164_embed_neardup_planted",
    },
}

# q40 (exact dedup) and q43 (per-doc simhash) always emit one row per doc,
# so non-emptiness is vacuous for them; their duplicate-DETECTION is instead
# asserted by value (q40's keep flags / q144's per-source rates hash-match
# the oracle over the rekeyed fixture, which the normal parity loop covers).


# Expected per-axis outcomes that are NOT divergences: q80/q95 carry a loud
# ASCII-invariant guard (queries/media.py::_assert_ascii_fixture) that raises
# BY DESIGN when the corpus stops being pure ASCII — their oracles restate
# the fake codec's byte arithmetic via ascii(char), which only equals the
# first/last UTF-8 byte on ASCII text. The guard firing is the designed
# behavior (fail loud instead of silently diverging).
EXPECTED_GUARD = {
    # q252 shares the same byte==char oracle restatement and the same
    # loud _assert_ascii_fixture guard as q80/q95; q260 composes q252's
    # manifest (registered after the r13 sweep froze this list — the
    # guard firing is its designed loud behavior too)
    "unicode": {"q80_media_features", "q95_media_resize",
                "q252_media_chunk_manifest", "q260_media_caption_gate"},
}
GUARD_MARKER = "no longer pure ASCII"

# Known, documented divergences under a DATA-CONTRACT violation rather than
# engine bugs: these queries' Spark and oracle formulations are equivalent
# ONLY under the primary-key contract (unique doc_id/event_id/vec_id-joined
# ids). Exact-duplicate ids make a doc-keyed GROUP BY double-count what a
# per-row scan computes once (q37/q48), make a prefix-sum's total order
# ambiguous between identical keys (q86/q134), and fan out dimension joins
# (q56/q135). The contract is CHECKED, not assumed: q137's expectation audit
# reports n_rows vs n_distinct_keys per table, which a 100 TB ingest asserts
# before publishing — on the dupes fixture it reads 1025 vs 1000.
EXPECTED_CONTRACT = {
    "dupes": {
        "q37_repetition_ratio", "q48_contamination", "q56_hybrid_search",
        "q86_sequence_pack", "q134_chunked_pack", "q135_bitext_mining",
        # q186 packs the corpus in doc_id order (the q86 prefix sum), so
        # duplicated doc_id rows make the global token order ill-defined —
        # the same packing-family PK contract as q86/q134.
        "q186_needle_eval_samples",
        # q260 pairs media rows with captions by media_id (= doc_id):
        # duplicate ids fan the equi-join out with different
        # multiplicities on the two engines — the q56/q135
        # dimension-join PK contract (registered after the r13 sweep
        # froze this list).
        "q260_media_caption_gate",
        # q158: doc_id is the chunker's primary key — the Spark side chunks
        # each physical row independently (duplicate rows -> duplicate chunk
        # rows) while the oracle's LAG-window restatement interleaves the
        # copies' token positions; a pipeline dedups replays (q40) before
        # chunking, so the PK contract is the documented behavior.
        "q158_cdc_chunks",
        # q160/q161 compose q158's chunker (batch-local per micro-batch vs
        # the oracle's whole-relation window), so they inherit exactly its
        # PK contract: duplicated doc_id rows interleave in the oracle's
        # token windows but chunk independently per batch on the Spark side.
        "q160_chunk_novelty",
        "q161_stream_chunk_index",
        # q184: doc_id is the scorer's grouping key; copies of one doc_id
        # that land in DIFFERENT micro-batches score once per copy (one
        # feature build each) while the batch oracle groups them into one
        # doubled-count row. The serving contract assumes deduped ingest
        # (q40/q90 upstream), same as every doc_id-keyed operator above.
        "q184_stream_classifier_scores",
    },
}


def build_fixture(axis: str) -> str:
    import duckdb

    dst = tempfile.mkdtemp(prefix=f"sweep_{axis}_")
    con = duckdb.connect()
    for table, body in AXES[axis].items():
        con.sql(
            f"COPY ({body.format(src=f'{SRC}/{table}.parquet')}) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    for t in TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), p)
    return dst


def main() -> int:
    import duckdb

    from flink_adcom_spark import registry
    from flink_adcom_spark.session import get_spark

    args = sys.argv[1:]
    axes = [a for a in args if a in AXES or a == "all"]
    names = [a for a in args if a not in AXES and a != "all"]
    if not axes:
        axes = ["all"]
    if axes == ["all"]:
        axes = list(AXES)
    specs = registry.all_specs()
    if not names:
        names = sorted(n for n, s in specs.items() if s.oracle)

    spark = get_spark("robustness-sweep", cpus=8)
    bad: list[tuple[str, str, str]] = []
    for axis in axes:
        fixture = build_fixture(axis)
        dk = duckdb.connect()
        for t in TABLES:
            dk.sql(f"CREATE VIEW {t} AS SELECT * FROM '{fixture}/{t}.parquet'")
        for name in names:
            spec = specs[name]
            if spec.oracle is None:
                continue
            try:
                _, srows = spark_sorted_rows(spec.build(spark, fixture))
                _, drows = duck_sorted_rows(dk.sql(spec.oracle))
                if name in MUST_DETECT.get(axis, set()):
                    if not srows:
                        bad.append((axis, name, "0 rows — planted re-keyed duplicates NOT detected"))
                        print(f"NO-DETECT [{axis}] {name}: {bad[-1][2]}")
                        continue
                    print(f"DETECT [{axis}] {name}: {len(srows)} pairs on the planted duplicates")
                if srows != drows:
                    if name in EXPECTED_CONTRACT.get(axis, set()):
                        print(
                            f"CONTRACT [{axis}] {name}: diverges only under "
                            "the violated primary-key contract (see q137)"
                        )
                        continue
                    diff = [(a, b) for a, b in zip(srows, drows) if a != b][:1]
                    bad.append((axis, name, f"spark={len(srows)} duck={len(drows)} {diff}"))
                    print(f"MISMATCH [{axis}] {name}: {bad[-1][2]}")
            except Exception as e:  # noqa: BLE001
                if name in EXPECTED_GUARD.get(axis, set()) and GUARD_MARKER in str(e):
                    print(f"GUARD [{axis}] {name}: ASCII invariant raised as designed")
                    continue
                bad.append((axis, name, f"{type(e).__name__}: {e}"))
                print(f"ERROR [{axis}] {name}: {str(e)[:200]}")
        dk.close()
        print(f"axis {axis}: {'CLEAN' if not [b for b in bad if b[0] == axis] else 'DIVERGENT'}")
    print("RESULT:", "ALL CLEAN" if not bad else f"{len(bad)} divergent")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
