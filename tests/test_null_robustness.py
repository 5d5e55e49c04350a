"""Engine-parity under NULL-injected data.

The driver regenerates the synthetic tables between rounds (round 3's events
timestamp change broke 22 queries), and the current fixtures happen to carry
zero NULLs — so every query's NULL behavior is silently untested by the
normal oracle gate. This suite re-runs a representative query subset against
copies of `documents`/`events` with NULLs planted in text/lang/user_id/value
and asserts Spark and DuckDB still agree row-for-row.

The round-6 sweep this suite descends from found nine real divergences, all
fixed symmetrically: NaN-key group explosion in the generic combine fold
(operators/combine.py), NULL-key matches in the as-of join
(operators/asof.py — Spark windows group NULL keys, SQL joins never match
them), codec crashes on NULL media payloads (operators/multimodal.py), and
engine-default NULL ordering/count drift in q37/q71/q78/q113.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from flink_adcom_spark.registry import get

from _parity import duck_sorted_rows, spark_sorted_rows

SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The nine queries that diverged before the round-6 NULL hardening, plus
# clean sentinels covering each NULL-handling idiom (chunking, dedup digest,
# sampling, sessions, window frames).
QUERIES = [
    "q26_asof_purchase_prior_view",
    "q97_asof_next_purchase",
    "q82_generic_topn_fold",
    "q37_repetition_ratio",
    "q71_value_percentiles",
    "q78_value_deciles",
    "q80_media_features",
    "q95_media_resize",
    "q113_retention_cohorts",
    # sentinels
    "q128_token_chunks",
    "q147_value_concentration",
    "q40_exact_dedup",
    "q21_user_sessions",
    "q24_user_rolling_value",
    "q133_exact_k_per_lang",
    "q152_weighted_sample",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("nulldata")
    con = duckdb.connect()
    con.sql(
        f"""COPY (SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0 THEN NULL ELSE text END AS text,
                 CASE WHEN doc_id % 70 = 3 THEN NULL ELSE lang END AS lang,
                 source, n_chars
                 FROM '{SRC}/documents.parquet')
            TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (SELECT event_id, ts,
                 CASE WHEN event_id % 40 = 0 THEN NULL ELSE user_id END AS user_id,
                 event_type,
                 CASE WHEN event_id % 60 = 7
                        OR (event_type = 'purchase' AND event_id % 15 = 1)
                      THEN NULL ELSE value END AS value,
                 props
                 FROM '{SRC}/events.parquet')
            TO '{dst}/events.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    for t in TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), p)
    return str(dst)


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{null_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_parity_with_planted_nulls(name, spark, null_dir, null_duck):
    spec = get(name)
    _, srows = spark_sorted_rows(spec.build(spark, null_dir))
    _, drows = duck_sorted_rows(null_duck.sql(spec.oracle))

    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    mism = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mism, f"{name}: {len(mism)} row mismatches; first: {mism[:2]}"
