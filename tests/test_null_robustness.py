"""Engine-parity under NULL-injected data.

The driver regenerates the synthetic tables between rounds (round 3's events
timestamp change broke 22 queries), and the current fixtures happen to carry
zero NULLs — so every query's NULL behavior is silently untested by the
normal oracle gate. This suite re-runs a representative query subset against
copies of `documents`/`events` with NULLs planted in text/lang/user_id/value
and asserts Spark and DuckDB still agree row-for-row.

The round-6 sweep this suite descends from found nine real divergences, all
fixed symmetrically: NaN-key group explosion in the generic combine fold
(operators/combine.py), NULL-key and NULL-timestamp matches plus NULL-payload
carry-through in the as-of join (operators/asof.py), codec crashes on NULL
media payloads (operators/multimodal.py), and engine-default NULL
ordering/count drift in q37/q71/q78/q113.
"""

from __future__ import annotations

import pytest

from _parity import assert_engine_parity, make_fixture_dir, open_views
from flink_adcom_spark.registry import get

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
    # CCNet LM family (round 12): NULL/empty/unicode text must drop or fold
    # identically through the bigram extraction, the <unk> mapping joins,
    # and the seeded FIM splits
    "q241_ccnet_lm_score",
    "q245_fim_samples",
]

_TABLE_SQL = {
    "documents": """SELECT doc_id,
        CASE WHEN doc_id % 50 = 0 THEN NULL ELSE text END AS text,
        CASE WHEN doc_id % 70 = 3 THEN NULL ELSE lang END AS lang,
        source, n_chars FROM '{src}'""",
    # the purchase-specific arm guarantees NULL purchase values exist (a
    # plain event_id modulo happens to hit zero purchases at sf0.001,
    # silently skipping the asof payload-carry paths)
    "events": """SELECT event_id, ts,
        CASE WHEN event_id % 40 = 0 THEN NULL ELSE user_id END AS user_id,
        event_type,
        CASE WHEN event_id % 60 = 7
               OR (event_type = 'purchase' AND event_id % 15 = 1)
             THEN NULL ELSE value END AS value,
        props FROM '{src}'""",
}


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    return make_fixture_dir(tmp_path_factory, "nulldata", _TABLE_SQL)


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = open_views(null_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_parity_with_planted_nulls(name, spark, null_dir, null_duck):
    assert_engine_parity(get(name), spark, null_dir, null_duck, name)
