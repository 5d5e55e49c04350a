"""Engine-parity under boundary-value data: empty/whitespace-only documents,
zero values, negative values.

Companion to tests/test_null_robustness.py (same rationale: the driver
regenerates fixtures between rounds, and today's data contains none of these
shapes). The round-6 sweep this suite descends from found four divergences,
all fixed: q30/q31/q37 threw DIVIDE_BY_ZERO under Spark's default ANSI mode
for token-less documents (now an explicit NULL/drop, stated on both
engines), and q148's unrounded percentile-cut grid could tie a rounded
signal value exactly, flipping a rank count by one between engines (both
grids now quantized to 6 decimals).
"""

from __future__ import annotations

import pytest

from _parity import assert_engine_parity, make_fixture_dir, open_views
from flink_adcom_spark.registry import get

# The four queries that diverged before the boundary hardening, plus
# sentinels covering ratio/division, percentile, decimal-sum, and sampling
# idioms over the planted shapes.
QUERIES = [
    "q30_token_stats",
    "q31_quality_score",
    "q37_repetition_ratio",
    "q148_signal_fusion",
    # sentinels
    "q128_token_chunks",
    "q147_value_concentration",
    "q71_value_percentiles",
    "q78_value_deciles",
    "q20_tumbling_hourly",
    "q40_exact_dedup",
    "q114_quality_gate",
    "q152_weighted_sample",
    # CCNet LM family (round 12): NULL/empty/unicode text must drop or fold
    # identically through the bigram extraction, the <unk> mapping joins,
    # and the seeded FIM splits
    "q241_ccnet_lm_score",
    "q245_fim_samples",
]

_TABLE_SQL = {
    "documents": """SELECT doc_id,
        CASE WHEN doc_id % 50 = 0 THEN ''
             WHEN doc_id % 50 = 25 THEN '   '
             ELSE text END AS text,
        lang, source,
        CASE WHEN doc_id % 50 = 0 THEN 0
             WHEN doc_id % 50 = 25 THEN 3
             ELSE n_chars END AS n_chars FROM '{src}'""",
    "events": """SELECT event_id, ts, user_id, event_type,
        CASE WHEN event_id % 60 = 7 THEN 0.0
             WHEN event_id % 45 = 3 THEN -value
             ELSE value END AS value,
        props FROM '{src}'""",
}


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    return make_fixture_dir(tmp_path_factory, "edgedata", _TABLE_SQL)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = open_views(edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_parity_with_boundary_values(name, spark, edge_dir, edge_duck):
    assert_engine_parity(get(name), spark, edge_dir, edge_duck, name)
