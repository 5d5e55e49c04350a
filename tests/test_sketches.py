"""Sketch queries carry a bound-check gate contract (exact twin + boolean
bound columns hashed by the external oracle); these tests assert the same
properties directly, plus tighter in-repo tolerances."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.registry import get
from flink_adcom_spark.tables import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = get("q70_approx_distinct_users").build(spark, sf_dir).collect()
    assert rows
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["within_bound"], r
        assert r["exact_users"] == exact[r["event_type"]], r


def test_percentiles_bracket_exact(spark, sf_dir):
    rows = get("q71_value_percentiles").build(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    for r in rows:
        assert r["p50_in_bound"] and r["p95_in_bound"] and r["p99_in_bound"], r
        vals = sorted(
            x["value"] for x in ev.filter(F.col("event_type") == r["event_type"]).collect()
        )
        # exact interpolated percentiles emitted for the oracle must bracket
        # the neighborhood of the true rank
        for col, q in (("exact_p50", 0.5), ("exact_p95", 0.95), ("exact_p99", 0.99)):
            lo = vals[max(0, int(q * len(vals)) - 2)]
            hi = vals[min(len(vals) - 1, int(q * len(vals)) + 2)]
            assert lo <= r[col] <= hi, (r["event_type"], col, r[col], lo, hi)


def test_salted_count_equals_plain(spark, sf_dir):
    from flink_adcom_spark.operators.skew import salted_count

    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["cnt"]
        for r in salted_count(ev, ["event_type"], F.col("event_id"), 16).collect()
    }
    want = {r["event_type"]: r["count"] for r in ev.groupBy("event_type").count().collect()}
    assert got == want


def test_salted_distinct_equals_plain(spark, sf_dir):
    from flink_adcom_spark.operators.skew import salted_count_distinct

    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["n_distinct"]
        for r in salted_count_distinct(ev, ["event_type"], "user_id", 16).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert got == want


def test_sketch_rollup_merge_is_lossless(spark, sf_dir):
    """The union-merged per-day sketches must estimate EXACTLY what a single
    pass over the raw rows estimates (HLL union is deterministic and
    lossless w.r.t. the sketch), and both must sit within the error bound
    of the exact distinct count — now emitted as in-plan gate booleans."""
    rows = get("q96_sketch_rollup").build(spark, sf_dir).collect()
    assert rows
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["merge_lossless"], r
        assert r["within_bound"], r
        assert r["exact_users"] == exact[r["event_type"]], r


def test_cms_never_undercounts_and_is_bounded(spark, sf_dir):
    from flink_adcom_spark.registry import get

    rows = get("q127_cms_heavy_hitters").build(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["no_undercount"] for r in rows)
    assert all(r["within_bound"] for r in rows)


def test_cms_probe_absent_key_estimates_zero(spark):
    """A key none of whose buckets were touched must come back est=0, not
    disappear from the probe result."""
    from pyspark.sql import functions as F

    from flink_adcom_spark.operators.cms import cms_build, cms_probe

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    sketch = cms_build(df, "k")
    # probe keys incl. one never seen; with only 2 built keys most of the
    # 1024-bucket rows are empty, so an absent key usually misses entirely
    probes = spark.createDataFrame([(1,), (2,), (999_999_999,)], "k long")
    got = {r["k"]: r["est"] for r in cms_probe(sketch, probes, "k").collect()}
    assert set(got) == {1, 2, 999_999_999}
    assert got[1] >= 2 and got[2] >= 1
    assert got[999_999_999] >= 0  # present with a (possibly zero) estimate


def test_cms_grouped_sketches_are_isolated(spark):
    """With group_cols, each group's sketch counts ONLY its own rows: a key
    heavy in group A must not inflate its estimate in group B."""
    from flink_adcom_spark.operators.cms import cms_build, cms_probe

    rows = [("A", 7)] * 50 + [("B", 7)] + [("B", 8)] * 3
    df = spark.createDataFrame(rows, "g string, k long")
    sketch = cms_build(df, "k", group_cols=("g",))
    probes = spark.createDataFrame(
        [("A", 7), ("B", 7), ("B", 8)], "g string, k long"
    )
    got = {
        (r["g"], r["k"]): r["est"]
        for r in cms_probe(sketch, probes, "k", group_cols=("g",)).collect()
    }
    assert got[("A", 7)] >= 50
    # B's estimate of key 7 is bounded by B's own tiny sketch, not A's 50
    assert 1 <= got[("B", 7)] <= 4
    assert 3 <= got[("B", 8)] <= 4


def test_cms_probe_rejects_reserved_est_column(spark):
    """The probe output carries the estimate as 'est'; a keys frame that
    already has an 'est' column would yield duplicate/ambiguous output
    columns, so the operator refuses loudly instead."""
    import pytest

    from flink_adcom_spark.operators.cms import cms_build, cms_probe

    base = spark.createDataFrame([("a",)], ["k"])
    sketch = cms_build(base, "k")
    probes = spark.createDataFrame([("a", 1)], ["k", "est"])
    with pytest.raises(ValueError, match="'est'"):
        cms_probe(sketch, probes, "k")


def test_cms_rollup_materialize_requires_checkpoint(spark, tmp_path):
    """Applied-epoch markers key on batch_id, whose monotonicity across
    restarts only holds with a checkpoint — an uncheckpointed restart
    resets ids to 0 and stale markers would silently DROP new batches. The
    job must therefore refuse checkpoint=None up front."""
    import pytest

    from flink_adcom_spark.streaming import jobs

    with pytest.raises(ValueError, match="checkpointLocation"):
        jobs.streaming_cms_rollup_materialize(
            spark, str(tmp_path / "feed"), str(tmp_path / "out")
        )
