"""Storage-layout contracts: partition pruning skips directories; bucketed
tables join with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.operators.storage import bucketed_join, write_bucketed, write_partitioned
from flink_adcom_spark.plans import explain
from flink_adcom_spark.queries.fares import fares
from flink_adcom_spark.queries.rides import rides


def test_partition_pruning_skips_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_type")
    from flink_adcom_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    # pruned scan: only the purchase directory is listed
    plan = explain.formatted_plan(back)
    assert "PartitionFilters" in plan and "purchase" in plan
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """The q13 rides⋈fares join over bucketed layout: zero shuffles."""
    # warehouse dir is a static conf; isolate via a database with an explicit
    # tmp location instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS stor_test LOCATION '{tmp_path / 'wh'}'")
    spark.sql("DROP TABLE IF EXISTS stor_test.rides_b")
    spark.sql("DROP TABLE IF EXISTS stor_test.fares_b")
    write_bucketed(
        rides(spark, sf_dir).select("ride_id", "driver_id", "distance_km"),
        "stor_test.rides_b",
        ["ride_id"],
        num_buckets=8,
    )
    write_bucketed(
        fares(spark, sf_dir).select("ride_id", "total_fare"),
        "stor_test.fares_b",
        ["ride_id"],
        num_buckets=8,
    )
    # disable auto-broadcast so the test exercises the co-located sort-merge
    # path (at 100 TB neither side would broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "stor_test.rides_b", "stor_test.fares_b", ["ride_id"])
        assert explain.num_exchanges(joined) == 0, explain.formatted_plan(joined)
        n = joined.count()
        assert n == rides(spark, sf_dir).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS stor_test.rides_b")
        spark.sql("DROP TABLE IF EXISTS stor_test.fares_b")
        spark.sql("DROP DATABASE IF EXISTS stor_test")


def test_compact_reduces_file_count(spark, sf_dir, tmp_path):
    """A fragmented dataset (64 tiny files) compacts to the byte-derived
    target count with identical contents."""
    import glob

    from flink_adcom_spark.operators.storage import compact
    from flink_adcom_spark.tables import load_table

    frag = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 64

    n = compact(spark, frag, target_file_mb=128)
    files = glob.glob(f"{frag}/*.parquet")
    assert len(files) == n  # tiny dataset -> 1 file at 128 MB target
    assert n == 1
    back = spark.read.parquet(frag)
    assert back.count() == ev.count()
    assert {r["event_id"] for r in back.select("event_id").collect()} == {
        r["event_id"] for r in ev.select("event_id").collect()
    }


def test_upsert_partitions_touches_only_present_partitions(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite: re-writing one event_type's rows leaves
    every other partition byte-for-byte in place."""
    from pyspark.sql import functions as F

    from flink_adcom_spark.operators.storage import upsert_partitions, write_partitioned
    from flink_adcom_spark.tables import load_table

    out = str(tmp_path / "by_type")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, out, ["event_type"])
    before_purchase = spark.read.parquet(out).filter(F.col("event_type") == "purchase").count()
    before_click = spark.read.parquet(out).filter(F.col("event_type") == "click").count()

    # re-ingest only 'click', halved (simulating a corrected replay)
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("event_id") % 2 == 0))
    upsert_partitions(clicks, out, ["event_type"])

    after = spark.read.parquet(out)
    assert after.filter(F.col("event_type") == "click").count() == clicks.count()
    assert after.filter(F.col("event_type") == "click").count() < before_click
    # untouched partition intact
    assert after.filter(F.col("event_type") == "purchase").count() == before_purchase


def test_zorder_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout: after zorder_write(events, [user_id, value], 16), a
    narrow range predicate on EITHER column must touch a small fraction of
    the files (footer min/max skipping needs exactly this row-to-file
    clustering), while a plain hash layout spreads every predicate over
    ~all files. This is the multi-dimension guarantee hive partitioning
    (one dim) and linear sort (first dim only) cannot give simultaneously."""
    from pyspark.sql import functions as F

    from flink_adcom_spark.operators.storage import zorder_write
    from flink_adcom_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    zpath = str(tmp_path / "events_z")
    hpath = str(tmp_path / "events_hash")
    zorder_write(ev, zpath, ["user_id", "value"], n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(hpath)

    lo_u, hi_u = 10, 17        # ~5% of the user range
    lo_v, hi_v = 100.0, 120.0  # narrow value band

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .filter(cond)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    n_z_files = (
        spark.read.parquet(zpath).select(F.input_file_name()).distinct().count()
    )
    assert n_z_files >= 12  # range partitioner may merge a few empty ranges

    u_cond = (F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u)
    v_cond = (F.col("value") >= lo_v) & (F.col("value") <= hi_v)
    zu, zv = files_touched(zpath, u_cond), files_touched(zpath, v_cond)
    hu, hv = files_touched(hpath, u_cond), files_touched(hpath, v_cond)

    # hash layout: every file holds every key range -> predicates touch ~all
    assert hu >= 15 and hv >= 15, (hu, hv)
    # z layout: each dimension's narrow band lives in a minority of files
    assert zu <= n_z_files // 2, (zu, n_z_files)
    assert zv <= n_z_files // 2, (zv, n_z_files)
    # and the layout rewrite must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == ev.count()


def test_shard_export_balance_and_idempotence(spark, sf_dir, tmp_path):
    """The q180 writer: (a) every shard directory exists and token mass is
    balanced across shards (max/min within 3x of the ideal share on the tiny
    SF — boundaries quantize at doc granularity), (b) a second write is
    byte-identical in content: same per-shard membership, order, and
    manifest digests, (c) the returned manifest equals the q180 gate
    relation exactly."""
    import os

    from flink_adcom_spark.operators.storage import shard_export_write
    from flink_adcom_spark.queries.text import (
        N_EXPORT_SHARDS,
        q180_shard_export,
    )
    from flink_adcom_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "export")
    manifest1 = {r["shard_id"]: r.asDict() for r in shard_export_write(docs, out).collect()}

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == N_EXPORT_SHARDS
    assert set(manifest1) == set(range(N_EXPORT_SHARDS))

    toks = {s: m["n_tokens"] for s, m in manifest1.items()}
    total = sum(toks.values())
    ideal = total / N_EXPORT_SHARDS
    assert max(toks.values()) <= 3 * ideal, toks
    assert min(toks.values()) >= ideal / 3, toks

    # written rows round-trip: membership matches the manifest, order is the
    # permutation order within each shard
    back = spark.read.parquet(out)
    counts = {r["shard_id"]: r["n"] for r in back.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {s: m["n_docs"] for s, m in manifest1.items()}

    # idempotence: overwrite in place, manifests identical
    manifest2 = {r["shard_id"]: r.asDict() for r in shard_export_write(docs, out).collect()}
    assert manifest1 == manifest2

    # the writer's manifest IS the q180 gate relation
    gate = {r["shard_id"]: r.asDict() for r in q180_shard_export(spark, sf_dir).collect()}
    assert gate == manifest1


def test_zrange_write_is_deterministic_and_prunes(spark, sf_dir, tmp_path):
    """zorder_write_zrange: (a) rewriting the same input yields the IDENTICAL
    file assignment (per-file membership digest — the property sampled
    repartitionByRange cannot give), (b) a narrow probe on either single
    dimension touches <= 50% of files (the Z-order selectivity contract,
    same bar as test_zorder_clusters_both_dimensions)."""
    from flink_adcom_spark.operators.storage import zorder_write_zrange
    from flink_adcom_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def layout(path):
        zorder_write_zrange(ev, path, ["user_id", "value"], prefix_bits=4)
        rows = spark.read.parquet(path).collect()
        files = {}
        for r in rows:
            files.setdefault(r["zfile"], set()).add(r["event_id"])
        return files

    f1 = layout(str(tmp_path / "z1"))
    f2 = layout(str(tmp_path / "z2"))
    assert f1 == f2

    stats = (
        spark.read.parquet(str(tmp_path / "z1"))
        .groupBy("zfile")
        .agg(
            F.min("user_id").alias("mnu"), F.max("user_id").alias("mxu"),
            F.min("value").alias("mnv"), F.max("value").alias("mxv"),
        )
        .collect()
    )
    n = len(stats)
    u_lo, u_hi = 37, 56
    v_lo, v_hi = 100.0, 150.0
    touched_u = sum(1 for r in stats if r["mnu"] <= u_hi and r["mxu"] >= u_lo)
    touched_v = sum(1 for r in stats if r["mnv"] <= v_hi and r["mxv"] >= v_lo)
    assert touched_u <= n / 2, (touched_u, n)
    assert touched_v <= n / 2, (touched_v, n)
