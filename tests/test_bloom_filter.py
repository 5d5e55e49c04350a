"""Runtime bloom-filter join pruning — the 100 TB shuffle-join companion to
broadcast pruning: when a dimension side is filtered but too big to broadcast,
Catalyst can build a bloom filter over its join keys and push a might_contain
probe into the fact-table scan, cutting shuffle input before the sort-merge
join. Local data sits under the default size thresholds, so the test lowers
them to prove the rewrite fires; on a real cluster the defaults gate it to
genuinely large scans."""

from __future__ import annotations

import pytest

from flink_adcom_spark.tables import load_table

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "512MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle-join path
}


@pytest.fixture
def bloom_spark(spark):
    old = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    for k, v in BLOOM_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_filter_injects_bloom_probe(bloom_spark, sf_dir):
    from pyspark.sql import functions as F

    orders = load_table(bloom_spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    li = load_table(bloom_spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy().agg(
        F.sum("l_quantity").alias("q")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan or "bloomfilter" in plan.lower(), plan[:4000]

    # and the rewrite must not change the answer
    spark = bloom_spark
    expected = (
        li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey)
        .groupBy()
        .agg(F.sum("l_quantity"))
        .collect()[0][0]
    )
    assert joined.collect()[0]["q"] == expected
