"""AdaptiveQueryRunner integration: under genuine overload (trigger far below
batch duration) the controller must step the interval up and the runner must
restart the query with the new trigger — the AdCom adaptation loop end-to-end
on a live rate-source stream."""

from __future__ import annotations

import uuid

from flink_adcom_spark.sources.replay import words_stream
from flink_adcom_spark.streaming.adaptive import AdaptiveQueryRunner
from flink_adcom_spark.streaming.controller import BandController


def test_runner_adapts_under_overload(spark, tmp_path):
    from pyspark.sql import functions as F

    name = f"adapt_{uuid.uuid4().hex[:8]}"

    def start_query(trigger_ms: int, ckpt: str):
        agg = words_stream(spark, rows_per_second=2000).groupBy("word").agg(
            F.count("*").alias("cnt")
        )
        return (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{trigger_ms} milliseconds")
            .start()
        )

    runner = AdaptiveQueryRunner(
        start_query,
        controller=BandController(interval_ms=50),  # local batches take ~100ms+ -> overload
        decision_period_s=3.0,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    report = runner.run_for(15.0)

    assert report.batches_observed > 0
    assert report.decisions, "controller never decided"
    assert report.restarts >= 1, f"no adaptation happened: {report}"
    assert report.intervals[0] == 50
    assert report.intervals[-1] > 50  # stepped up under overload
    # query kept producing across restarts (checkpointed state carried over)
    n = spark.sql(f"SELECT COUNT(*) c FROM {name}").collect()[0]["c"]
    assert n > 0
