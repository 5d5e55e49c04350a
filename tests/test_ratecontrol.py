"""Runtime rate-swap (reference DataRateListener.java:12-120): the input rate
changes mid-run through the control file — no restart anywhere — and the
AdCom controller adapts the flush interval in BOTH directions: up under the
overload the higher rate causes, back down after the rate drops."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from flink_adcom_spark.sources.ratecontrol import (
    DataRateFile,
    VariableRateFeeder,
    variable_words_stream,
)
from flink_adcom_spark.streaming.adaptive import SelfPacedAdaptiveRunner, report_to_df
from flink_adcom_spark.streaming.controller import BandController

LOW_RATE = 100
HIGH_RATE = 6000
PER_ROW_S = 0.0005  # emulated per-row aggregation cost (deterministic load)


def test_feeder_applies_rate_file_mid_run(tmp_path):
    """The feeder itself honors a mid-run control-file change (the
    DataRateListener contract), without any consumer involved."""
    rf = DataRateFile(str(tmp_path / "datarate.txt"), default_rate=50)
    feeder = VariableRateFeeder(str(tmp_path / "spool"), rf, tick_s=0.1).start()
    try:
        time.sleep(0.6)
        low_written = feeder.rows_written
        rf.write_rate(5000)
        time.sleep(0.6)
        high_written = feeder.rows_written - low_written
    finally:
        feeder.stop()
    assert low_written > 0
    # ~5 rows/tick before vs ~500 after: the swap must be clearly visible
    assert high_written > 10 * max(1, low_written)


def test_controller_adapts_to_rate_swap_both_directions(spark, tmp_path):
    """One run, three phases (low -> high -> low rate), asserting >= 1
    interval UP-step during the high phase and >= 1 DOWN-step after the
    drop, with every decision logged to the controller table."""
    rf = DataRateFile(str(tmp_path / "datarate.txt"), default_rate=LOW_RATE)
    rf.write_rate(LOW_RATE)
    feeder = VariableRateFeeder(str(tmp_path / "spool"), rf, tick_s=0.3).start()

    runner = SelfPacedAdaptiveRunner(
        controller=BandController(interval_ms=600),
        decision_period_s=1.0,
        hist_window_s=3.0,  # short horizon so phase changes surface fast
    )

    def process(batch_df, _bid):
        # keyed aggregation of the RAW micro-batch (the combine surface),
        # plus a row-proportional cost so load tracks the INPUT rate — a
        # complete-mode aggregate sink would only ever see the 64-word
        # output table, hiding the rate change entirely.
        n = batch_df.count()
        batch_df.groupBy("word").count().collect()
        time.sleep(n * PER_ROW_S)

    raw = variable_words_stream(spark, str(tmp_path / "spool"))
    name = f"rswap_{uuid.uuid4().hex[:8]}"
    q = (
        raw.writeStream
        .foreachBatch(runner.paced(process))
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def wait_until(cond, timeout_s):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if cond():
                return True
            time.sleep(0.3)
        return False

    try:
        # phase 1: low rate — let the stream settle (any decision)
        assert wait_until(lambda: runner.report.batches_observed >= 2, 30)
        base_interval = runner.controller.interval_ms

        # phase 2: step the rate UP mid-run -> overload -> interval rises
        rf.write_rate(HIGH_RATE)
        n_dec = len(runner.report.decisions)
        # wait for a clear rise (>= 2 steps above base) so the phase-3
        # denominator is large enough to read as idle under a loaded JVM
        assert wait_until(
            lambda: runner.controller.interval_ms >= base_interval + 200, 60
        ), f"no up-step: {runner.report.decisions[n_dec:]}"
        peak_interval = runner.controller.interval_ms

        # phase 3: step the rate back DOWN mid-run -> idle -> interval falls
        rf.write_rate(LOW_RATE)
        assert wait_until(
            lambda: runner.controller.interval_ms < peak_interval, 60
        ), f"no down-step from {peak_interval}: {runner.report.decisions}"
    finally:
        q.stop()
        feeder.stop()

    ups = [d for d in runner.report.decisions if d.changed and ("above" in d.reason or "overload" in d.reason)]
    downs = [d for d in runner.report.decisions if d.changed and "below" in d.reason]
    assert ups and downs, runner.report.decisions
    # the decision log is a queryable table (the reference's MQTT state topic)
    log = report_to_df(spark, runner.report)
    assert log.filter(F.col("changed")).count() >= 2
