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
    interval UP-step during the high phase and, after the drop, FULL
    convergence back to the 50 ms floor (the reference decrease branch,
    PreAggregateControllerService.java:126-174 + the floor clamp in
    PreAggregateProcTimeListener.java:23) — with the SAME query running
    throughout (no-restart path: runId must not change), and every decision
    logged to the controller table."""
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
        run_id = q.runId  # changes iff the query restarts from checkpoint

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

        # phase 3: step the rate back DOWN mid-run -> idle -> the interval
        # descends (decrease branch). The literal 50 ms floor is NOT
        # reachable under the real engine — the paced signal includes the
        # per-batch fixed engine cost (the AdCom amortization target) — and
        # FULL re-convergence to the phase-1 equilibrium is load-dependent:
        # the r13 full-suite flake's captured trace showed a correct
        # monotone descent that legitimately outlived the 90 s wait under a
        # loaded JVM. Assert the decrease-branch BEHAVIOR instead (two
        # monotone descent steps after the swap — the r13 verdict's
        # re-assertion); full floor convergence is pinned by the
        # simulated-clock test below, where batch cost is controlled.
        rf.write_rate(LOW_RATE)
        n_dec3 = len(runner.report.decisions)

        def descent_ok() -> bool:
            changed = [
                d.interval_ms
                for d in runner.report.decisions[n_dec3:]
                if d.changed
            ]
            vals = [peak_interval] + changed
            n_desc = sum(1 for a, b in zip(vals, vals[1:]) if b < a)
            # ADVICE r14: two descent steps alone would pass a controller
            # that descends twice then stalls far above equilibrium —
            # additionally require a NET descent of >= 200 ms below the
            # true post-swap peak (the mirror of the phase-2 rise check)
            return n_desc >= 2 and min(vals) <= max(vals) - 200

        assert wait_until(descent_ok, 90), (
            f"no 2-step/200ms net descent from {peak_interval}: "
            f"{runner.report.decisions}"
        )
        # the whole descent happened IN-FLIGHT: same run, never restarted
        assert q.isActive and q.runId == run_id
    finally:
        q.stop()
        feeder.stop()

    ups = [d for d in runner.report.decisions if d.changed and ("above" in d.reason or "overload" in d.reason)]
    downs = [d for d in runner.report.decisions if d.changed and "below" in d.reason]
    assert ups and downs, runner.report.decisions
    # the decision log is a queryable table (the reference's MQTT state topic)
    log = report_to_df(spark, runner.report)
    assert log.filter(F.col("changed")).count() >= 2


def test_selfpaced_converges_to_floor_after_load_drop():
    """The reference decrease branch all the way down
    (PreAggregateControllerService.java:126-174 + the 50 ms floor clamp of
    PreAggregateProcTimeListener.java:23), on the NO-RESTART runner under a
    simulated clock: heavy batches push the interval up; when per-batch cost
    collapses, every decision steps the interval down until it sits exactly
    at the floor — and holds there (clamped, no oscillation). Deterministic:
    the injected clock drives pacing, the decision cadence, and the signal
    histogram window alike."""
    t = [0.0]

    def clock() -> float:
        return t[0]

    def sleep(s: float) -> None:
        t[0] += max(0.0, s)

    runner = SelfPacedAdaptiveRunner(
        controller=BandController(interval_ms=200),
        decision_period_s=1.0,
        clock=clock,
        sleep=sleep,
        hist_window_s=1.0,
    )
    cost_ms = [400.0]  # heavy: utilization >= 100% at any interval <= 400

    def process(_df, _bid) -> None:
        t[0] += cost_ms[0] / 1000.0

    fn = runner.paced(process)

    for i in range(40):  # phase 1: overload -> interval rises until the
        # 400 ms cost is in-band (400/700 = 57%) — the increase branch
        fn(None, i)
        if runner.controller.interval_ms >= 700:
            break
    peak = runner.controller.interval_ms
    assert peak >= 700, runner.report.decisions

    cost_ms[0] = 5.0  # phase 2: load drops two orders of magnitude
    for i in range(200):  # descent: below-band big-steps down to the clamp
        fn(None, 1000 + i)
        if runner.controller.interval_ms == runner.controller.floor_ms:
            break
    assert runner.controller.interval_ms == runner.controller.floor_ms, (
        peak,
        runner.report.decisions,
    )
    downs = [
        d for d in runner.report.decisions if d.changed and "below" in d.reason
    ]
    assert downs, runner.report.decisions

    at_floor = runner.controller.interval_ms
    for i in range(20):  # phase 3: the clamp holds — no further change
        fn(None, 2000 + i)
    assert runner.controller.interval_ms == at_floor == runner.controller.floor_ms
    assert all(
        d.interval_ms >= runner.controller.floor_ms for d in runner.report.decisions
    )
