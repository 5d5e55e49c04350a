"""BandController unit tests: transitions must mirror the reference law
(PreAggregateControllerService.java:126-174; constants BASELINE.md)."""

from __future__ import annotations

from flink_adcom_spark.streaming.controller import (
    BandController,
    Decision,
    Reference,
    SignalsHistogram,
    SignalsSummary,
    TriggerControllerListener,
    DEFAULT_INTERVAL_MS,
    MIN_INTERVAL_MS,
)


def sig(mean, p75=None):
    return SignalsSummary(mean=mean, p75=p75 if p75 is not None else mean)


def test_defaults_match_reference():
    c = BandController()
    assert c.interval_ms == 500  # DataStream.java:1429-1431
    assert c.floor_ms == 50  # PreAggregateProcTimeListener.java:23
    assert c.ref == Reference(40.0, 65.0, 30.0, 85.0)  # ControllerService.java:60


def test_in_band_holds():
    c = BandController()
    d = c.decide([sig(50.0)])
    assert not d.changed and d.interval_ms == DEFAULT_INTERVAL_MS


def test_above_band_steps_up_100():
    c = BandController()
    assert c.decide([sig(70.0)]).interval_ms == 600


def test_beyond_outer_band_steps_up_200():
    c = BandController()
    assert c.decide([sig(90.0)]).interval_ms == 700


def test_overload_any_subtask_steps_200():
    # any subtask mean or p75 >= 100 -> overload (ControllerService.java:126-134)
    c = BandController()
    assert c.decide([sig(50.0), sig(55.0, p75=101.0)]).interval_ms == 700


def test_below_band_steps_down_100():
    c = BandController()
    assert c.decide([sig(35.0)]).interval_ms == 400


def test_below_outer_band_steps_down_200():
    c = BandController()
    assert c.decide([sig(10.0)]).interval_ms == 300


def test_floor_50ms():
    c = BandController(interval_ms=100)
    d = c.decide([sig(5.0)])
    assert d.interval_ms == MIN_INTERVAL_MS
    d2 = c.decide([sig(5.0)])
    assert d2.interval_ms == MIN_INTERVAL_MS and not d2.changed


def test_no_signals_holds():
    c = BandController()
    d = c.decide([])
    assert not d.changed and d.reason == "no-signals"


def test_convergence_from_overload():
    """Sustained overload walks the interval up; recovery walks it back to
    the band and holds — the loop the AdCom paper demonstrates."""
    c = BandController()
    for _ in range(3):
        c.decide([sig(120.0)])
    assert c.interval_ms == 500 + 3 * 200
    for _ in range(4):
        c.decide([sig(35.0)])
    assert c.interval_ms == 1100 - 4 * 100
    d = c.decide([sig(50.0)])
    assert not d.changed


def test_histogram_sliding_window():
    t = [0.0]
    h = SignalsHistogram(window_s=120, clock=lambda: t[0])
    for i in range(4):
        t[0] = i * 30.0
        h.add(10.0 * (i + 1))
    s = h.summary()
    assert s.mean == 25.0 and s.vmax == 40.0
    t[0] = 121.0  # first sample (t=0) falls out of the window
    h.add(50.0)
    s = h.summary()
    assert s.vmin == 20.0 and s.vmax == 50.0


def test_listener_decides_on_period_and_computes_utilization():
    t = [0.0]
    c = BandController(interval_ms=500)
    lis = TriggerControllerListener(
        c, trigger_ms_getter=lambda: c.interval_ms, period_s=120, clock=lambda: t[0]
    )
    # 600ms batches on a 500ms trigger = 120% utilization -> overload
    for i in range(4):
        t[0] = i * 30.0
        assert lis.observe_progress(600.0) is None  # within period: no decision
    t[0] = 121.0
    d = lis.observe_progress(600.0)
    assert d is not None and d.interval_ms == 700 and "overload" in d.reason


def test_listener_underutilized_shrinks():
    t = [0.0]
    c = BandController(interval_ms=500)
    lis = TriggerControllerListener(
        c, trigger_ms_getter=lambda: c.interval_ms, period_s=120, clock=lambda: t[0]
    )
    for i in range(4):
        t[0] = i * 30.0
        lis.observe_progress(100.0)  # 20% utilization
    t[0] = 121.0
    d = lis.observe_progress(100.0)
    assert d.interval_ms == 300  # below outer band -> -200
