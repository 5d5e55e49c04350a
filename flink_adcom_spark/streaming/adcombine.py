"""ad_combine_stream — the generic stateful pre-aggregation operator.

Tier-3 of the combine API (operators/combine.py): for folds Catalyst's partial
aggregation cannot express, this reproduces the reference operator's exact
runtime shape (PreAggregateProcTimeStreamAbstractOperator.java:28-212):

    per-key bundle state  <-  HashMap<K,V> bundle           (.java:46,67)
    fold on every row     <-  processElement -> addInput    (.java:117-128)
    timed flush + clear   <-  proc-time timer -> collect    (.java:136-185)

implemented over applyInPandasWithState with ProcessingTimeTimeout: state
holds the bundle value per key; every micro-batch folds that key's new rows
(Arrow-batched); when the flush interval elapses the bundle is emitted
downstream and cleared. The flush interval is the adCombine knob the
controller tunes (streaming/controller.py).

Semantics note (matches the reference): flush timing changes WHEN partial
results move downstream, never their sum — a downstream final aggregation of
the emitted deltas equals the batch result regardless of interval. The
differential test asserts exactly that.

Spark 4 upgrade path (env-gated): `transformWithStateInPandas` is the
modern API for this operator (typed ValueState + explicit timer registry +
RocksDB provider) and maps 1:1 onto this contract — handleInputRows = the
fold, handleExpiredTimer = the flush. It is NOT used here because its
driver worker imports google.protobuf, which this container lacks
(STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE verified empirically);
applyInPandasWithState has no such dependency.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .controller import DEFAULT_INTERVAL_MS


def ad_combine_stream(
    stream_df: DataFrame,
    keys: list[str],
    fold: Callable[[Any, "object"], Any],
    emit: Callable[[tuple, Any], list[dict]],
    output_schema: str,
    state_schema: str = "bundle string",
    interval_ms: int = DEFAULT_INTERVAL_MS,
    serialize=None,
    deserialize=None,
) -> DataFrame:
    """Bundle-fold-flush over a keyed stream.

    fold(value_or_None, pandas_rows) -> new bundle value (vectorized fold over
        one micro-batch's rows for the key — the Arrow-era addInput).
    emit(key_tuple, bundle_value) -> list of output row dicts (collect()).
    serialize/deserialize: bundle <-> state row (default: repr/eval-free JSON).
    """
    import json

    import pandas as pd

    ser = serialize or (lambda v: json.dumps(v))
    de = deserialize or (lambda s: json.loads(s))

    # The state row is (bundle, __flush_deadline): state_schema declares the
    # SINGLE serialized-bundle field (enforced — a multi-field schema would
    # desync from the fixed-width tuples written below and fail deep inside
    # the Arrow worker with an opaque unpack error; pack composite bundles
    # through serialize/deserialize instead), and the operator appends the
    # flush deadline it maintains.
    if "," in state_schema:
        raise ValueError(
            "state_schema declares exactly one serialized-bundle field; got "
            f"{state_schema!r}. Pack composite bundles via serialize/deserialize."
        )
    full_state_schema = f"{state_schema}, __flush_deadline long"

    def fn(key, pdf_iter, state: GroupState):
        import time as _time

        if state.hasTimedOut:
            bundle_s, _deadline = state.get
            state.remove()
            out = emit(key, de(bundle_s))
            yield pd.DataFrame(out)
            return
        # Spark CLEARS and re-arms the processing-time timeout on every data
        # invocation for the key, so a continuously-hot key would never time
        # out if the countdown restarted each batch. The deadline therefore
        # lives IN STATE: it is fixed when the bundle opens, the timeout is
        # re-armed only with the REMAINING time, and if the deadline has
        # already passed when data arrives the bundle is flushed inline —
        # the reference's timer fires every interval regardless of traffic
        # (PreAggregateProcTimeStreamAbstractOperator.java:136-185).
        now_ms = int(_time.time() * 1000)
        if state.exists:
            bundle_s, deadline = state.get
            value = de(bundle_s)
        else:
            value, deadline = None, now_ms + interval_ms
        for pdf in pdf_iter:
            value = fold(value, pdf)
        if now_ms >= deadline:
            state.remove()
            yield pd.DataFrame(emit(key, value))
            return
        state.update((ser(value), deadline))
        state.setTimeoutDuration(max(1, deadline - now_ms))
        yield pd.DataFrame([])

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=full_state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def count_fold(value, pdf):
    """Reference TaxiRideCountPreAggregateFunction.java:11-28, vectorized."""
    return (value or 0) + len(pdf)


def count_emit(key, value):
    return [{"driver_id": int(key[0]), "cnt_delta": int(value)}]


def make_topn_fold(value_col: str, n: int = 10):
    """Reference TaxiRideDistanceTopNPreAggregate.java:167-206: the bundle is
    a fixed-size descending array of the N largest values; addInput insert-
    sorts, the merge keeps the N largest of both sides. Vectorized: fold a
    whole micro-batch's column, then truncate."""

    def fold(value, pdf):
        merged = sorted((value or []) + [float(x) for x in pdf[value_col]], reverse=True)
        return merged[:n]

    return fold


def topn_emit(key, value):
    """Flush the bundle as one row per rank (reference emits the array;
    rows are the relational rendering)."""
    return [
        {"driver_id": int(key[0]), "rnk": i + 1, "value": v}
        for i, v in enumerate(value or [])
    ]
