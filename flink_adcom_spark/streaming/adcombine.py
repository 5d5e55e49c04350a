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

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            (bundle_s,) = state.get
            state.remove()
            out = emit(key, de(bundle_s))
            yield pd.DataFrame(out)
            return
        value = de(state.get[0]) if state.exists else None
        for pdf in pdf_iter:
            value = fold(value, pdf)
        state.update((ser(value),))
        state.setTimeoutDuration(interval_ms)
        yield pd.DataFrame([])

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
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
