"""combine / adCombine — API parity with the reference's novel operator.

Reference surface (SURVEY.md §2.1):
  - `PreAggregateFunction<K,V,IN,OUT>` UDF contract with
    `V addInput(@Nullable V value, IN input)` and
    `void collect(Map<K,V> buffer, Collector<OUT> out)`
    (flink-core/.../functions/PreAggregateFunction.java:17-38)
  - `DataStream.combine(fn, intervalMs)` (static flush interval) and
    `DataStream.adCombine(fn[, intervalMs])` (controller-driven), default
    500 ms (flink-streaming-java/.../DataStream.java:1400-1436)
  - Runtime: per-subtask HashMap bundle, flushed downstream on a
    processing-time timer (PreAggregateProcTimeStreamAbstractOperator.java:
    28-212).

Spark-first mapping — three tiers, fastest first:

1. **Declarative tier (use this whenever the fold is algebraic).** Catalyst
   already plans every `groupBy(keys).agg(...)` as
   HashAggregate(partial) -> Exchange -> HashAggregate(final): the partial
   stage IS the reference's combiner, with hash-map bundling, spill, and
   whole-stage codegen. `combine()` below is therefore a thin, documented
   alias; in streaming, the flush interval is the micro-batch trigger.
   Everything in SURVEY.md §2.3 fits this tier.

2. **Generic batch tier** (`combine_generic`): arbitrary PreAggregateFunction
   folds (e.g. the top-N Double[] accumulator, SURVEY.md A8) via
   applyInPandas — Arrow-batched, one pandas group per key. The fold runs
   AFTER a shuffle of raw rows, so it is strictly worse than tier 1 at scale;
   it exists for API parity with folds Catalyst can't express.

3. **Generic streaming tier** (`ad_combine_stream`, streaming/adcombine.py):
   applyInPandasWithState with a processing-time timeout — the same
   bundle-map + timer-flush semantics as the reference operator, with the
   flush interval adjustable by the controller (streaming/controller.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any, Generic, TypeVar

from pyspark.sql import Column, DataFrame

K = TypeVar("K")
V = TypeVar("V")
IN = TypeVar("IN")
OUT = TypeVar("OUT")


class PreAggregateFunction(Generic[K, V, IN, OUT]):
    """Parity contract with the reference UDF
    (PreAggregateFunction.java:28-34). Rows are plain dicts."""

    def add_input(self, value: V | None, row: IN) -> V:
        """Fold one input row into the per-key bundle value (None on first)."""
        raise NotImplementedError

    def key_of(self, row: IN) -> K:
        """Bundle key for an input row (reference extracts field 0 of the
        output type via KeySelectorUtil.java:114-126; we make it explicit)."""
        raise NotImplementedError

    def collect(self, buffer: dict[K, V]) -> Iterable[OUT]:
        """Emit downstream rows from a full bundle (called on flush)."""
        raise NotImplementedError


def combine(
    df: DataFrame,
    keys: Sequence[str | Column],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tier-1 combine: declarative keyed aggregation.

    Semantically identical to reference `DataStream.combine(fn, t)` followed
    by `keyBy(...).reduce(...)` for algebraic folds — Catalyst inserts the
    partial (map-side) aggregate automatically, so the "combiner" needs no
    user code and no flush-interval tuning in batch. Kept as a named operator
    so pipelines read like the reference's and so the plan contract
    (partial agg before exchange) has a single place to be asserted/tested.
    """
    return df.groupBy(*keys).agg(*aggs)


def combine_generic(
    df: DataFrame,
    keys: Sequence[str],
    fn: PreAggregateFunction,
    output_schema: str,
) -> DataFrame:
    """Tier-2 combine: arbitrary fold via applyInPandas (Arrow-batched).

    Runs fn.add_input over each key group and fn.collect on the single-key
    bundle, exactly the reference's addInput/collect contract
    (PreAggregateFunction.java:28-34) minus the timer (batch = one bundle).

    Scale note: this shuffles raw rows (the fold is opaque to Catalyst), so
    it must only be used for folds tier 1 cannot express. Prefer rewriting
    the fold as builtin aggs/windows when possible.
    """
    import pandas as pd

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL contract: every missing value reaches the fold as None, never
        # NaN/NaT. Two reasons: (a) Arrow hands a NULL-keyed group to pandas
        # as NaN, and NaN != NaN, so raw to_dict rows would open a NEW buffer
        # entry per row (one bogus single-row "group" each) instead of
        # folding the NULL group once; (b) NaN payloads silently poison
        # order-dependent arithmetic (max(1.0, nan)=1.0 but max(nan, 1.0)=
        # nan), whereas None forces the fold to DECIDE its NULL semantics —
        # the bundled folds below skip None inputs, matching SQL aggregates.
        pdf = pdf.astype(object).where(pd.notnull(pdf), None)
        buffer: dict[Any, Any] = {}
        for row in pdf.to_dict("records"):
            k = fn.key_of(row)
            buffer[k] = fn.add_input(buffer.get(k), row)
        return pd.DataFrame(list(fn.collect(buffer)))

    return df.groupBy(*keys).applyInPandas(run_group, schema=output_schema)


# --- reference example folds, reproduced for parity tests --------------------


class CountPreAggregate(PreAggregateFunction):
    """Reference TaxiRideCountPreAggregateFunction.java:11-28."""

    def __init__(self, key: str = "driver_id"):
        self.key = key

    def key_of(self, row):
        return row[self.key]

    def add_input(self, value, row):
        return 1 if value is None else value + 1

    def collect(self, buffer):
        for k, v in buffer.items():
            yield {"key": k, "cnt": v}


class TopNDistancePreAggregate(PreAggregateFunction):
    """Reference TaxiRideDistanceTopNPreAggregate.java:167-206: bundle keeps
    the N largest distances per key in a bounded sorted list."""

    def __init__(self, n: int = 10, key: str = "driver_id", value: str = "distance_km"):
        self.n, self.key, self.value = n, key, value

    def key_of(self, row):
        return row[self.key]

    def add_input(self, value, row):
        arr = [] if value is None else value
        v = row[self.value]
        if v is None:  # SQL semantics: a NULL distance is not a distance
            return arr
        arr.append(float(v))
        arr.sort(reverse=True)
        return arr[: self.n]

    def collect(self, buffer):
        for k, arr in buffer.items():
            for rank, d in enumerate(arr, start=1):
                yield {"key": k, "rnk": rank, "distance_km": d}


class MaxPreAggregate(PreAggregateFunction):
    """Reference TaxiRideMaxPassengerPreAggregateFunction.java:11-29."""

    def __init__(self, key: str = "driver_id", value: str = "passenger_cnt"):
        self.key, self.value = key, value

    def key_of(self, row):
        return row[self.key]

    def add_input(self, value, row):
        v = row[self.value]
        if v is None:  # SQL MAX ignores NULL inputs
            return value
        return v if value is None else max(value, v)

    def collect(self, buffer):
        # an all-NULL group keeps a None accumulator -> max_val NULL, the
        # SQL MAX result for that group
        for k, v in buffer.items():
            yield {"key": k, "max_val": v}


class AvgPreAggregate(PreAggregateFunction):
    """Reference TaxiRidePassengerSumAndCountPreAggregateFunction.java:11-40:
    the bundle carries (sum, count); division happens only at collect — the
    exact semantics the reference's every-merge-divide reducer only reaches
    on its final emission (SURVEY.md A4)."""

    def __init__(self, key: str = "driver_id", value: str = "passenger_cnt"):
        self.key, self.value = key, value

    def key_of(self, row):
        return row[self.key]

    def add_input(self, value, row):
        v = row[self.value]
        if v is None:  # SQL AVG ignores NULL inputs
            return value
        s, c = value if value is not None else (0.0, 0)
        return (s + float(v), c + 1)

    def collect(self, buffer):
        # an all-NULL group keeps a None accumulator -> avg NULL / count 0,
        # the SQL AVG/COUNT(col) result for that group
        for k, acc in buffer.items():
            if acc is None:
                yield {"key": k, "avg_val": None, "cnt": 0}
            else:
                s, c = acc
                yield {"key": k, "avg_val": s / c, "cnt": c}
