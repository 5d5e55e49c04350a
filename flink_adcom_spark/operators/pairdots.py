"""Exact pair dot products via a once-per-row Arrow kernel (guide §4.2/§4.5).

The exact-cosine pair joins evaluate an interpreted HOF fold
(`aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)`) once
per candidate PAIR — ~90 us of CodegenFallback evaluation each, the largest
remaining executor cost of the similarity family (r14 measured it
irreducible by unrolling, pre-casting, and a per-pair mapInArrow kernel:
that prototype was bit-identical but transfer-bound, because both 64-double
vectors crossed the Arrow boundary once per pair, which costs what the fold
costs).

This operator restructures WHERE the vectors cross the boundary: the two
sides of the similarity join are COGROUPED on their blocking key (the LSH
bucket), so each vector crosses once per (row, probed bucket) instead of
once per pair — |pairs| x 128 doubles of transfer becomes
(|left| + |right|) x 64 per bucket — and the kernel computes the group's
full dot matrix in NumPy with the IDENTICAL left-fold addition chain:

    acc = zeros((nl, nr)); for i ascending: acc[j, k] += Q[j, i] * D[k, i]

Each acc element sees exactly ((0.0 + p0) + p1) + ... in index order —
np.float64 add/mul are IEEE-754 binary64, the same operations the JVM fold
performs, so dots are bit-identical by construction (the r14 prototype
proved this equivalence on all 180,470 q135 pairs; the oracle hash gate
re-proves it per round). Division and ROUND(..., 6) stay on the Spark side
(Spark's HALF_UP rounding is not NumPy's).

Scale shape: group volume is bounded by bucket occupancy (the derived-bits
contract pins expected occupancy at ~LSH_TARGET_BUCKET), bucket count grows
linearly with the corpus, and the cogroup shuffle carries each side once —
strictly fewer bytes than the equi-join it replaces, which shipped the same
rows and then re-evaluated the fold per joined pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def bucket_pair_dots(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    vec_left: str,
    vec_right: str,
    carry_left: list[str],
    carry_right: list[str],
    dot_col: str = "dot",
) -> DataFrame:
    """All (left, right) pairs within each bucket, with the exact fold dot.

    Emits one row per pair in each cogroup: the carried left columns, the
    carried right columns, and `dot_col` = the left-fold dot product of the
    two vector columns. Row multiset is identical to
    ``left.join(right, F.col(key_left) == F.col(key_right))`` + per-pair
    fold; only the execution strategy differs.
    """
    import numpy as np
    import pandas as pd

    lf = {f.name: f for f in left.schema.fields}
    rf = {f.name: f for f in right.schema.fields}
    out_schema = StructType(
        [lf[c] for c in carry_left]
        + [rf[c] for c in carry_right]
        + [StructField(dot_col, DoubleType(), False)]
    )
    out_cols = list(carry_left) + list(carry_right) + [dot_col]

    def kernel(lpdf: "pd.DataFrame", rpdf: "pd.DataFrame") -> "pd.DataFrame":
        nl, nr = len(lpdf), len(rpdf)
        if nl == 0 or nr == 0:
            return pd.DataFrame(columns=out_cols)
        q = np.stack(lpdf[vec_left].to_numpy())
        d = np.stack(rpdf[vec_right].to_numpy())
        acc = np.zeros((nl, nr))
        # ascending-i fold: per element the exact (((0 + p0) + p1) + ...)
        # chain of aggregate(zip_with(...)) — do NOT vectorize into a
        # matmul, whose pairwise/blocked summation changes the addition
        # order and drifts the low bits
        for i in range(q.shape[1]):
            acc += np.outer(q[:, i], d[:, i])
        data = {c: np.repeat(lpdf[c].to_numpy(), nr) for c in carry_left}
        for c in carry_right:
            data[c] = np.tile(rpdf[c].to_numpy(), nl)
        data[dot_col] = acc.ravel()
        return pd.DataFrame(data)

    return (
        left.groupBy(key_left)
        .cogroup(right.groupBy(key_right))
        .applyInPandas(kernel, schema=out_schema)
    )
