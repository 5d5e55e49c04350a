"""Count-min sketch as a relation: d x w counters built with one
map-side-combinable aggregation.

The sketch is the (j, bkt, c) table — d hash rows of w buckets. Build cost
is one shuffle whose distinct-key count is d*w regardless of data size;
merge is elementwise counter ADDITION, so incremental maintenance (see
streaming/jobs.py::streaming_cms_rollup_materialize) is exact: a sketch
summed from any batching of the stream is bit-identical to a single-pass
build. Probing min()s the d counters a key hashes to; estimates never
undercount and overcount by at most ~e*N/w with high probability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH, CMS_WIDTH = 6, 1024


def _js() -> Column:
    return F.array(*[F.lit(j) for j in range(CMS_DEPTH)])


def _bkt(key: str) -> Column:
    return F.pmod(F.xxhash64(key, "j"), F.lit(CMS_WIDTH)).alias("bkt")


def cms_build(df: DataFrame, key: str, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """(group_cols..., j, bkt, c) counter table over df[key]."""
    return (
        df.select(*group_cols, key, F.explode(_js()).alias("j"))
        .select(*group_cols, "j", _bkt(key))
        .groupBy(*group_cols, "j", "bkt")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_probe(sketch: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """Estimate each keys[key]'s frequency: broadcast the d*w-row sketch onto
    the candidate keys and take the min over the d hash rows. Preserves the
    other columns of `keys`."""
    probes = keys.select("*", F.explode(_js()).alias("j")).select(
        "*", _bkt(key)
    )
    other = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(sketch), ["j", "bkt"])
        .groupBy(*other)
        .agg(F.min("c").alias("est"))
    )
