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


def cms_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Estimate each keys[key]'s frequency: broadcast the sketch onto the
    candidate keys and take the min over the d hash rows. With group_cols,
    each candidate probes ITS group's sketch. Preserves the other columns
    of `keys` AND row multiplicity (a per-row id keys the regrouping, so a
    probe row that legitimately appears twice yields two output rows — a
    groupBy over the key columns would silently collapse them). Internal
    working columns are __cms_-prefixed, so a keys frame already carrying
    j/bkt columns (e.g. anything the CMS machinery itself produced) probes
    cleanly. LEFT join + coalesce(0): a key none of whose buckets were ever
    touched estimates 0 (a never-seen key must come back as zero, not
    vanish from the result)."""
    if "est" in keys.columns:
        raise ValueError(
            "cms_probe emits the estimate as a column named 'est', but the "
            "keys frame already carries an 'est' column — rename it before "
            "probing (the output would otherwise hold duplicate/ambiguous "
            "'est' columns)"
        )
    probes = (
        keys.withColumn("__cms_rid", F.monotonically_increasing_id())
        .select("*", F.explode(_js()).alias("__cms_j"))
        .withColumn(
            "__cms_bkt", F.pmod(F.xxhash64(key, "__cms_j"), F.lit(CMS_WIDTH))
        )
    )
    cond = (probes["__cms_j"] == sketch["j"]) & (probes["__cms_bkt"] == sketch["bkt"])
    for g in group_cols:
        cond = cond & (probes[g] == sketch[g])
    joined = probes.join(F.broadcast(sketch), cond, "left")
    return (
        joined.groupBy("__cms_rid")
        .agg(
            F.min(F.coalesce(sketch["c"], F.lit(0))).alias("est"),
            *[F.first(probes[c]).alias(c) for c in keys.columns],
        )
        .select(*keys.columns, "est")
    )


def heavy_hitter_audit(
    sketch: DataFrame,
    ev: DataFrame,
    key: str,
    topk: int,
    bound_factor: float,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared gate tail (q127/q131/q139): exact top-k keys — per group when
    group_cols is set — N from hash row 0 of the (group's) sketch, probe
    estimates, and the two CMS contract booleans (no_undercount;
    overcount <= bound_factor * N of that group).

    NULL keys or group values are dropped up front: an equi-join never
    matches NULL, so a NULL group would silently vanish from the Spark side
    while a SQL oracle's window keeps it — callers' oracles must filter the
    same way (WHERE key IS NOT NULL AND group IS NOT NULL)."""
    for col in (key, *group_cols):
        ev = ev.filter(F.col(col).isNotNull())
    total = (
        sketch.filter(F.col("j") == 0)
        .groupBy(*group_cols)
        .agg(F.sum("c").alias("n_total"))
    )
    counts = ev.groupBy(*group_cols, key).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy(F.desc("exact_cnt"), key)
        top = (
            counts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= topk)
            .drop("rnk")
        )
    else:
        top = counts.orderBy(F.desc("exact_cnt"), key).limit(topk)
    est = cms_probe(sketch, top, key, group_cols)
    joined = (
        est.join(F.broadcast(total), list(group_cols))
        if group_cols
        else est.crossJoin(F.broadcast(total))
    )
    return joined.select(
        *group_cols,
        key,
        "exact_cnt",
        (F.col("est") >= F.col("exact_cnt")).alias("no_undercount"),
        (
            (F.col("est") - F.col("exact_cnt"))
            <= F.lit(bound_factor) * F.col("n_total")
        ).alias("within_bound"),
    )
