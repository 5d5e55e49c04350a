"""Approximate (sketch) aggregates: HyperLogLog distinct + approximate
quantiles.

These are the scale path for Q2-style distinct queries: at 100 TB an exact
distinct is a full dedup shuffle, while approx_count_distinct ships one HLL
sketch per partition per key (KBs) with ~2% error. The reference itself ships
an approximate distinct (its combiner overcounts across bundles — SURVEY.md
A5); ours carries a principled error bound instead.

Sketch ESTIMATES are engine-specific by construction (DuckDB's
approx_count_distinct uses a different HLL seed/width), so the estimates
themselves can never hash-match a DuckDB oracle. Instead each query here
carries a VERIFIABLE CONTRACT: it computes the exact answer in the same plan,
emits `exact_*` columns plus boolean `within_bound` columns (sketch error
inside its published bound), and the oracle restates the exact side with
literal TRUE for the bounds. A sketch whose error escapes its bound emits
FALSE and the driver's value-hash goes red — a full hash-match gate, not a
rows-only check. tests/test_sketches.py additionally bounds the error at
tighter tolerances in-repo.

The exact twin inside each plan is the verification harness for test-scale
runs; at 100 TB a user runs only the sketch side (see each docstring's scale
note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "q70_approx_distinct_users",
    "SELECT event_type, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
    "TRUE AS within_bound "
    "FROM events GROUP BY event_type",
    tags=("events", "sketch", "distinct"),
)
def q70_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event_type (rsd=2%), gated by a bound-check
    contract: the plan also computes the exact distinct and emits
    within_bound = |approx - exact| <= max(0.10 * exact, 5) — five standard
    errors of the rsd=0.02 sketch plus small-cardinality slack. The oracle
    asserts TRUE; a bound escape hash-mismatches.

    Scale note: the exact twin is the verification harness only. At 100 TB
    run just the sketch side — one KB-sized HLL per partition per key vs a
    full dedup shuffle for the exact answer."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(0.10 * F.col("exact_users"), F.lit(5.0))
            ).alias("within_bound"),
        )
    )


@query(
    "q71_value_percentiles",
    "SELECT event_type, "
    "quantile_cont(value, 0.5) AS exact_p50, "
    "quantile_cont(value, 0.95) AS exact_p95, "
    "quantile_cont(value, 0.99) AS exact_p99, "
    "TRUE AS p50_in_bound, TRUE AS p95_in_bound, TRUE AS p99_in_bound "
    # value IS NOT NULL symmetric with the Spark builder: quantile_cont
    # skips NULLs implicitly, but the builder's re-rank COUNT(*) would
    # otherwise count NULL-value rows into the rank target
    "FROM events WHERE value IS NOT NULL GROUP BY event_type",
    tags=("events", "sketch", "quantile"),
)
def q71_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type (GK sketch, accuracy
    10000 -> deterministic rank error <= n/10000), gated by a bound-check
    contract stated on RANKS (GK's actual guarantee — the returned value is
    an order statistic, so a value-interval bound would be scale-fragile in
    small groups where adjacent samples sit further apart than the rank
    tolerance): the plan re-ranks each approx value against the group
    (broadcast of <= n_types rows back onto events) and emits
    pXX_in_bound = rank-interval of approx overlaps p*n +- (n/10000 + 2).
    The oracle restates the exact interpolated percentiles (quantile_cont
    shares Spark percentile's rank = p*(n-1) interpolation) and asserts the
    bounds TRUE.

    Scale note: exact percentiles buffer each group's values; the GK sketch
    is the unbounded-scale path — the exact twin and the re-rank pass are
    the verification harness."""
    ps = [0.5, 0.95, 0.99]
    ev = (
        load_table(spark, sf_dir, "events")
        # symmetric with the oracle: the re-rank pass's COUNT(*) must count
        # exactly the rows the percentile functions rank
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", ps, 10000).alias("apx"),
        F.percentile("value", F.array(*[F.lit(p) for p in ps])).alias("ex"),
    )
    # one extra pass: 1-based rank interval [cnt_lt+1, cnt_le] of each approx
    # value within its group, vs target rank p*n with slack n/accuracy + 2
    ranked = (
        ev.join(F.broadcast(agg.select("event_type", "apx")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            *[
                F.sum((F.col("value") < F.col("apx")[i]).cast("long")).alias(f"lt{i}")
                for i in range(len(ps))
            ],
            *[
                F.sum((F.col("value") <= F.col("apx")[i]).cast("long")).alias(f"le{i}")
                for i in range(len(ps))
            ],
        )
    )
    out = agg.join(ranked, "event_type")
    slack = F.col("n") / 10000 + 2
    cols = [F.col("event_type")]
    cols += [
        F.col("ex")[i].alias(f"exact_p{int(p * 100)}") for i, p in enumerate(ps)
    ]
    cols += [
        (
            (F.col(f"le{i}") >= p * F.col("n") - slack)
            & (F.col(f"lt{i}") + 1 <= p * F.col("n") + slack)
        ).alias(f"p{int(p * 100)}_in_bound")
        for i, p in enumerate(ps)
    ]
    return out.select(*cols)


@query(
    "q72_exact_percentiles",
    "SELECT event_type, "
    "quantile_cont(value, 0.25) AS p25, "
    "quantile_cont(value, 0.5) AS p50, "
    "quantile_cont(value, 0.95) AS p95 "
    "FROM events GROUP BY event_type",
    tags=("events", "quantile"),
)
def q72_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per event_type (the oracle-checkable
    twin of q71's sketch): Spark `percentile` and DuckDB `quantile_cont`
    share the rank = p*(n-1) linear-interpolation definition.

    Scale note: exact percentiles buffer each group's values — fine for
    bounded group cardinality; q71's GK sketch is the unbounded-scale path."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
    )


@query(
    "q96_sketch_rollup",
    "SELECT event_type, "
    "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
    "TRUE AS merge_lossless, TRUE AS within_bound "
    "FROM events GROUP BY event_type",
    tags=("events", "sketch", "rollup", "distinct"),
)
def q96_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (the hypertable pattern): persistable per-day
    HLL sketches of distinct users, union-merged into the per-type total
    WITHOUT touching the raw events again.

    This is how a 100 TB serving layer answers "distinct users over any date
    range": the base rollup stores one binary sketch per (day, type) — KBs —
    and range queries fold hll_union_agg over the selected days, an
    O(days*types) aggregation instead of an O(rows) dedup shuffle.

    Gate contract (full hash-match): emits the exact distinct plus two
    booleans the oracle asserts TRUE — merge_lossless (rolled-up estimate ==
    direct single-pass estimate, EXACT equality: HLL union is lossless
    w.r.t. the sketch) and within_bound (rollup estimate within
    max(0.10 * exact, 5) of exact; default lgConfigK=12 -> ~1.6% standard
    error, so 0.10 is >5 sigma). The exact twin is the verification harness;
    at 100 TB only the sketch side runs."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("rollup_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return rolled.join(direct, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("rollup_users") == F.col("direct_users")).alias("merge_lossless"),
        (
            F.abs(F.col("rollup_users") - F.col("exact_users"))
            <= F.greatest(0.10 * F.col("exact_users"), F.lit(5.0))
        ).alias("within_bound"),
    )


# --- Count-min sketch heavy hitters (build/probe: operators/cms.py) -----------
from ..operators.cms import CMS_WIDTH  # noqa: E402

CMS_TOPK = 20
# overcount tolerance: 2e*N/w per key; P[escape] <= (2e)^-depth ~ 4e-5 per key
CMS_BOUND_FACTOR = 2 * 2.718281828459045 / CMS_WIDTH


@query(
    "q127_cms_heavy_hitters",
    f"""
    SELECT user_id, COUNT(*) AS exact_cnt,
           TRUE AS no_undercount, TRUE AS within_bound
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id LIMIT {CMS_TOPK}
    """,
    tags=("events", "sketch", "heavy-hitters"),
)
def q127_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, gated on the top-20
    heaviest users: the sketch is d x w counters (d=6 hash rows of
    w=1024 buckets, xxhash64 seeded by the row index), built with ONE
    shuffle whose distinct-key count is d*w regardless of data size — the
    mergeable, bounded-memory path to "how often did key k occur" at 100 TB,
    where an exact per-key count of a high-cardinality key space is a full
    shuffle of the keys.

    Gate contract (full hash-match, q70-style): the plan computes exact
    counts for the top-k keys, probes the sketch for the same keys, and
    emits two booleans the oracle asserts TRUE — no_undercount (CMS
    estimates never undercount: every occurrence of k increments all d of
    its counters) and within_bound (overcount <= 2e*N/w; by Markov +
    d-way independence the escape probability per key is under (2e)^-d
    ~ 4e-5, deterministic for a fixed dataset). The exact twin is the
    verification harness; at scale only the sketch and the probe run.

    Scale shape: the sketch build is a map-side-combinable groupBy over
    d*w keys (shuffle volume O(partitions * d * w), independent of rows);
    the probe broadcasts the d*w-row sketch to the candidate keys; the
    grand total N rides the same sketch (sum of any one hash row) rather
    than a second scan."""
    from ..operators.cms import cms_build, heavy_hitter_audit

    ev = load_table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id")
    return heavy_hitter_audit(sketch, ev, "user_id", CMS_TOPK, CMS_BOUND_FACTOR)


GROUPED_CMS_TOPK = 5


@query(
    "q139_cms_heavy_hitters_by_type",
    f"""
    SELECT event_type, user_id, exact_cnt,
           TRUE AS no_undercount, TRUE AS within_bound
    FROM (
      SELECT event_type, user_id, COUNT(*) AS exact_cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY COUNT(*) DESC, user_id) AS rnk
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      GROUP BY event_type, user_id
    ) t WHERE rnk <= {GROUPED_CMS_TOPK}
    """,
    tags=("events", "sketch", "heavy-hitters", "grouped"),
)
def q139_cms_heavy_hitters_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group count-min heavy hitters: one independent d x w sketch PER
    event_type (cms_build's group_cols — the counter build is still one
    map-side-combinable shuffle, now over |types| * d * w keys), probed for
    each type's top-5 users with the q127 contract booleans computed
    against that type's own N.

    This is the hypertable form of frequency sketching: a serving layer
    stores one small counter table per (partition, type) and answers
    "top users for type X" without touching raw events — the same
    incremental-merge shape q131 proves exact for the ungrouped sketch.
    Gate contract identical to q127, per group."""
    from ..operators.cms import cms_build, heavy_hitter_audit

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sketch = cms_build(ev, "user_id", group_cols=("event_type",))
    return heavy_hitter_audit(
        sketch, ev, "user_id", GROUPED_CMS_TOPK, CMS_BOUND_FACTOR,
        group_cols=("event_type",),
    )


ROBUST_Z = 3.5  # Iglewicz-Hoaglin modified z-score cutoff


@query(
    "q141_robust_outliers",
    f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, med,
             quantile_cont(abs(e.value - med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, med
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN 0.6745 * abs(e.value - m.med) > {ROBUST_Z} * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(ANY_VALUE(m.med), 6) AS median_value,
           ROUND(ANY_VALUE(m.mad), 6) AS mad_value
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("events", "quality", "robust-stats"),
)
def q141_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per event type: the modified z-score
    0.6745*|v - median| / MAD > 3.5 (Iglewicz-Hoaglin) — the
    skew-insensitive alternative to mean/stddev trims for long-tailed value
    columns. Emits per-type counts plus the median/MAD themselves.

    Engine parity: median and MAD are interpolated percentiles of identical
    doubles (the q72-proven quantile_cont <-> percentile equivalence,
    applied twice), the cutoff comparison multiplies rather than divides
    (no div-by-zero when MAD = 0, and both engines compare identical
    products), and the reported stats round to 6dp.

    Scale shape: two percentile passes over the value column (each an
    event_type-keyed aggregate; exact percentiles buffer per-group values —
    fine for bounded group counts, q71's GK sketch is the unbounded path)
    plus one counting pass with the 5-row med/MAD table broadcast."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"))
    )
    out = (
        0.6745 * F.abs(F.col("value") - F.col("med")) > ROBUST_Z * F.col("mad")
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # WHEN/OTHERWISE mirrors the oracle's CASE: an all-NULL value
            # group must report 0 outliers, not NULL
            F.sum(F.when(out, 1).otherwise(0)).alias("n_outliers"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad_value"),
        )
    )
