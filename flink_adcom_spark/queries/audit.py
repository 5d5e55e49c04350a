"""Data-quality audits: the expectation checks a pipeline runs before it
trusts a day's data (row counts, key uniqueness, null rates, range gaps).

Each audit is a handful of single-pass aggregates — at 100 TB the cost is
one scan per table with map-side partials, and the output is a few rows a
scheduler can alert on. The same checks run as post-conditions after every
ingest/compaction job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def _table_audit(df: DataFrame, name: str, key: str, anomaly) -> DataFrame:
    return df.agg(
        F.lit(name).alias("table_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key)).alias("n_distinct_keys"),
        F.sum(F.col(key).isNull().cast("long")).alias("n_null_keys"),
        # WHEN/OTHERWISE mirrors the oracle's CASE: an all-NULL anomaly
        # expression must report 0, not NULL
        F.sum(F.when(anomaly, 1).otherwise(0)).alias("n_anomalies"),
    )


@query(
    "q137_quality_expectations",
    """
    SELECT 'events' AS table_name, COUNT(*) AS n_rows,
           COUNT(DISTINCT event_id) AS n_distinct_keys,
           CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_keys,
           CAST(SUM(CASE WHEN ts IS NULL OR value IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_anomalies
    FROM events
    UNION ALL
    SELECT 'documents', COUNT(*), COUNT(DISTINCT doc_id),
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)
             AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'lineitem', COUNT(*), COUNT(DISTINCT l_orderkey),
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN l_quantity <= 0 OR l_extendedprice < 0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
    tags=("audit", "quality", "pipeline"),
)
def q137_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation audit over the three primary tables: row count, key
    cardinality, null keys, and a per-table anomaly rule (events: null
    ts/value; documents: empty text; lineitem: non-positive quantity or
    negative price). One scan per table, map-side-combined into a 3-row
    report — the post-condition a 100 TB ingest job asserts before
    publishing a partition."""
    ev = _table_audit(
        load_table(spark, sf_dir, "events"),
        "events",
        "event_id",
        F.col("ts").isNull() | F.col("value").isNull(),
    )
    docs = _table_audit(
        load_table(spark, sf_dir, "documents"),
        "documents",
        "doc_id",
        F.col("text").isNull() | (F.length("text") == 0),
    )
    li = _table_audit(
        load_table(spark, sf_dir, "lineitem"),
        "lineitem",
        "l_orderkey",
        (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") < 0),
    )
    return ev.unionAll(docs).unionAll(li)


@query(
    "q138_day_completeness",
    """
    WITH days AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM days),
    expected AS (
      SELECT CAST(unnest(range(lo::TIMESTAMP, hi::TIMESTAMP + INTERVAL 1 DAY,
                               INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT e.day, COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.n_users, 0) AS n_users,
           (d.day IS NULL) AS is_gap
    FROM expected e LEFT JOIN days d USING (day)
    """,
    tags=("audit", "completeness", "pipeline"),
)
def q138_day_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-completeness audit: every calendar day between the first
    and last event, with its event/user counts and a gap flag for days with
    NO data — the check that catches a silently-failed ingest before a
    backfill window closes.

    Scale shape: one day-keyed aggregate over the events scan (map-side
    combined, O(days) output), then the expected-day spine is generated
    from the 1-row min/max bounds with `sequence` and LEFT-joined — the
    spine is tiny (one row per day), so the join broadcasts; the raw table
    is never rescanned."""
    days = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
    bounds = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    expected = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return (
        expected.join(F.broadcast(days.withColumnRenamed("day", "d_day")),
                      F.col("day") == F.col("d_day"), "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.col("d_day").isNull().alias("is_gap"),
        )
    )


@query(
    "q142_referential_integrity",
    """
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_child,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'orders->customer', COUNT(*),
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'embeddings->documents', COUNT(*),
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM embeddings LEFT JOIN documents ON vec_id = doc_id
    UNION ALL
    SELECT 'supplier->nation', COUNT(*),
           CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
    """,
    tags=("audit", "integrity", "join", "pipeline"),
)
def q142_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts along every foreign-key
    edge the query suite depends on (lineitem->orders, orders->customer,
    embeddings->documents, supplier->nation). A nonzero orphan count means
    some join-based query silently drops or fabricates rows — this is the
    check that catches it at ingest instead.

    Scale shape: each edge is one LEFT join counting null parents. Parent
    sides here broadcast; at 100 TB the lineitem->orders edge degrades to a
    sort-merge join, which is exactly the plan the real queries pay — the
    audit costs what one join query costs, per edge."""

    def edge(child: DataFrame, parent: DataFrame, cond, name: str,
             hint_broadcast: bool = True) -> DataFrame:
        pk = parent.columns[0]
        p = F.broadcast(parent) if hint_broadcast else parent
        return child.join(p, cond, "left").agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col(pk).isNull().cast("long")).alias("n_orphans"),
        )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    supp = load_table(spark, sf_dir, "supplier").select("s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    return (
        # no broadcast hint on orders: a hard hint would override AQE and
        # ship a 100 TB-scale parent to every executor; the docstring's
        # sort-merge degradation only happens if AQE is left to choose
        edge(li, orders.select("o_orderkey"),
             F.col("l_orderkey") == F.col("o_orderkey"), "lineitem->orders",
             hint_broadcast=False)
        # customer scales with SF like orders — same posture, let AQE pick;
        # the hard hint stays only on genuinely fixed-size dims (nation,
        # documents-as-dimension)
        .unionAll(edge(orders.select("o_custkey"), cust,
                       F.col("o_custkey") == F.col("c_custkey"), "orders->customer",
                       hint_broadcast=False))
        .unionAll(edge(emb, docs,
                       F.col("vec_id") == F.col("doc_id"), "embeddings->documents"))
        .unionAll(edge(supp, nation,
                       F.col("s_nationkey") == F.col("n_nationkey"), "supplier->nation"))
    )


ANOM_WINDOW, ANOM_Z = 7, 3.0


@query(
    "q143_daily_anomaly",
    f"""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT day, cnt,
             CAST(SUM(cnt) OVER w AS BIGINT) AS s1,
             -- DECIMAL square: cnt*cnt overflows int64 near 3e9 events/day
             -- (Spark would wrap silently, DuckDB would raise); decimal is
             -- exact and order-independent like the integer sums
             CAST(SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
                  OVER w AS DOUBLE) AS s2,
             CAST(COUNT(*) OVER w AS BIGINT) AS n
      FROM days
      WINDOW w AS (ORDER BY day ROWS BETWEEN {ANOM_WINDOW} PRECEDING
                                         AND 1 PRECEDING)
    )
    SELECT day, cnt,
           ROUND(CAST(s1 AS DOUBLE) / n, 6) AS baseline,
           n >= 3 AND
           abs(cnt - CAST(s1 AS DOUBLE) / n) * sqrt(CAST(n - 1 AS DOUBLE))
             > {ANOM_Z} * sqrt(greatest(
                 s2 - CAST(s1 AS DOUBLE) * s1 / n, 0.0))
             AS is_anomaly
    FROM stats WHERE n >= 1
    """,
    tags=("audit", "timeseries", "anomaly"),
)
def q143_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection on the daily event count series: each day is
    compared against a trailing window of the prior 7 days; a day whose
    deviation exceeds 3 trailing standard deviations is flagged — the
    monitor that catches an ingest double-run or a silent upstream drop.

    Engine exactness: the trailing baseline is built from exact window
    sums (integer count/sum; DECIMAL sum-of-squares so the square cannot
    overflow int64 at 100 TB daily volumes — both immune to frame
    accumulation order); the z-comparison is rearranged to avoid
    division (|cnt - mean| * sqrt(n-1) > z * sqrt(n*var-ish form)), so both
    engines compare identical doubles and no epsilon is needed.

    Scale shape: the expensive part is the day rollup (map-side combined,
    O(days) rows); the window runs over the tiny aggregated series, so the
    single-partition frame is a non-issue at any corpus size."""
    from pyspark.sql import Window

    days = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("day").rowsBetween(-ANOM_WINDOW, -1)
    stats = days.select(
        "day",
        "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("s1"),
        F.sum(
            F.col("cnt").cast("decimal(19,0)") * F.col("cnt").cast("decimal(19,0)")
        ).over(w).cast("double").alias("s2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
    ).filter(F.col("n") >= 1)
    mean = F.col("s1").cast("double") / F.col("n")
    var_term = F.greatest(
        F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("n"),
        F.lit(0.0),
    )
    return stats.select(
        "day",
        "cnt",
        F.round(mean, 6).alias("baseline"),
        (
            (F.col("n") >= 3)
            & (
                F.abs(F.col("cnt") - mean) * F.sqrt((F.col("n") - 1).cast("double"))
                > ANOM_Z * F.sqrt(var_term)
            )
        ).alias("is_anomaly"),
    )


# --- q193: exact two-sample KS drift per source --------------------------------
# Feed-drift detection: the Kolmogorov-Smirnov statistic between each
# source's n_chars distribution and the REST of the corpus — the check a
# pipeline runs per upstream feed before mixing a new crawl batch in
# (distribution drift that q141's per-point outlier rules cannot see).
# Exact arithmetic: the ECDF difference is evaluated as the integer cross
# product |c_s * n_rest - c_rest * n_s| maximized over the value grid, with
# ONE division at the end (q152's integer-comparison discipline), so both
# engines agree bit-for-bit. The flag uses the classical two-sided critical
# value at alpha=0.05: 1.358 * sqrt((n_s + n_rest) / (n_s * n_rest)).
KS_ALPHA_C = "1.358"


@query(
    "q193_source_drift_ks",
    f"""
    WITH d AS (SELECT source, n_chars AS v FROM documents
               WHERE n_chars IS NOT NULL AND source IS NOT NULL),
    per AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM d GROUP BY 1, 2),
    grid AS (SELECT DISTINCT v FROM d),
    srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM d GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    gall AS (SELECT g.v,
                    CAST(SUM(SUM(COALESCE(p.cnt, 0)))
                         OVER (ORDER BY g.v) AS BIGINT) AS c_all
             FROM grid g LEFT JOIN per p ON p.v = g.v
             GROUP BY g.v),
    gs AS (SELECT s.source, g.v,
                  CAST(SUM(COALESCE(p.cnt, 0))
                       OVER (PARTITION BY s.source ORDER BY g.v) AS BIGINT)
                    AS c_s
           FROM srcs s CROSS JOIN grid g
           LEFT JOIN per p ON p.source = s.source AND p.v = g.v),
    diffs AS (SELECT gs.source,
                     MAX(ABS(CAST(gs.c_s AS HUGEINT) * (tot.n - srcs.n_s)
                             - CAST(gall.c_all - gs.c_s AS HUGEINT)
                               * srcs.n_s)) AS num
              FROM gs JOIN gall USING (v)
                      JOIN srcs USING (source) CROSS JOIN tot
              GROUP BY gs.source)
    SELECT d.source, s.n_s, (t.n - s.n_s) AS n_rest,
           ROUND(CAST(d.num AS DOUBLE)
                 / (CAST(s.n_s AS DOUBLE) * CAST(t.n - s.n_s AS DOUBLE)),
                 6) AS ks_stat,
           (CAST(d.num AS DOUBLE)
            / (CAST(s.n_s AS DOUBLE) * CAST(t.n - s.n_s AS DOUBLE))
            > {KS_ALPHA_C} * SQRT(CAST(t.n AS DOUBLE)
                                  / (CAST(s.n_s AS DOUBLE)
                                     * CAST(t.n - s.n_s AS DOUBLE)))) AS drifted
    FROM diffs d JOIN srcs s USING (source) CROSS JOIN tot t
    """,
    tags=("audit", "drift", "pipeline"),
)
def q193_source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift audit (module comment above): exact
    two-sample KS statistic of each source's n_chars ECDF against the rest
    of the corpus, flagged at the alpha=0.05 critical value.

    Scale shape: the grid is the DISTINCT value set of the drifting column
    (bounded by the column's range — document lengths — not corpus size),
    so the windows run over |sources| x |grid| rows; everything before them
    is one (source, v) count shuffle. At 100 TB the same plan holds with a
    quantile-sketch grid (percentile_approx cuts) swapped in for the exact
    distinct-value grid. Arithmetic holds too (ADVICE r10): the ECDF cross
    products c_s*(n-n_s) exceed int64 once both factors pass ~3e9 rows, so
    they are computed in 128-bit exact integers — DECIMAL(38,0) here (two
    decimal(19,0) factors -> capped (38,0) product; |c_s*(n-n_s)| < 8.5e37
    always fits), HUGEINT in the oracle — and the n_s*n_rest DENOMINATORS
    (which only feed double divisions) as double*double on both engines."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars").isNotNull() & F.col("source").isNotNull())
        .select("source", F.col("n_chars").alias("v"))
    )
    per = d.groupBy("source", "v").agg(F.count(F.lit(1)).alias("cnt"))
    grid = d.select("v").distinct()
    srcs = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_total = d.count()  # bounded: one scalar (the corpus row count)
    gall = (
        grid.join(per, "v", "left")
        .groupBy("v")
        .agg(F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("cv"))
        .withColumn(
            "c_all",
            F.sum("cv").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("v", "c_all")
    )
    gs = (
        srcs.select("source")
        .crossJoin(F.broadcast(grid))
        .join(per, ["source", "v"], "left")
        .withColumn(
            "c_s",
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).over(
                Window.partitionBy("source")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("source", "v", "c_s")
    )
    diffs = (
        gs.join(gall, "v")
        .join(F.broadcast(srcs), "source")
        .withColumn(
            "num",
            F.abs(
                F.col("c_s").cast("decimal(19,0)")
                * (F.lit(n_total) - F.col("n_s")).cast("decimal(19,0)")
                - (F.col("c_all") - F.col("c_s")).cast("decimal(19,0)")
                * F.col("n_s").cast("decimal(19,0)")
            ),
        )
        .groupBy("source")
        .agg(F.max("num").alias("num"))
    )
    out = diffs.join(F.broadcast(srcs), "source")
    n_rest = F.lit(n_total) - F.col("n_s")
    denom = F.col("n_s").cast("double") * n_rest.cast("double")
    ks = F.col("num").cast("double") / denom
    crit = float(KS_ALPHA_C) * F.sqrt(F.lit(float(n_total)) / denom)
    return out.select(
        "source",
        "n_s",
        n_rest.alias("n_rest"),
        F.round(ks, 6).alias("ks_stat"),
        (ks > crit).alias("drifted"),
    )


# --- q204: embedding-space drift per source (the q193 discipline on vectors) ---
# A feed can drift in EMBEDDING space while every scalar audit stays flat
# (same lengths, same languages — different content; e.g. a crawler that
# starts returning machine-translated boilerplate). The detector: quantize
# every vector to its q57 k-means cell, then per source compare the cell
# HISTOGRAM against the rest of the corpus by total-variation distance
#   TV(s) = (1/2) * SUM_c | c_s(c)/n_s - c_rest(c)/n_rest |
# evaluated exactly as integer cross products |c_s*(n-n_s) - (c_all-c_s)*n_s|
# (DECIMAL(38,0) here / HUGEINT in the oracle — the q193 overflow rule) with
# ONE double division at the end, so both engines agree bit-for-bit.
#
# The flag line is SAMPLE-SIZE-AWARE (a fixed threshold fires on pure
# sampling noise for small sources — measured: 25-vector sources reach
# TV ~ 0.32 on the unplanted corpus while 100-vector ones stay under 0.17):
#   crit(s) = sqrt( k * (1/n_s + 1/n_rest) )
# ~2x the Cauchy-Schwarz bound on E[TV] between two multinomial samples
# over k cells, so noise stays under it at every n while a genuinely moved
# source (mass relocated to its own cells, TV -> 1) clears it. k is the
# same engine-derived q57 value on both engines (_k_sql / derive_kmeans_k).


def _q204_oracle() -> str:
    from .similarity import KMEANS_ITERS, _k_sql, _kmeans_oracle_sql

    tv = (
        "CAST(d.tvnum AS DOUBLE)"
        " / (2 * CAST(s.n_s AS DOUBLE) * CAST(t.n - s.n_s AS DOUBLE))"
    )
    crit = (
        f"SQRT(CAST({_k_sql('embeddings')} AS DOUBLE)"
        " * (CAST(1 AS DOUBLE) / CAST(s.n_s AS DOUBLE)"
        " + CAST(1 AS DOUBLE) / CAST(t.n - s.n_s AS DOUBLE)))"
    )
    return f"""
    WITH assign AS ({_kmeans_oracle_sql(_k_sql(), KMEANS_ITERS)}),
    sv AS (SELECT d.source, a.vec_id, a.cluster
           FROM assign a JOIN documents d ON a.vec_id = d.doc_id
           WHERE d.source IS NOT NULL),
    per AS (SELECT source, cluster, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM sv GROUP BY 1, 2),
    cells AS (SELECT DISTINCT cluster FROM sv),
    srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM sv GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sv),
    call AS (SELECT cluster, CAST(SUM(cnt) AS BIGINT) AS c_all
             FROM per GROUP BY 1),
    gs AS (SELECT s.source, c.cluster,
                  CAST(COALESCE(p.cnt, 0) AS BIGINT) AS c_s
           FROM srcs s CROSS JOIN cells c
           LEFT JOIN per p ON p.source = s.source AND p.cluster = c.cluster),
    num AS (SELECT gs.source,
                   SUM(ABS(CAST(gs.c_s AS HUGEINT) * (tot.n - srcs.n_s)
                           - CAST(call.c_all - gs.c_s AS HUGEINT)
                             * srcs.n_s)) AS tvnum
            FROM gs JOIN call USING (cluster)
                    JOIN srcs USING (source) CROSS JOIN tot
            GROUP BY gs.source)
    SELECT d.source, s.n_s, (t.n - s.n_s) AS n_rest,
           ROUND({tv}, 6) AS tv_dist,
           ({tv} > {crit}) AS drifted
    FROM num d JOIN srcs s USING (source) CROSS JOIN tot t
    """


@query(
    "q204_embedding_drift_tv",
    _q204_oracle(),
    tags=("audit", "drift", "similarity", "pipeline"),
)
def q204_embedding_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source EMBEDDING-distribution drift audit (module comment above):
    exact total-variation distance between each source's k-means-cell
    histogram and the rest of the corpus, flagged at the sample-size-aware
    critical value sqrt(k*(1/n_s + 1/n_rest)) (module comment).
    Complements q193 (scalar ECDF drift) with the vector-space check a
    multimodal/RAG ingest runs per upstream feed; the planted proof
    (tests/test_planted_positives.py) rotates one source's vectors and
    asserts that source and ONLY that source is flagged.

    Scale shape: cell assignment rides the q57 relation (scan-side argmin
    against broadcast centroids); the histogram is one (source, cell)
    count shuffle with |sources| x k output; the TV fold runs on that
    bounded relation (cells cross sources ~ 20k rows at k=sqrt(N)) — no
    window, no pairwise work. Cross products are DECIMAL(38,0) (q193's
    128-bit rule), denominators double."""
    from .similarity import _emb_count, derive_kmeans_k, q57_kmeans

    k = derive_kmeans_k(_emb_count(spark, sf_dir))
    assign = q57_kmeans(spark, sf_dir)  # vec_id, cluster
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sv = (
        assign.join(docs, assign["vec_id"] == docs["doc_id"])
        .filter(F.col("source").isNotNull())
        .select("source", "vec_id", "cluster")
    )
    per = sv.groupBy("source", "cluster").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cells = sv.select("cluster").distinct()
    srcs = sv.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_total = sv.count()  # bounded: one scalar
    call = per.groupBy("cluster").agg(F.sum("cnt").alias("c_all"))
    gs = (
        srcs.select("source", "n_s")
        .crossJoin(F.broadcast(cells))
        .join(per, ["source", "cluster"], "left")
        .select(
            "source",
            "n_s",
            "cluster",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_s"),
        )
    )
    num = (
        gs.join(F.broadcast(call), "cluster")
        .withColumn(
            "term",
            F.abs(
                F.col("c_s").cast("decimal(19,0)")
                * (F.lit(n_total) - F.col("n_s")).cast("decimal(19,0)")
                - (F.col("c_all") - F.col("c_s")).cast("decimal(19,0)")
                * F.col("n_s").cast("decimal(19,0)")
            ),
        )
        .groupBy("source")
        .agg(F.sum("term").alias("tvnum"))
    )
    out = num.join(F.broadcast(srcs), "source")
    n_rest = F.lit(n_total) - F.col("n_s")
    denom = F.lit(2.0) * F.col("n_s").cast("double") * n_rest.cast("double")
    tv = F.col("tvnum").cast("double") / denom
    crit = F.sqrt(
        F.lit(float(k))
        * (
            F.lit(1.0) / F.col("n_s").cast("double")
            + F.lit(1.0) / n_rest.cast("double")
        )
    )
    return out.select(
        "source",
        "n_s",
        n_rest.alias("n_rest"),
        F.round(tv, 6).alias("tv_dist"),
        (tv > crit).alias("drifted"),
    )


# --- pre-flight shuffle diagnostics --------------------------------------------
# The two audits a pipeline runs BEFORE committing to a partitioning or a
# join at 100 TB: both are pure aggregate plans whose cost is one or two
# key-count shuffles, never the skewed/exploded operation they are sizing.
SKEW_TOP_K = 20  # keys reported by the skew profile
SKEW_TARGET_PARTITIONS = 32  # executor-parallelism the salt factor is sized for
EXPLOSION_TOP_K = 10  # keys reported by the join-explosion audit


@query(
    "q207_key_skew_profile",
    f"""
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events
               WHERE user_id IS NOT NULL GROUP BY user_id),
    tot AS (SELECT SUM(cnt) AS total FROM c),
    r AS (SELECT user_id, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
          FROM c)
    SELECT rnk, user_id, CAST(cnt AS BIGINT) AS cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
           CAST((cnt + (total + {SKEW_TARGET_PARTITIONS - 1})
                       // {SKEW_TARGET_PARTITIONS} - 1)
                // ((total + {SKEW_TARGET_PARTITIONS - 1})
                    // {SKEW_TARGET_PARTITIONS}) AS BIGINT) AS salt_factor
    FROM r CROSS JOIN tot WHERE rnk <= {SKEW_TOP_K}
    """,
    tags=("audit", "skew", "pipeline"),
)
def q207_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight key-skew profile for a planned shuffle on events.user_id:
    the top-{SKEW_TOP_K} keys by row count with their exact ppm share of
    the table and the SALT FACTOR a skew-routing stage (X2,
    operators/skew.py) should split them into — ceil(key rows / ideal
    partition rows) at {SKEW_TARGET_PARTITIONS}-way parallelism, all in
    exact integer arithmetic (cnt*1e6 fits int64 up to ~9e12 rows per key,
    far past any real hot key). salt_factor 1 = the key fits one ideal
    partition; >1 = pre-split it (or let AQE skew-join handle the join
    case). This is the one-aggregate query that decides between a plain
    hash shuffle and salting BEFORE the expensive job runs.

    Scale shape: one map-side-combined count per key, then a distributed
    top-k (TakeOrderedAndProject — no global sort, no single-task window;
    the oracle's ROW_NUMBER is restated as the rank within the top-k,
    which is identical by construction) plus a broadcast scalar total."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    top = c.orderBy(F.col("cnt").desc(), F.col("user_id")).limit(SKEW_TOP_K)
    tot = c.agg(F.sum("cnt").alias("total"))
    from pyspark.sql import Window

    # rank over the already-bounded top-k relation (<= SKEW_TOP_K rows),
    # NOT over the full key set — same numbers as the oracle's global
    # ROW_NUMBER restricted to rnk <= k
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id"))
    ideal = f"((total + {SKEW_TARGET_PARTITIONS - 1}) DIV {SKEW_TARGET_PARTITIONS})"
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w))
        .selectExpr(
            "rnk",
            "user_id",
            "CAST(cnt AS BIGINT) AS cnt",
            "CAST((cnt * 1000000) DIV total AS BIGINT) AS share_ppm",
            f"CAST((cnt + {ideal} - 1) DIV {ideal} AS BIGINT) AS salt_factor",
        )
    )


@query(
    "q208_join_explosion_audit",
    f"""
    WITH l AS (SELECT user_id, COUNT(*) AS nl FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    r AS (SELECT user_id, COUNT(*) AS nr FROM events
          WHERE event_type = 'purchase' GROUP BY user_id),
    k AS (SELECT l.user_id, nl, nr, nl * nr AS prod FROM l JOIN r USING (user_id)),
    tot AS (SELECT SUM(prod) AS total_out FROM k),
    rk AS (SELECT user_id, nl, nr, prod,
                  ROW_NUMBER() OVER (ORDER BY prod DESC, user_id) AS rnk
           FROM k)
    SELECT rnk, user_id, CAST(nl AS BIGINT) AS nl, CAST(nr AS BIGINT) AS nr,
           CAST(prod AS BIGINT) AS prod,
           CAST(prod * 1000000 // total_out AS BIGINT) AS share_ppm
    FROM rk CROSS JOIN tot WHERE rnk <= {EXPLOSION_TOP_K}
    """,
    tags=("audit", "join", "pipeline"),
)
def q208_join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-cardinality audit for the view x purchase user join
    (q84's shape): per shared key the EXACT output-row contribution
    nl * nr, top-{EXPLOSION_TOP_K} keys with their ppm share of the total
    join output — sum(nl*nr) is the true post-join row count, computed
    from two key-count aggregates WITHOUT materializing a single joined
    row. A key carrying >10% of the output is the fan-out a pipeline
    caps (or pre-aggregates per side) before running the real join; at
    100 TB this audit is the difference between discovering a 10^13-row
    explosion in a count query and discovering it as an executor OOM.

    Scale shape: two map-side-combined count aggregates, an equi-join on
    DISTINCT keys (cardinality = keys, not rows), a distributed top-k,
    and a broadcast scalar. Never quadratic."""
    ev = load_table(spark, sf_dir, "events")
    l = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nr"))
    )
    k = l.join(r, "user_id").select(
        "user_id", "nl", "nr", (F.col("nl") * F.col("nr")).alias("prod")
    )
    top = k.orderBy(F.col("prod").desc(), F.col("user_id")).limit(EXPLOSION_TOP_K)
    tot = k.agg(F.sum("prod").alias("total_out"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("prod").desc(), F.col("user_id"))
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w))
        .selectExpr(
            "rnk",
            "user_id",
            "CAST(nl AS BIGINT) AS nl",
            "CAST(nr AS BIGINT) AS nr",
            "CAST(prod AS BIGINT) AS prod",
            "CAST((prod * 1000000) DIV total_out AS BIGINT) AS share_ppm",
        )
    )


# --- q231: PSI drift per source (binned complement of q193's exact KS) --------------
PSI_BINS = 20  # fixed-width n_chars bins: bin = least(n_chars DIV 100, 19)
PSI_BIN_W = 100
PSI_THRESHOLD = "0.2"  # the standard PSI alert level (0.1 watch / 0.2 act)


@query(
    "q231_psi_drift",
    f"""
    WITH d AS (
      SELECT source, LEAST(n_chars // {PSI_BIN_W}, {PSI_BINS - 1}) AS bin
      FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
    ),
    cnts AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS a_cnt
             FROM d GROUP BY 1, 2),
    gl AS (SELECT bin, CAST(SUM(a_cnt) AS BIGINT) AS g_cnt FROM cnts GROUP BY 1),
    srcs AS (SELECT source, CAST(SUM(a_cnt) AS BIGINT) AS n_s FROM cnts GROUP BY 1),
    tot AS (SELECT CAST(SUM(g_cnt) AS BIGINT) AS n FROM gl),
    grid AS (SELECT s.source, s.n_s, g.bin
             FROM srcs s CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) g),
    terms AS (
      SELECT grid.source, grid.n_s, tot.n,
             (CAST(COALESCE(gl.g_cnt, 0) - COALESCE(c.a_cnt, 0) + 1 AS DOUBLE)
                / CAST(tot.n - grid.n_s + {PSI_BINS} AS DOUBLE)) AS p,
             (CAST(COALESCE(c.a_cnt, 0) + 1 AS DOUBLE)
                / CAST(grid.n_s + {PSI_BINS} AS DOUBLE)) AS q
      FROM grid
      LEFT JOIN cnts c ON c.source = grid.source AND c.bin = grid.bin
      LEFT JOIN gl ON gl.bin = grid.bin
      CROSS JOIN tot
    )
    SELECT source, n_s, (n - n_s) AS n_rest,
           ROUND(SUM((p - q) * ln(p / q)), 6) AS psi,
           ROUND({PSI_BINS} * (1.0 / CAST(n_s AS DOUBLE)
                 + 1.0 / CAST(n - n_s AS DOUBLE)), 6) AS psi_bias,
           SUM((p - q) * ln(p / q))
             - {PSI_BINS} * (1.0 / CAST(n_s AS DOUBLE)
                             + 1.0 / CAST(n - n_s AS DOUBLE))
             > {PSI_THRESHOLD} AS drifted
    FROM terms GROUP BY source, n_s, n
    """,
    tags=("audit", "drift", "pipeline"),
)
def q231_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's n_chars distribution
    against the REST of the corpus (the q193 pairing, so the two columns
    are directly comparable): PSI = sum over {PSI_BINS} fixed-width bins of
    (p - q) * ln(p / q) with Laplace-smoothed bin shares, flagged at the
    industry-standard 0.2 act level AFTER subtracting the first-order
    small-sample bias E[PSI | no drift] ~= B * (1/n_s + 1/n_rest) — without
    it a 25-doc source reads PSI ~0.85 from sampling noise alone and every
    small source false-alarms (both the raw psi and the bias ride along in
    the output so the reader sees which regime a flag came from). PSI is
    what a production monitor
    actually alerts on (bounded mergeable bin counts, comparable across
    sources of different sizes); q193's exact KS is the law those bins
    approximate — run together they separate "a few big bins moved" (PSI
    high, KS moderate) from "a subtle full-CDF shift" (KS high, PSI low).

    Engine exactness: bin counts are exact integers; each smoothed term is
    a pure double expression of those integers (ln agrees to <= 1 ulp
    across libm implementations), and the per-source sum spans {PSI_BINS}
    terms, so ROUND(..., 6) absorbs summation-order noise (the q136
    discipline).

    Scale shape: one (source, bin) count shuffle with map-side partials —
    after it everything is |sources| x {PSI_BINS} rows regardless of corpus
    size; the bin histogram is exactly the mergeable artifact each ingest
    shard emits, so at 100 TB the audit is a metadata-size reduce over
    shard histograms, never a second corpus scan."""
    cnts = psi_bin_counts(
        load_table(spark, sf_dir, "documents")
    ).groupBy("source", "bin").agg(F.count(F.lit(1)).alias("a_cnt"))
    return psi_from_bin_counts(spark, cnts)


def psi_bin_counts(docs: DataFrame) -> DataFrame:
    """(source, bin) rows for the PSI histogram — q231's binning law,
    extracted so the streaming monitor (q232) bins each arriving
    micro-batch IDENTICALLY to the batch audit."""
    return docs.filter(
        F.col("n_chars").isNotNull() & F.col("source").isNotNull()
    ).select(
        "source",
        F.least(F.expr(f"n_chars DIV {PSI_BIN_W}"), F.lit(PSI_BINS - 1)).alias(
            "bin"
        ),
    )


def psi_from_bin_counts(spark: SparkSession, cnts: DataFrame) -> DataFrame:
    """q231's PSI relation computed from a MERGED (source, bin, a_cnt)
    histogram — the read-time half shared by the batch audit (q231) and
    the streaming monitor (q232), whose per-epoch partial histograms sum
    into exactly this input because bin counts are mergeable."""
    gl = cnts.groupBy("bin").agg(F.sum("a_cnt").alias("g_cnt"))
    srcs = cnts.groupBy("source").agg(F.sum("a_cnt").alias("n_s"))
    # bounded: one scalar (the corpus row count)
    n_total = cnts.agg(F.sum("a_cnt")).collect()[0][0]
    grid = srcs.crossJoin(
        F.broadcast(
            spark.range(PSI_BINS).select(F.col("id").cast("bigint").alias("bin"))
        )
    )
    a = F.coalesce(F.col("a_cnt"), F.lit(0))
    g = F.coalesce(F.col("g_cnt"), F.lit(0))
    p = (g - a + 1).cast("double") / (
        F.lit(n_total) - F.col("n_s") + PSI_BINS
    ).cast("double")
    q = (a + 1).cast("double") / (F.col("n_s") + PSI_BINS).cast("double")
    term = (p - q) * F.log(p / q)
    return (
        grid.join(cnts, ["source", "bin"], "left")
        .join(F.broadcast(gl), "bin", "left")
        .select("source", "n_s", term.alias("t"))
        .groupBy("source", "n_s")
        .agg(F.round(F.sum("t"), 6).alias("psi"), F.sum("t").alias("raw"))
        .withColumn(
            "bias",
            PSI_BINS
            * (
                F.lit(1.0) / F.col("n_s").cast("double")
                + F.lit(1.0) / (F.lit(n_total) - F.col("n_s")).cast("double")
            ),
        )
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_s"),
            (F.lit(n_total).cast("bigint") - F.col("n_s").cast("bigint")).alias(
                "n_rest"
            ),
            "psi",
            F.round("bias", 6).alias("psi_bias"),
            (F.col("raw") - F.col("bias") > float(PSI_THRESHOLD)).alias("drifted"),
        )
    )
