"""Composed pipeline verdicts: queries that JOIN already-verified relations
into the single decision a pipeline applies (the q110/q175/q183 discipline —
composing the verified CTE chains means the verdict can never disagree with
its constituents)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import _REGISTRY, query
from ..tables import load_table

# force the constituents' decorators to have run (idempotent imports; the
# central loader imports text/dedup/similarity/prep before this module anyway)
from . import dedup, prep, similarity, text  # noqa: F401

# the q110 manifest's n-gram drop threshold (dedup.CONTAM_MAX)
_CONTAM_MAX = dedup.CONTAM_MAX


def _q187_oracle() -> str:
    q48 = _REGISTRY["q48_contamination"].oracle
    q169 = _REGISTRY["q169_embed_decontaminate"].oracle
    return f"""
    WITH ng AS MATERIALIZED (SELECT * FROM ({q48}) t),
    emb AS MATERIALIZED (SELECT * FROM ({q169}) t)
    SELECT d.doc_id,
           COALESCE(ng.contamination >= {_CONTAM_MAX}, FALSE) AS flag_ngram,
           COALESCE(emb.contaminated, FALSE) AS flag_embed,
           (COALESCE(ng.contamination >= {_CONTAM_MAX}, FALSE)
            OR COALESCE(emb.contaminated, FALSE)) AS flag_any
    FROM documents d
    LEFT JOIN ng ON ng.doc_id = d.doc_id
    LEFT JOIN emb ON emb.vec_id = d.doc_id
    """


@query(
    "q187_decontamination_report",
    _q187_oracle(),
    tags=("text", "similarity", "decontamination", "pipeline"),
)
def q187_decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMBINED decontamination verdict a pipeline actually applies:
    per document, the n-gram benchmark-overlap flag (q48 at the q110
    manifest's 50% threshold) and the embedding-similarity flag (q169 via
    the doc_id==vec_id pairing q171 established), plus their union — the
    lexical check catches verbatim leakage, the semantic check catches
    paraphrased leakage, and production corpora gate on BOTH (neither
    subsumes the other). Documents absent from a constituent (no shingles /
    no embedding) default to unflagged on both engines.

    Scale shape: the constituents' own scale stories (q48's broadcast
    shingle set, q169's zero-exchange scan fold) plus two doc-keyed left
    joins."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ng = dedup.q48_contamination(spark, sf_dir).select(
        "doc_id", (F.col("contamination") >= _CONTAM_MAX).alias("f_ng")
    )
    emb = similarity.q169_embed_decontaminate(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("contaminated").alias("f_emb")
    )
    return (
        docs.join(ng, "doc_id", "left")
        .join(emb, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("f_ng", F.lit(False)).alias("flag_ngram"),
            F.coalesce("f_emb", F.lit(False)).alias("flag_embed"),
            (
                F.coalesce("f_ng", F.lit(False))
                | F.coalesce("f_emb", F.lit(False))
            ).alias("flag_any"),
        )
    )


# --- q192: the end-to-end curation funnel --------------------------------------
_FUNNEL_STAGES = (
    "all",
    "exact_dedup",
    "quality_rules",
    "quality_classifier",
    "decontaminated",
)


def _q192_oracle() -> str:
    q40 = _REGISTRY["q40_exact_dedup"].oracle
    q114 = _REGISTRY["q114_quality_gate"].oracle
    q178 = _REGISTRY["q178_quality_classifier"].oracle
    q187 = _REGISTRY["q187_decontamination_report"].oracle
    from .text import _FOLD_TEXT_SQL

    stages = " UNION ALL ".join(
        f"SELECT {i} AS stage, '{name}' AS stage_name, "
        f"CAST(SUM(CASE WHEN s{i} THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM f"
        for i, name in enumerate(_FUNNEL_STAGES)
    )
    return f"""
    WITH dd AS MATERIALIZED (SELECT * FROM ({q40}) t),
    qr AS MATERIALIZED (SELECT doc_id, keep FROM ({q114}) t),
    qc AS MATERIALIZED (SELECT doc_id, score FROM ({q178}) t),
    dc AS MATERIALIZED (SELECT doc_id, flag_any FROM ({q187}) t),
    f AS (SELECT d.doc_id,
                 TRUE AS s0,
                 (d.doc_id = dd.canonical_doc) AS s1,
                 (d.doc_id = dd.canonical_doc AND qr.keep) AS s2,
                 (d.doc_id = dd.canonical_doc AND qr.keep AND qc.score > 0)
                   AS s3,
                 (d.doc_id = dd.canonical_doc AND qr.keep AND qc.score > 0
                  AND NOT dc.flag_any) AS s4
          FROM (SELECT doc_id, md5({_FOLD_TEXT_SQL}) AS fp FROM documents) d
          JOIN dd USING (fp)
          JOIN qr USING (doc_id)
          JOIN qc USING (doc_id)
          JOIN dc USING (doc_id))
    {stages}
    """


@query(
    "q192_curation_funnel",
    _q192_oracle(),
    tags=("text", "dedup", "quality", "decontamination", "pipeline"),
)
def q192_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation FUNNEL report — the per-stage survival counts
    every production corpus publishes (C4/FineWeb-style): all docs ->
    exact-dedup canonicals (q40) -> rule quality gate (q114) -> trained
    classifier gate (q178, positive margin) -> decontamination (q187,
    neither lexical nor semantic flag). Stages compose by intersection, so
    the counts are monotone non-increasing; each constituent is the
    already-verified relation (the q187 composition discipline — the
    funnel cannot disagree with its parts).

    Scale shape: the constituents' own scale stories plus doc-keyed hash
    joins and one 5-row aggregate; the stage melt is a posexplode of a
    5-element literal-flag array (no extra shuffle beyond the final
    5-group count)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from .text import fold_col

    fp = docs.select("doc_id", F.md5(fold_col()).alias("fp"))
    dd = dedup.q40_exact_dedup(spark, sf_dir).select("fp", "canonical_doc")
    qr = text.q114_quality_gate(spark, sf_dir).select("doc_id", "keep")
    qc = text.q178_quality_classifier(spark, sf_dir).select("doc_id", "score")
    dc = q187_decontamination_report(spark, sf_dir).select("doc_id", "flag_any")
    flags = (
        fp.join(dd, "fp")
        .join(qr, "doc_id")
        .join(qc, "doc_id")
        .join(dc, "doc_id")
        .select(
            "doc_id",
            (F.col("doc_id") == F.col("canonical_doc")).alias("s1"),
            "keep",
            (F.col("score") > 0).alias("pos"),
            "flag_any",
        )
        .select(
            "doc_id",
            F.lit(True).alias("s0"),
            F.col("s1"),
            (F.col("s1") & F.col("keep")).alias("s2"),
            (F.col("s1") & F.col("keep") & F.col("pos")).alias("s3"),
            (
                F.col("s1") & F.col("keep") & F.col("pos") & ~F.col("flag_any")
            ).alias("s4"),
        )
    )
    names = F.lit(list(_FUNNEL_STAGES))
    melted = flags.select(
        F.posexplode(
            F.array(*[F.col(f"s{i}").cast("long") for i in range(5)])
        ).alias("stage", "hit")
    )
    return (
        melted.groupBy("stage")
        .agg(F.sum("hit").alias("n_docs"))
        .select(
            F.col("stage").cast("int").alias("stage"),
            F.element_at(names, F.col("stage") + 1).alias("stage_name"),
            "n_docs",
        )
    )



CTX_TOKENS = text.CTX_TOKENS  # the packing window size under audit
# --- q225: packing-efficiency audit ----------------------------------------------------
def _packing_efficiency_oracle() -> str:
    q86 = _REGISTRY["q86_sequence_pack"].oracle
    q87 = _REGISTRY["q87_greedy_pack"].oracle
    q134 = _REGISTRY["q134_chunked_pack"].oracle
    concat_leg = f"""
        SELECT 'concat_chunk' AS packer,
               CAST(MAX(win_last) + 1 AS BIGINT) AS n_windows,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST((MAX(win_last) + 1) * {CTX_TOKENS} - SUM(n_tokens) AS BIGINT)
                 AS padded_tokens,
               CAST(0 AS BIGINT) AS n_oversize,
               CAST(SUM(n_tokens) * 1000000
                    // ((MAX(win_last) + 1) * {CTX_TOKENS}) AS BIGINT) AS fill_ppm
        FROM ({q86}) a"""
    chunked_leg = f"""
        SELECT 'cdc_chunk_pack',
               CAST(MAX(win_last) + 1 AS BIGINT),
               CAST(SUM(n_tokens) AS BIGINT),
               CAST((MAX(win_last) + 1) * {CTX_TOKENS} - SUM(n_tokens) AS BIGINT),
               CAST(0 AS BIGINT),
               CAST(SUM(n_tokens) * 1000000
                    // ((MAX(win_last) + 1) * {CTX_TOKENS}) AS BIGINT)
        FROM ({q134}) c"""
    greedy_leg = f"""
        SELECT 'greedy_whole_doc',
               CAST(COUNT(DISTINCT CASE WHEN NOT oversize
                     THEN shard * 4294967296 + window_id END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT oversize THEN n_tokens ELSE 0 END) AS BIGINT),
               CAST(COUNT(DISTINCT CASE WHEN NOT oversize
                     THEN shard * 4294967296 + window_id END) * {CTX_TOKENS}
                    - SUM(CASE WHEN NOT oversize THEN n_tokens ELSE 0 END)
                 AS BIGINT),
               CAST(SUM(CASE WHEN oversize THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT oversize THEN n_tokens ELSE 0 END) * 1000000
                    // (COUNT(DISTINCT CASE WHEN NOT oversize
                          THEN shard * 4294967296 + window_id END)
                        * {CTX_TOKENS}) AS BIGINT)
        FROM ({q87}) g"""
    return " UNION ALL ".join([concat_leg, chunked_leg, greedy_leg])


@query(
    "q225_packing_efficiency",
    _packing_efficiency_oracle(),
    tags=("text", "packing", "audit", "pipeline", "composite"),
)
def q225_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE packing scorecard: for each context-packing strategy the corpus
    actually supports — concat-and-chunk (q86, splits docs across window
    boundaries), CDC-chunked packing (q134), greedy whole-document bins
    (q87) — the window count, packed tokens, PADDING tokens, and exact-ppm
    fill rate at CTX={CTX_TOKENS}. Padding is wasted pretraining compute
    one-for-one, so this table is how a pipeline prices the
    document-integrity-vs-efficiency trade: concat packing pads only the
    final partial window (~1.0 fill), greedy whole-doc bins pay real
    padding per bin and exclude oversize docs (counted separately — they
    go to truncation, not padding). Composed from the three VERIFIED
    packing relations (the q175/q221 discipline), integer-exact
    throughout.

    Scale shape: three aggregates over relations the packing stage already
    produced; the greedy leg's bin count is a COUNT(DISTINCT composite
    key) over |docs| rows."""
    q86 = text.q86_sequence_pack(spark, sf_dir)
    q134 = prep.q134_chunked_pack(spark, sf_dir)
    q87 = text.q87_greedy_pack(spark, sf_dir)

    def windows_leg(df: DataFrame, packer: str) -> DataFrame:
        wins = F.max("win_last") + 1
        return df.agg(
            F.lit(packer).alias("packer"),
            wins.cast("bigint").alias("n_windows"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (wins * CTX_TOKENS - F.sum("n_tokens"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.lit(0).cast("bigint").alias("n_oversize"),
            F.expr(
                f"CAST((SUM(n_tokens) * 1000000) DIV ((MAX(win_last) + 1) * {CTX_TOKENS}) AS BIGINT)"
            ).alias("fill_ppm"),
        )

    bin_key = F.when(
        ~F.col("oversize"), F.col("shard") * F.lit(4294967296) + F.col("window_id")
    )
    packed = F.sum(F.when(~F.col("oversize"), F.col("n_tokens")).otherwise(0))
    bins = F.count_distinct(bin_key)
    greedy = q87.agg(
        F.lit("greedy_whole_doc").alias("packer"),
        bins.cast("bigint").alias("n_windows"),
        packed.cast("bigint").alias("total_tokens"),
        (bins * CTX_TOKENS - packed).cast("bigint").alias("padded_tokens"),
        F.sum(F.when(F.col("oversize"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oversize"),
        F.expr(
            "CAST((SUM(CASE WHEN NOT oversize THEN n_tokens ELSE 0 END) * 1000000)"
            " DIV (COUNT(DISTINCT CASE WHEN NOT oversize"
            f" THEN shard * 4294967296 + window_id END) * {CTX_TOKENS}) AS BIGINT)"
        ).alias("fill_ppm"),
    )
    return (
        windows_leg(q86, "concat_chunk")
        .unionByName(windows_leg(q134, "cdc_chunk_pack"))
        .unionByName(greedy)
    )


# --- q228: curation-bias report (mixture shift under the rules gate) ----------------
def _mixture_shift_oracle() -> str:
    q114 = _REGISTRY["q114_quality_gate"].oracle
    return f"""
    WITH g AS ({q114}),
    j AS (SELECT d.source, g.keep FROM documents d JOIN g ON d.doc_id = g.doc_id),
    tot AS (SELECT COUNT(*) AS n_all,
                   SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_kept FROM j)
    SELECT j.source,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN j.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
           CAST(COUNT(*) * 1000000 // t.n_all AS BIGINT) AS share_before_ppm,
           CAST(SUM(CASE WHEN j.keep THEN 1 ELSE 0 END) * 1000000 // t.n_kept
             AS BIGINT) AS share_after_ppm,
           CAST(SUM(CASE WHEN j.keep THEN 1 ELSE 0 END) * 1000000 // t.n_kept
                - COUNT(*) * 1000000 // t.n_all AS BIGINT) AS shift_ppm
    FROM j CROSS JOIN tot t GROUP BY j.source, t.n_all, t.n_kept
    """


@query(
    "q228_mixture_shift_report",
    _mixture_shift_oracle(),
    tags=("text", "quality", "audit", "pipeline", "composite"),
)
def q228_mixture_shift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-bias report: how the quality-rules gate (q114) RESHAPES the
    source mixture — per source, the population before and after the gate
    and the exact-ppm share shift (after-share minus before-share). A
    quality filter that disproportionately kills one feed silently
    reweights the training mixture toward the others; this is the check
    that says so in one table (the motivation for q216's per-source
    calibrated gate, stated as measurement: shift_ppm ~ 0 for every source
    under a per-source-quantile gate BY CONSTRUCTION, while an absolute
    rule battery shifts feeds in both directions). Composed from q114's
    verified relation (the q192/q221 discipline).

    Scale shape: one doc-keyed join + a per-source rollup with two
    broadcast scalars. Run beside every gate change."""
    gate = _REGISTRY["q114_quality_gate"].build(spark, sf_dir).select("doc_id", "keep")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = docs.join(gate, "doc_id")
    tot = j.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("na"),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "source",
            "CAST(nb AS BIGINT) AS n_before",
            "CAST(na AS BIGINT) AS n_after",
            "CAST((nb * 1000000) DIV n_all AS BIGINT) AS share_before_ppm",
            "CAST((na * 1000000) DIV n_kept AS BIGINT) AS share_after_ppm",
            "CAST((na * 1000000) DIV n_kept - (nb * 1000000) DIV n_all AS BIGINT)"
            " AS shift_ppm",
        )
    )
