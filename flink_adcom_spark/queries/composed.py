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
# central loader imports text/dedup/similarity before this module anyway)
from . import dedup, similarity, text  # noqa: F401

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
