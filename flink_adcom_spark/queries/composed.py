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
