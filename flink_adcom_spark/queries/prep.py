"""Training-data preparation operators: token-window chunking and PII
scrubbing.

Both are scan-shaped: they transform each document independently with
builtin expressions (split/slice/regexp inside whole-stage codegen), so at
100 TB they cost one read of the corpus and shuffle nothing — the aggregate
at the end of each gated query exists only to make the result small enough
to oracle-check, and is not part of the production pipeline shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import (
    pii_count,
    redact_pii,
    sql_pii_count,
    sql_redact_pii,
)
from ..registry import query
from ..tables import load_table
from .text import CTX_TOKENS

# Sliding token windows: 64-token chunks starting every 48 tokens (16-token
# overlap), the standard pre-training pack-with-overlap layout. Window starts
# run while start < len(tokens) - overlap (min one window), so the final
# window is never fully contained in its predecessor: a 64-token document
# yields exactly one chunk, a 65-token document two.
CHUNK_TOKENS, CHUNK_STRIDE = 64, 48
CHUNK_OVERLAP = CHUNK_TOKENS - CHUNK_STRIDE


# Shared oracle CTE: the sliding-window chunk relation. Defined ONCE so the
# two gated consumers (q128, q134) can never disagree about what a chunk is.
_CHUNKS_SQL = f"""
    toks AS (
      -- text IS NOT NULL symmetric with the Spark builder: Spark's
      -- size(NULL) = -1 would otherwise emit one phantom chunk row
      -- (n_tokens = -1) per NULL document while range(NULL) unnests to
      -- zero rows here
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      FROM documents WHERE text IS NOT NULL
    ),
    chunks AS (
      SELECT doc_id,
             CAST(s.start / {CHUNK_STRIDE} AS INT) AS chunk_idx,
             list_slice(t, s.start + 1,
                        least(s.start + {CHUNK_TOKENS}, len(t))) AS chunk
      FROM toks,
           LATERAL (
             SELECT unnest(range(0, greatest(len(t) - {CHUNK_OVERLAP}, 1), {CHUNK_STRIDE})) AS start
           ) s
    )"""


@query(
    "q128_token_chunks",
    f"""
    WITH {_CHUNKS_SQL}
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS INT) AS n_tokens,
           -- COALESCE: array_to_string of an empty list is NULL in DuckDB,
           -- while Spark's concat_ws is never null — an empty document must
           -- hash identically on both sides
           COALESCE(array_to_string(chunk, ' '), '') AS chunk_text
    FROM chunks
    """,
    tags=("documents", "prep", "chunking"),
    bench=True,
)
def q128_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking: each document becomes overlapping
    64-token chunks with a 48-token stride (16-token overlap), the layout a
    pre-training tokenizer consumes. Pure builtin expressions — split,
    sequence, posexplode, slice — so the whole operator lives inside
    whole-stage codegen with ZERO shuffles and no Python; output rows are
    produced in the same task that read the document.

    Scale shape: chunking is embarrassingly parallel and row-local; output
    size is input size * (1 + overlap/stride). Downstream packing (q86/q87)
    starts from exactly this relation."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())  # symmetric with the oracle CTE
        .select("doc_id", toks.alias("t"))
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("t") - CHUNK_OVERLAP - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunks = docs.select(
        "doc_id", "t", F.explode(starts).alias("start")
    ).select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.slice("t", F.col("start") + 1, F.lit(CHUNK_TOKENS)).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


# PII scrub audit: the fixture corpus carries no real PII, so the gated query
# PLANTS one deterministic email/phone/IP per document (derived from doc_id),
# scrubs, and audits — proving the detect+redact path end-to-end with an
# exactly-predictable answer. On real data a user applies redact_pii directly.
_PLANT = (
    "SELECT doc_id, source, text || ' contact u' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or ' || CAST(100 + doc_id % 900 AS VARCHAR) || '-'"
    " || CAST(100 + doc_id % 900 AS VARCHAR) || '-'"
    " || CAST(1000 + doc_id % 9000 AS VARCHAR) || ' at 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)"
    " AS text FROM documents"
)


@query(
    "q129_pii_scrub_audit",
    f"""
    WITH planted AS ({_PLANT}),
    scrubbed AS (
      SELECT source,
             {sql_pii_count('text', 'email')} AS n_email,
             {sql_pii_count('text', 'phone')} AS n_phone,
             {sql_pii_count('text', 'ipv4')} AS n_ip,
             {sql_redact_pii('text')} AS clean
      FROM planted
    )
    SELECT source,
           COUNT(*) AS docs,
           CAST(SUM(n_email) AS BIGINT) AS emails_found,
           CAST(SUM(n_phone) AS BIGINT) AS phones_found,
           CAST(SUM(n_ip) AS BIGINT) AS ips_found,
           CAST(SUM({sql_pii_count('clean', 'email')}
                    + {sql_pii_count('clean', 'phone')}
                    + {sql_pii_count('clean', 'ipv4')}) AS BIGINT) AS residual_pii
    FROM scrubbed
    GROUP BY source
    """,
    tags=("documents", "prep", "pii"),
)
def q129_pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: plant one synthetic email, phone, and IPv4 per
    document (deterministic from doc_id — the fixture corpus has no real
    PII), then run the shared detect+redact rule set (functions/pii.py) and
    report per-source found/residual counts. residual_pii must come back 0:
    the query proves the scrubber finds exactly what is there and removes
    all of it, under the same regex semantics in Spark (Java) and DuckDB
    (RE2) — patterns are restricted to the shared dialect.

    Scale shape: detection and redaction are regexp expressions in the scan
    projection — zero shuffles, no Python; only the per-source audit
    aggregate shuffles, with map-side partials over ~|sources| keys."""
    doc = load_table(spark, sf_dir, "documents")
    planted = doc.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or "),
            (100 + F.col("doc_id") % 900).cast("string"),
            F.lit("-"),
            (100 + F.col("doc_id") % 900).cast("string"),
            F.lit("-"),
            (1000 + F.col("doc_id") % 9000).cast("string"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
        ).alias("text"),
    )
    scrubbed = planted.select(
        "source",
        pii_count("text", "email").alias("n_email"),
        pii_count("text", "phone").alias("n_phone"),
        pii_count("text", "ipv4").alias("n_ip"),
        redact_pii("text").alias("clean"),
    )
    residual = (
        pii_count("clean", "email")
        + pii_count("clean", "phone")
        + pii_count("clean", "ipv4")
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_email").cast("bigint").alias("emails_found"),
        F.sum("n_phone").cast("bigint").alias("phones_found"),
        F.sum("n_ip").cast("bigint").alias("ips_found"),
        F.sum(residual).cast("bigint").alias("residual_pii"),
    )


# --- composition: chunk -> pack (the trainer-facing layout) -------------------


@query(
    "q134_chunked_pack",
    f"""
    WITH {_CHUNKS_SQL},
    chunk_lens AS (
      SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens
      FROM chunks
    ),
    offs AS (
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_tok
      FROM chunk_lens WHERE n_tokens >= 1
    )
    SELECT doc_id, chunk_idx, n_tokens, start_tok,
           CAST(FLOOR(start_tok / {CTX_TOKENS}) AS BIGINT) AS win_first,
           CAST(FLOOR((start_tok + n_tokens - 1) / {CTX_TOKENS}) AS BIGINT) AS win_last
    FROM offs
    """,
    tags=("documents", "prep", "chunking", "packing", "composite"),
)
def q134_chunked_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trainer-facing composition chunk -> pack: q128's sliding token
    windows are concatenated in (doc_id, chunk_idx) order and packed into
    2048-token context windows with q86's sharded prefix sum — raw corpus
    to batch layout in ONE declarative plan, no intermediate table.

    Column pruning does real work here: q128's chunk_text (the expensive
    concat) is never selected, so Catalyst drops the expression entirely
    and the scan feeds only token COUNTS into the prefix sum. The global
    running offset is shard-parallel exactly as in q86 (order-aligned
    doc_id shards; only the 64-entry shard base-offset map is global
    state); the oracle states the same result as one flat SQL window."""
    from .text import _with_order_shard, sharded_prefix_sum

    ch = (
        q128_token_chunks(spark, sf_dir)
        .select("doc_id", "chunk_idx", F.col("n_tokens").cast("bigint").alias("n_tokens"))
        .filter(F.col("n_tokens") >= 1)
    )
    ch = _with_order_shard(ch)
    return (
        sharded_prefix_sum(ch, "n_tokens", "doc_id", "chunk_idx")
        .select(
            "doc_id",
            "chunk_idx",
            "n_tokens",
            "start_tok",
            F.floor(F.col("start_tok") / CTX_TOKENS).cast("bigint").alias("win_first"),
            F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / CTX_TOKENS)
            .cast("bigint")
            .alias("win_last"),
        )
    )
