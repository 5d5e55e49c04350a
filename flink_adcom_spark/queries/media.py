"""Registry entries for the multimodal pipeline and the generic-combine tier,
so they run under the external correctness gate too (not only pytest).

q80 is rows-only (its output hangs off the stubbed codec inside mapInPandas —
not ANSI-SQL-expressible); q81's sampling schedule and q82's generic fold both
have full SQL oracles, proving the Arrow-batched tiers compute exactly what
the declarative plan would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.combine import TopNDistancePreAggregate, combine_generic
from ..operators.multimodal import extract_features, media_from_documents, sample_frames
from ..registry import query
from ..tables import load_table
from .rides import rides, rides_oracle_cte


def _assert_ascii_fixture(docs: DataFrame) -> None:
    """q80/q95's oracles equate DuckDB ascii(left(text,1)) (Unicode code
    point) with the payload's first UTF-8 byte — valid only while the
    documents fixture is pure ASCII (char length == byte length). The
    driver regenerates testdata between rounds, so fail LOUDLY if a
    regeneration breaks the invariant rather than letting the oracle
    silently diverge (FIXTURES.md §documents)."""
    bad = docs.filter(F.length("text") != F.octet_length("text")).limit(1).count()
    if bad:
        raise AssertionError(
            "documents fixture is no longer pure ASCII: q80/q95 oracles "
            "equate ascii(char) with the first/last UTF-8 byte and would "
            "silently diverge — rewrite the oracle byte extraction "
            "(queries/media.py) for the new fixture encoding"
        )


@query(
    "q80_media_features",
    # The deterministic fake decode is a pure function of the payload bytes
    # (= the document's ASCII text), so every feature restates as SQL: md5
    # checksum over the bytes, dimensions from first/last byte for images,
    # the 3-component feature vector emitted as scalar columns (array cells
    # are unsortable in the driver's canonicalization).
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(CASE WHEN doc_id % 3 = 0 AND octet_length(encode(text)) > 0
                     THEN 64 + ascii(left(text, 1)) % 192 ELSE 0 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 AND octet_length(encode(text)) > 0
                     THEN 64 + ascii(right(text, 1)) % 192 ELSE 0 END AS INT) AS height,
           CAST(octet_length(encode(text)) % 251 AS DOUBLE) AS feat_len,
           CAST(CASE WHEN octet_length(encode(text)) > 0
                     THEN ascii(left(text, 1)) ELSE 0 END AS DOUBLE) AS feat_first,
           CAST(CASE WHEN octet_length(encode(text)) > 0
                     THEN ascii(right(text, 1)) ELSE 0 END AS DOUBLE) AS feat_last
    FROM documents WHERE text IS NOT NULL
    """,
    tags=("multimodal",),
)
def q80_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction end-to-end: documents -> binary media table ->
    Arrow-batched decode/checksum/features (payload column dropped before any
    downstream shuffle). The mapInPandas codec stage is the system under
    test; the oracle restates the deterministic fake decode. The feature
    vector is surfaced as scalar columns for the gate; the array-typed path
    is exercised by tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    _assert_ascii_fixture(docs)
    media = media_from_documents(docs)
    feats = extract_features(media, fake_decode=True)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "checksum",
        "width",
        "height",
        F.col("feat")[0].alias("feat_len"),
        F.col("feat")[1].alias("feat_first"),
        F.col("feat")[2].alias("feat_last"),
    )


@query(
    "q81_frame_samples",
    # The frame-sampling CONTRACT (which rows, which offsets) is fully
    # deterministic given the fixture's media derivation, so it oracles as
    # plain SQL even though the Spark side runs the real mapInPandas stage:
    # video = doc_id % 3 = 2, offsets = range(0, utf8_len, 64) capped at 8.
    """
    WITH vids AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL
    )
    SELECT media_id, CAST(k AS INT) AS frame_idx,
           CAST(k * 64 AS BIGINT) AS frame_offset
    FROM vids CROSS JOIN (SELECT unnest(range(0, 8)) AS k) ks
    WHERE k * 64 < n
    """,
    tags=("multimodal",),
)
def q81_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame offset. The
    mapInPandas stage is the system under test; the oracle restates the
    sampling schedule declaratively."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_n_bytes=64, max_frames=8)


@query(
    "q82_generic_topn_fold",
    rides_oracle_cte(
        "SELECT driver_id AS key, CAST(rn AS INT) AS rnk, "
        "ROUND(distance_km, 6) AS distance_km FROM ("
        "  SELECT driver_id, distance_km, "
        "         ROW_NUMBER() OVER (PARTITION BY driver_id "
        "                            ORDER BY distance_km DESC) AS rn "
        "  FROM rides) t WHERE rn <= 3"
    ),
    tags=("taxi", "topn", "generic-combine"),
)
def q82_generic_topn_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's A8 bounded-array top-N fold executed through the
    GENERIC combine tier (applyInPandas PreAggregateFunction), hash-matched
    against the window-rank SQL oracle — API parity with provable
    equivalence. Distances are unique per driver (trig lattice), so the
    rank order is well-defined without a tie-break."""
    r = rides(spark, sf_dir).select("driver_id", "distance_km")
    out = combine_generic(
        r,
        ["driver_id"],
        TopNDistancePreAggregate(n=3),
        "key long, rnk int, distance_km double",
    )
    return out.select("key", "rnk", F.round("distance_km", 6).alias("distance_km"))


@query(
    "q95_media_resize",
    # The fake resize is a pure function of the payload bytes, and the fixture
    # payload is the document's ASCII text — so first/last byte = ascii of
    # first/last char, and the resampled output length is integer arithmetic:
    # step = max(1, n DIV 784), out = min(ceil(n/step), 784).
    """
    WITH img AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n,
             ascii(left(text, 1)) AS b0, ascii(right(text, 1)) AS b1
      FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL
    )
    SELECT media_id,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 64 + b0 % 192 END AS INT) AS width,
           CAST(CASE WHEN n = 0 THEN 0 ELSE 64 + b1 % 192 END AS INT) AS height,
           CAST(224 AS INT) AS target_w, CAST(224 AS INT) AS target_h,
           CAST(CASE WHEN n = 0 THEN 0
                ELSE LEAST((n + GREATEST(1, n // 784) - 1) // GREATEST(1, n // 784),
                           784) END AS BIGINT) AS out_bytes
    FROM img
    """,
    tags=("multimodal",),
)
def q95_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing end-to-end: image rows -> Arrow-batched
    decode/scale/re-encode -> (dims, target dims, resized payload size). The
    mapInPandas stage with the stubbed codec is the system under test; the
    oracle restates the deterministic fake's byte arithmetic. The payload
    itself stays executor-side (only its length is emitted), mirroring the
    drop-bytes-before-shuffle discipline of extract_features."""
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    _assert_ascii_fixture(docs)
    media = media_from_documents(docs).filter(
        F.col("media_type") == "image"
    )
    out = resize_images(media, target_w=224, target_h=224)
    return out.select(
        "media_id",
        "width",
        "height",
        "target_w",
        "target_h",
        F.octet_length("content").cast("bigint").alias("out_bytes"),
    )


# --- binary-payload exact dedup + storage-reclaim report -----------------------
@query(
    "q172_media_dedup_stats",
    # Payload bytes = the document's utf-8 text (media_from_documents), so
    # the binary digest restates as md5 over the encoded text and the byte
    # size as octet_length — REAL binary-column logic, no codec involved.
    """
    WITH m AS (SELECT doc_id AS media_id,
                      CASE WHEN doc_id % 3 = 0 THEN 'image'
                           WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
                        AS media_type,
                      md5(text) AS digest,
                      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
               FROM documents WHERE text IS NOT NULL),
    g AS (SELECT digest, COUNT(*) AS n_copies,
                 arg_min(media_type, media_id) AS keeper_type,
                 MAX(n_bytes) AS payload_bytes
          FROM m GROUP BY digest)
    SELECT keeper_type AS media_type,
           COUNT(*) AS n_unique_payloads,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_duplicate_rows,
           CAST(SUM((n_copies - 1) * payload_bytes) AS BIGINT)
             AS reclaimable_bytes
    FROM g GROUP BY keeper_type
    """,
    tags=("media", "dedup", "storage"),
)
def q172_media_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY-payload dedup over the media table with a per-type
    storage-reclaim report (unique payloads, duplicate rows, reclaimable
    bytes) — the q40 digest topology applied to the binary column, and the
    number a blob-store compaction job acts on. Unlike the q80/q95 codec
    stages this is fully real logic: md5 + octet_length over the payload
    bytes work on ANY binary content, no decode involved.

    Dedup is CONTENT-ADDRESSED (digest-only grouping, the way a blob store
    actually reclaims): a payload replayed under a different declared type
    still counts as a duplicate, attributed to its keeper's (min media_id)
    type via min_by/arg_min — the same tie rule on both engines.

    Scale shape: one shuffle on the 16-byte digest with map-side combine —
    payload bytes never shuffle (digest and length are computed scan-side);
    the rollup output is 3 rows. Within a digest group the payload size is
    constant by construction (same bytes), so MAX(n_bytes) is exact."""
    docs = load_table(spark, sf_dir, "documents")
    m = media_from_documents(docs).select(
        "media_id",
        "media_type",
        F.md5(F.col("content")).alias("digest"),
        F.octet_length("content").cast("bigint").alias("n_bytes"),
    )
    g = m.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min_by("media_type", "media_id").alias("media_type"),
        F.max("n_bytes").alias("payload_bytes"),
    )
    return g.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_unique_payloads"),
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_duplicate_rows"),
        F.sum((F.col("n_copies") - 1) * F.col("payload_bytes"))
        .cast("bigint")
        .alias("reclaimable_bytes"),
    )


# --- q252: content-addressed chunk manifest (multipart upload plan) -----------------
MEDIA_CHUNK_B = 100  # fixed chunk size in bytes (tiny at fixture scale; a
# blob store uses 8-64 MiB — the manifest SHAPE is what's contract-tested)


@query(
    "q252_media_chunk_manifest",
    f"""
    SELECT doc_id AS media_id,
           CAST(ci AS BIGINT) AS chunk_idx,
           CAST(octet_length(encode(substr(text, ci * {MEDIA_CHUNK_B} + 1,
                                           {MEDIA_CHUNK_B}))) AS BIGINT)
             AS n_bytes,
           md5(substr(text, ci * {MEDIA_CHUNK_B} + 1, {MEDIA_CHUNK_B}))
             AS chunk_md5
    FROM (SELECT doc_id, text,
                 unnest(range(0, CAST(ceil(octet_length(encode(text))
                                           / {MEDIA_CHUNK_B}.0) AS BIGINT)))
                   AS ci
          FROM documents
          WHERE text IS NOT NULL AND octet_length(encode(text)) > 0) t
    """,
    tags=("media", "storage", "pipeline"),
)
def q252_media_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed chunk manifest for every media payload — the
    multipart-upload / blob-replication plan: the payload split into fixed
    {MEDIA_CHUNK_B}-byte chunks, each with its size and md5, so an uploader
    can parallelize parts, resume after a failure by comparing digests, and
    a replica audit can verify a payload without re-reading intact chunks
    (the q172 dedup stats compose with this per-chunk: shared chunks across
    near-identical payloads upload once). Chunk boundaries are byte
    offsets; the oracle restates them over the text bytes under the
    documents ASCII invariant (FIXTURES.md §6), asserted before running.

    Scale shape: pure scan-side work — a per-row sequence explode of
    ceil(bytes/chunk) indexes plus substring + md5 projections; no shuffle
    at any scale (output is written partitioned by media_id prefix in a
    deployment)."""
    docs = load_table(spark, sf_dir, "documents")
    _assert_ascii_fixture(docs)
    c = MEDIA_CHUNK_B
    t = docs.filter(
        F.col("text").isNotNull() & (F.octet_length("text") > 0)
    ).select(
        F.col("doc_id").alias("media_id"),
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.octet_length("text") / F.lit(float(c))).cast("bigint")
                - 1,
            )
        ).alias("chunk_idx"),
    )
    chunk = F.expr(f"substr(text, chunk_idx * {c} + 1, {c})")
    return t.select(
        "media_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.octet_length(chunk).cast("bigint").alias("n_bytes"),
        F.md5(chunk).alias("chunk_md5"),
    )


# --- q260: image-caption alignment gate (CLIP-filter plumbing) ---------------------
ALIGN_GATE = 0.3  # keep pairs scoring >= this (LAION-400M used ~0.28)


def _q260_oracle() -> str:
    from .dedup import _hash_sql

    u32 = _hash_sql(8, "(text || '#' || text)")
    return f"""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(len(list_filter(string_split(translate(text,
                'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
                ' '), x -> x <> '')) AS BIGINT) AS caption_tokens,
           ROUND({u32} / 4294967296.0, 6) AS align_score,
           {u32} / 4294967296.0 >= {ALIGN_GATE} AS kept
    FROM documents
    WHERE doc_id % 3 = 0 AND text IS NOT NULL
    """


@query(
    "q260_media_caption_gate",
    _q260_oracle(),
    tags=("media", "multimodal", "quality", "pipeline"),
)
def q260_media_caption_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-caption pair construction + alignment gate — the LAION-style
    CLIP-score filter's PLUMBING over the media table: pair every image
    payload with its caption (the source document's text; media_id keys
    the join), score the pair, and flag rows under the ALIGN_GATE
    threshold. The score here is an HONEST DETERMINISTIC STUB — the
    md5-prefix u32 of (payload bytes || '#' || caption) scaled to [0, 1) —
    standing in for the CLIP cosine a real deployment computes in an
    Arrow-batched Pandas UDF over (payload, caption) (the
    operators/multimodal.py codec posture: no vision models in this
    sandbox; both gate branches fire at every SF because the stub is
    uniform). The join/gate/accounting shape is the real part: at 100 TB
    this is one media->captions equi-join (broadcast or bucketed on
    media_id) + a scan-side score + the flag — no shuffle beyond the join.

    Payload bytes feed the score as a string, valid while the documents
    fixture is pure ASCII — loudly asserted, the q80/q95 discipline."""
    docs = load_table(spark, sf_dir, "documents")
    _assert_ascii_fixture(docs.filter(F.col("text").isNotNull()))
    return media_caption_gate_rows(docs)


def media_caption_gate_rows(docs: DataFrame) -> DataFrame:
    """(media_id, n_bytes, caption_tokens, align_score, kept) for any docs
    slice — the shared body of the batch gate (q260) and its
    per-micro-batch streaming sink (q262). Score and gate are
    per-document, so the relation is batching-invariant by construction."""
    media = media_from_documents(docs).filter(F.col("media_type") == "image")
    captions = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("media_id"), F.col("text").alias("caption")
    )
    pair_key = "concat(CAST(content AS STRING), '#', caption)"
    u32 = f"CAST(conv(substr(md5({pair_key}), 1, 8), 16, 10) AS BIGINT)"
    return (
        media.join(captions, "media_id")
        .selectExpr(
            "media_id",
            "CAST(octet_length(content) AS BIGINT) AS n_bytes",
            "CAST(size(filter(split(translate(caption, "
            "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), "
            "' '), x -> x != '')) AS BIGINT) AS caption_tokens",
            # CAST: a bare 4294967296.0 literal parses as DECIMAL in Spark
            # SQL (ANSI) and the division would come back DECIMAL, not the
            # oracle's DOUBLE
            f"ROUND({u32} / CAST(4294967296 AS DOUBLE), 6) AS align_score",
            f"{u32} / CAST(4294967296 AS DOUBLE) >= {ALIGN_GATE} AS kept",
        )
    )
