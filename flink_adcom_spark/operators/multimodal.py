"""Multimodal (image/audio/video) column plumbing.

Design for a 100 TB training-data pipeline: media payloads are opaque
`binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` stages so decode/feature-extraction runs vectorized per
partition with bounded memory (spark.sql.execution.arrow.maxRecordsPerBatch
caps batch size; payload bytes never pass through the driver).

The actual codec step is STUBBED in this container (no PIL/ffmpeg available
— decode_image raises NotImplementedError unless a deterministic fake is
requested), but everything Spark-side is real and tested: schema, batch
iteration, UDF signatures, partitioning behavior, metadata propagation.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField("source_uri", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, checksum string, "
    "width int, height int, feat array<double>"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the text bytes stand in
    for an encoded payload (deterministic, so tests are stable). Rows with a
    NULL payload are dropped at ingestion — an undecodable media row has no
    place downstream, and NULL content would otherwise crash the codec
    stages (and diverge from the oracles, which restate byte arithmetic
    over non-null text)."""
    docs = docs.filter(F.col("text").isNotNull())
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.concat(F.lit("synthetic://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias(
            "source_uri"
        ),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("n_chars"), F.col("n_chars").cast("string")).alias(
            "meta"
        ),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload -> (width, height).

    REAL CODEC STUBBED: the container has no image libraries. With fake=True
    a deterministic pseudo-decode derives dimensions from the payload bytes
    (stable across runs/partitions) so the pipeline shape is testable."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "for the deterministic test decode"
        )
    if not payload:
        return (0, 0)
    return (64 + payload[0] % 192, 64 + payload[-1] % 192)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-partition Arrow-batched feature extraction (decode -> checksum ->
    dimensions -> small feature vector). mapInPandas keeps the payload in the
    executor; output drops `content` so downstream stages shuffle only
    features, never bytes — at 100 TB that is the difference between a
    shuffle of ~KB/row and ~MB/row."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            dims = [
                decode_image(p, fake=fake_decode) if t == "image" else (0, 0)
                for p, t in zip(payloads, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "feat": [
                        [float(len(p) % 251), float(p[0] if len(p) else 0), float(p[-1] if len(p) else 0)]
                        if p is not None
                        else []
                        for p in payloads
                    ],
                }
            )

    # Project to the 3 consumed columns BEFORE the Arrow exchange: mapInPandas
    # is a pruning barrier, so without this the scan reads (and Arrow ships)
    # every media column into Python.
    return media.select("media_id", "media_type", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per sampled
    "frame" offset (the decode itself is the stubbed step; offsets/ordering/
    explosion shape are the real contract). Output is (media_id, frame_idx,
    frame_offset)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, t, p in zip(pdf["media_id"], pdf["media_type"], pdf["content"]):
                if t != "video" or p is None:
                    continue
                offsets = list(range(0, len(p), every_n_bytes))[:max_frames]
                rows.extend(
                    {"media_id": mid, "frame_idx": i, "frame_offset": off}
                    for i, off in enumerate(offsets)
                )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_offset"])

    # Same pruning-barrier discipline as extract_features: only ship the
    # consumed columns through Arrow.
    return media.select("media_id", "media_type", "content").mapInPandas(
        run, schema="media_id long, frame_idx int, frame_offset long"
    )


RESIZE_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "target_w int, target_h int, content binary"
)


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize plumbing for image payloads: decode -> scale -> re-encode, as an
    Arrow-batched mapInPandas stage emitting the resized payload plus
    before/after dimensions.

    REAL CODEC STUBBED (no PIL in this container): the deterministic fake
    "resize" derives the output payload by proportionally resampling the
    input BYTES to target_w*target_h/64 length — preserving the real
    contract that output payload size tracks target area, is deterministic,
    and flows through the executor only. Non-image rows pass through
    untouched with null target dims."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "width": [],
                "height": [],
                "target_w": [],
                "target_h": [],
                "content": [],
            }
            for t, p in zip(pdf["media_type"], pdf["content"]):
                if t != "image" or p is None:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["target_w"].append(None)
                    out["target_h"].append(None)
                    out["content"].append(p)
                    continue
                w, h = decode_image(p, fake=True)
                n_out = max(1, target_w * target_h // 64)
                # proportional byte resample (stub for pixel resample)
                step = max(1, len(p) // n_out) if len(p) else 1
                resized = bytes(p[::step][:n_out]) if len(p) else b""
                out["width"].append(w)
                out["height"].append(h)
                out["target_w"].append(target_w)
                out["target_h"].append(target_h)
                out["content"].append(resized)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)
