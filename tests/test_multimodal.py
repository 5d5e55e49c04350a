"""Multimodal plumbing tests: schema, Arrow batch shapes, stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_adcom_spark.operators import multimodal as mm
from flink_adcom_spark.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.media_from_documents(load_table(spark, sf_dir, "documents"))


def test_media_schema(media):
    got = {f.name: f.dataType.simpleString() for f in media.schema}
    assert got == {
        "media_id": "bigint",
        "media_type": "string",
        "content": "binary",
        "source_uri": "string",
        "meta": "map<string,string>",
    }


def test_decode_is_stubbed_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc")


def test_fake_decode_deterministic():
    assert mm.decode_image(b"abc", fake=True) == mm.decode_image(b"abc", fake=True)
    assert mm.decode_image(b"", fake=True) == (0, 0)


def test_extract_features_end_to_end(spark, media):
    feats = mm.extract_features(media)
    rows = feats.collect()
    n_docs = media.count()
    assert len(rows) == n_docs
    by_id = {r["media_id"]: r for r in rows}
    # checksum matches a driver-side md5 of the same payload
    import hashlib

    sample = media.filter(F.col("media_id") == 0).collect()[0]
    assert by_id[0]["checksum"] == hashlib.md5(sample["content"]).hexdigest()
    assert by_id[0]["n_bytes"] == len(sample["content"])
    # images got fake dimensions; non-images got (0,0)
    for r in rows:
        if r["media_type"] == "image":
            assert r["width"] >= 64 and r["height"] >= 64
        else:
            assert r["width"] == 0 and r["height"] == 0
        assert len(r["feat"]) == 3


def test_features_drop_payload_column(spark, media):
    feats = mm.extract_features(media)
    assert "content" not in feats.columns


def test_sample_frames_only_video(spark, media):
    frames = mm.sample_frames(media, every_n_bytes=100, max_frames=4)
    rows = frames.collect()
    video_ids = {r["media_id"] for r in media.filter(F.col("media_type") == "video").collect()}
    assert {r["media_id"] for r in rows} <= video_ids
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_offset"]))
    for mid, fs in per.items():
        idxs = sorted(i for i, _ in fs)
        assert idxs == list(range(len(idxs)))  # dense frame indices
        assert len(fs) <= 4
        offs = [o for _, o in sorted(fs)]
        assert offs == sorted(offs) and all(o % 100 == 0 for o in offs)


def test_resize_images_plumbing(spark, sf_dir):
    """Resize stage: images get deterministic resized payloads sized by the
    target area; non-images pass through unchanged."""
    from flink_adcom_spark.operators.multimodal import media_from_documents, resize_images
    from flink_adcom_spark.tables import load_table

    media = media_from_documents(load_table(spark, sf_dir, "documents").limit(60))
    out = resize_images(media, target_w=32, target_h=32).collect()
    src = {r["media_id"]: r for r in media.collect()}
    assert len(out) == len(src)
    n_target = max(1, 32 * 32 // 64)
    for r in out:
        if r["media_type"] == "image":
            assert r["target_w"] == 32 and r["target_h"] == 32
            assert r["width"] > 0 and r["height"] > 0
            assert len(r["content"]) <= n_target
        else:
            assert r["target_w"] is None
            assert bytes(r["content"] or b"") == bytes(src[r["media_id"]]["content"] or b"")
    # determinism: same input -> identical payloads
    out2 = {r["media_id"]: bytes(r["content"] or b"") for r in resize_images(media, 32, 32).collect()}
    assert {r["media_id"]: bytes(r["content"] or b"") for r in out} == out2
