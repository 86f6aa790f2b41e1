"""Multimodal plumbing: binary round-trip exactness, frame-sampling shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from k_means_map_reduce_spark.operators.multimodal import (
    _FRAME_BYTES,
    _SAMPLE_EVERY,
    extract_features,
    media_table,
    sample_frames,
)
from k_means_map_reduce_spark.sources import load_table


def test_binary_roundtrip_sha(spark, sf_dir):
    """Bytes must survive Spark→Arrow→pandas unchanged (sha256 equality
    against driver-side hashing of the source text)."""
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").limit(20).collect()}
    feats = {
        r["doc_id"]: (r["n_bytes"], r["sha256"])
        for r in extract_features(media_table(spark, sf_dir)).collect()
    }
    for doc_id, text in docs.items():
        raw = text.encode("utf-8")
        assert feats[doc_id] == (len(raw), hashlib.sha256(raw).hexdigest())


def test_stub_codec_deterministic(spark, sf_dir):
    a = extract_features(media_table(spark, sf_dir)).orderBy("doc_id").collect()
    b = extract_features(media_table(spark, sf_dir)).orderBy("doc_id").collect()
    assert a == b
    assert all(64 <= r["width"] <= 255 and 64 <= r["height"] <= 255 for r in a)


def test_frame_sampling_counts(spark, sf_dir):
    media = media_table(spark, sf_dir).limit(10).cache()
    frames = sample_frames(media)
    got = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in media.collect():
        n_frames = len(r["media"]) // _FRAME_BYTES
        expected = len(range(0, n_frames, _SAMPLE_EVERY))
        assert got.get(r["doc_id"], 0) == expected
    # every sampled frame is exactly _FRAME_BYTES long
    lens = frames.select(F.length("frame").alias("l")).distinct().collect()
    assert {r["l"] for r in lens} <= {_FRAME_BYTES}


def test_resize_output_size_contract(spark, sf_dir):
    from k_means_map_reduce_spark.operators.multimodal import (
        _RESIZE_H,
        _RESIZE_W,
        media_table,
        resize_media,
    )
    from pyspark.sql import functions as F

    out = resize_media(media_table(spark, sf_dir))
    bad = out.where(F.length("resized") != _RESIZE_W * _RESIZE_H).count()
    assert bad == 0
    assert out.count() == media_table(spark, sf_dir).count()


def test_resize_deterministic(spark, sf_dir):
    from k_means_map_reduce_spark.registry import QUERIES

    a = sorted(map(tuple, QUERIES["multimodal_resize"](spark, sf_dir).collect()))
    b = sorted(map(tuple, QUERIES["multimodal_resize"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0
