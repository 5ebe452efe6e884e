"""Multimodal binary-column plumbing tests (schema, Arrow batching, kernel
pluggability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cinegraph_spark.multimodal.binary_ops import (
    extract_features,
    frame_sample_plan,
    real_decoder,
    synth_media,
)
from cinegraph_spark.queries.util import T


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synth_media(T(spark, sf_dir, "documents"))


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "kind": "string",
        "payload": "binary",
        "meta": "map<string,string>",
    }


def test_extract_features_roundtrip(media):
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert r.kind in ("image", "audio", "video")
        assert r.header == "MEDIA"
        assert r.width == (r.media_id % 64) * 16 + 16
        assert r.height == (r.media_id % 48) * 16 + 16
        assert r.duration_ms == (r.media_id % 9000) + 1000
        assert r.n_bytes > 0 and r.checksum >= 0


def test_checksum_deterministic(media):
    a = {r.media_id: r.checksum for r in extract_features(media).collect()}
    b = {r.media_id: r.checksum for r in extract_features(media).collect()}
    assert a == b


def test_custom_decoder_injection(media):
    calls = []

    def decoder(payload: bytes) -> dict:
        calls.append(1)
        return {"header": "CUSTOM", "width": 1, "height": 2, "duration_ms": 3}

    out = extract_features(media.limit(5), decoder=decoder).collect()
    assert all(r.header == "CUSTOM" and r.width == 1 for r in out)


def test_real_decoder_is_marked_stub():
    with pytest.raises(NotImplementedError):
        real_decoder(b"anything")


def test_frame_sample_counts(media):
    plan = frame_sample_plan(media, every_ms=1000)
    counts = {r.media_id: r.n for r in plan.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durations = {
        r.media_id: r.duration_ms
        for r in extract_features(media.filter(F.col("kind") == "video")).collect()
    }
    assert set(counts) == set(durations)
    for mid, n in counts.items():
        assert n == -(-durations[mid] // 1000)  # ceil(duration/1000)
