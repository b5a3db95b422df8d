"""Multimodal operator plumbing: binary payload transfer, decode schema,
1→N frame expansion, real-decoder stub gating. (Value-level parity vs
DuckDB is covered by test_oracle_parity.py for the registered queries.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators import multimodal as mm
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_media_table_schema_and_types(spark):
    media = mm.media_table(load_table(spark, SF, "documents"))
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["n_bytes"] == "bigint"
    assert fields["media_type"] == "string"
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == set(mm.MEDIA_TYPES)


def test_decode_matches_payload_lengths(spark):
    media = mm.media_table(load_table(spark, SF, "documents"))
    decoded = mm.decode_media(media).where(F.col("media_type") == "image")
    rows = decoded.limit(20).collect()
    assert rows
    for r in rows:
        assert r.width == 32 + r.n_bytes % 97
        assert r.height == 32 + (r.n_bytes * 7) % 89
        assert (r.n_frames, r.duration_ms, r.sample_rate) == (1, 0, 0)


def test_real_decoder_is_stubbed(spark):
    media = mm.media_table(load_table(spark, SF, "documents")).limit(1)
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, decoder="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
    with pytest.raises(ValueError):
        mm.decode_media(media, decoder="nope")


def test_frame_sample_expansion_count(spark):
    media = mm.media_table(load_table(spark, SF, "documents"))
    videos = media.where(F.col("media_type") == "video")
    expected = sum(
        math.ceil((1 + r.n_bytes % 24) / 4)
        for r in videos.select("n_bytes").collect()
    )
    frames = mm.sample_frames(videos, step=4)
    assert frames.count() == expected
    # frame_idx always a multiple of step and inside the clip
    bad = frames.where(
        (F.col("frame_idx") % 4 != 0) | (F.col("frame_ts_ms") < 0)
    ).count()
    assert bad == 0


def test_resize_scale_factors(spark):
    media = mm.media_table(load_table(spark, SF, "documents"))
    images = media.where(F.col("media_type") == "image")
    out = mm.resize_images(images, 224, 224)
    r = out.limit(5).collect()
    assert r
    for row in r:
        assert row.scale_x == pytest.approx(224 / row.width)
        assert row.out_bytes == 224 * 224 * 3
    assert out.count() == images.count()
