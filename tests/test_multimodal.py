"""Multimodal operators with REAL stdlib codecs: pure-Python round
trips, Spark-side encode → Arrow transfer → decode, 1→N frame
expansion, resize pixel math. (Value-level parity vs DuckDB is covered
by test_oracle_parity.py for the registered queries.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions import codecs as cx
from mapreduce_implementation_spark.operators import multimodal as mm
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_png_roundtrip_and_filters():
    w, h = 21, 9
    rgb = bytes((r * 31 + i) % 256 for r in range(h) for i in range(w * 3))
    assert cx.decode_png(cx.encode_png(w, h, rgb)) == (w, h, rgb)
    with pytest.raises(ValueError):
        cx.decode_png(b"not a png")


def test_wav_roundtrip():
    samples = [((i * 977) % 65536) - 32768 for i in range(500)]
    rate, got = cx.decode_wav(cx.encode_wav(22050, samples))
    assert rate == 22050 and got == samples


def test_video_container_roundtrip():
    f0 = cx.encode_png(4, 4, bytes(48))
    f1 = cx.encode_png(4, 4, bytes([255]) * 48)
    ms, frames = cx.decode_video(cx.encode_video([f0, f1], 40))
    assert ms == 40 and frames == [f0, f1]


def test_media_table_schema_and_types(spark):
    media = mm.media_table(load_table(spark, SF, "documents"))
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["n_bytes"] == "bigint"
    assert fields["media_type"] == "string"
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == set(mm.MEDIA_TYPES)


def test_encoded_payloads_are_real_containers(spark):
    media = mm.build_encoded_media(load_table(spark, SF, "documents"))
    rows = media.limit(30).collect()
    assert rows
    for r in rows:
        payload = bytes(r.payload)
        if r.media_type == "image":
            w, h, rgb = cx.decode_png(payload)
            assert (w, h) == (16 + r.doc_id % 17, 16 + (3 * r.doc_id) % 13)
            assert len(rgb) == w * h * 3
        elif r.media_type == "audio":
            rate, samples = cx.decode_wav(payload)
            assert rate == 8000 + (r.doc_id % 3) * 8000
            assert len(samples) == 800 + (r.doc_id % 5) * 400
        else:
            ms, frames = cx.decode_video(payload)
            assert ms == 40 and len(frames) == 4 + r.doc_id % 9


def test_decode_roundtrips_generator_dims(spark):
    media = mm.build_encoded_media(load_table(spark, SF, "documents"))
    decoded = {r.doc_id: r for r in mm.decode_media(media).collect()}
    assert decoded
    for doc_id, r in decoded.items():
        if r.media_type == "image":
            assert (r.width, r.height) == (16 + doc_id % 17, 16 + (3 * doc_id) % 13)
            assert r.decoded_bytes == r.width * r.height * 3
        elif r.media_type == "audio":
            n = 800 + (doc_id % 5) * 400
            assert r.sample_rate == 8000 + (doc_id % 3) * 8000
            assert r.decoded_bytes == n * 2
            assert r.duration_ms == n * 1000 // r.sample_rate
        else:
            assert r.n_frames == 4 + doc_id % 9
            assert r.duration_ms == r.n_frames * 40


def test_frame_sample_expansion_and_pixels(spark):
    media = mm.build_encoded_media(load_table(spark, SF, "documents"))
    videos = media.where(F.col("media_type") == "video")
    frames = mm.sample_frames(videos, step=4).collect()
    expected = sum(
        -(-(4 + r.doc_id % 9) // 4) for r in videos.select("doc_id").collect()
    )
    assert len(frames) == expected
    for fr in frames:
        assert fr.frame_idx % 4 == 0 and fr.frame_ts_ms == fr.frame_idx * 40
        v = (7 * fr.doc_id + 13 * fr.frame_idx) % 256
        assert fr.pixel_sum == fr.frame_w * fr.frame_h * 3 * v


def test_resize_real_pixels(spark):
    media = mm.build_encoded_media(load_table(spark, SF, "documents"))
    images = media.where(F.col("media_type") == "image")
    out = mm.resize_images(images, 224, 224).collect()
    assert len(out) == images.count()
    for row in out[:10]:
        assert row.scale_x == pytest.approx(224 / row.width)
        assert row.out_bytes == 224 * 224 * 3
        expected = 3 * 224 * sum(
            (row.doc_id + (rr * row.height) // 224) % 256 for rr in range(224)
        )
        assert row.pixel_sum == expected
