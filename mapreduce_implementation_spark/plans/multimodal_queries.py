"""Multimodal-column queries — binary payloads + typed metadata over
``documents`` (operators/multimodal.py).

The decode/resize/frame-sample operators run REAL mapInPandas plumbing
(Arrow binary transfer, per-row byte access, 1→N expansion); the codec
is the deterministic fake (byte-length-derived headers), so every query
here has an exact DuckDB oracle: the same formulas over
``octet_length(encode(text))``.

DuckDB parity notes:
* Spark ``encode(text,'UTF-8')`` ≙ DuckDB ``encode(text)`` (VARCHAR→BLOB)
* Spark ``md5(payload)`` hashes the UTF-8 bytes; DuckDB's md5 only
  accepts VARCHAR, and ``md5(text)`` hashes those same UTF-8 bytes
* all header fields are int64 arithmetic — exact on both sides
* scale factors: double division of exact ints — identical IEEE ops
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators import multimodal as mm
from mapreduce_implementation_spark.plans.registry import register
from mapreduce_implementation_spark.sources.catalog import load_table

# DuckDB fragments mirroring operators/multimodal.py exactly
_N = "octet_length(encode(text))"
_MEDIA_TYPE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)
_CODEC = (
    "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'pcm_s16le' ELSE 'h264' END"
)
_WIDTH = f"32 + {_N} % 97"
_HEIGHT = f"32 + ({_N} * 7) % 89"
_N_FRAMES = f"1 + {_N} % 24"
_DURATION = f"1000 + {_N} % 9000"
_SAMPLE_RATE = f"8000 + ({_N} % 5) * 8000"


@register(
    "multimodal_catalog",
    tables=("documents",),
    oracle=f"""
        SELECT {_MEDIA_TYPE} AS media_type,
               {_CODEC} AS codec,
               COUNT(*) AS n_files,
               CAST(SUM({_N}) AS BIGINT) AS total_bytes,
               COUNT(DISTINCT md5(text)) AS n_distinct_payloads
        FROM documents
        GROUP BY 1, 2
    """,
)
def multimodal_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media catalog rollup: files/bytes/distinct payloads per
    (media_type, codec). Pure metadata aggregation — the payload column
    is pruned out before the shuffle (only md5 hex travels)."""
    media = mm.media_table(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type", "codec").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_bytes").alias("total_bytes"),
        F.count_distinct("payload_md5").alias("n_distinct_payloads"),
    )


@register(
    "media_decode_dims",
    tables=("documents",),
    oracle=f"""
        SELECT doc_id,
               {_MEDIA_TYPE} AS media_type,
               CAST({_N} AS BIGINT) AS n_bytes,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE {_WIDTH} END AS BIGINT) AS width,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE {_HEIGHT} END AS BIGINT) AS height,
               CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 0
                    ELSE {_N_FRAMES} END AS BIGINT) AS n_frames,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE {_DURATION} END AS BIGINT) AS duration_ms,
               CAST(CASE WHEN doc_id % 3 = 1 THEN {_SAMPLE_RATE} ELSE 0 END AS BIGINT) AS sample_rate
        FROM documents
    """,
)
def media_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header decode of every payload via Arrow-batched mapInPandas —
    per-row byte access in Python, narrow (no shuffle)."""
    media = mm.media_table(load_table(spark, sf_dir, "documents"))
    return mm.decode_media(media, decoder="fake")


@register(
    "image_resize_224",
    tables=("documents",),
    oracle=f"""
        SELECT doc_id,
               CAST({_WIDTH} AS BIGINT) AS width,
               CAST({_HEIGHT} AS BIGINT) AS height,
               CAST(224 AS BIGINT) AS target_w,
               CAST(224 AS BIGINT) AS target_h,
               224.0 / ({_WIDTH}) AS scale_x,
               224.0 / ({_HEIGHT}) AS scale_y,
               CAST(224 * 224 * 3 AS BIGINT) AS out_bytes
        FROM documents
        WHERE doc_id % 3 = 0
    """,
)
def image_resize_224(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-224×224 plan over image payloads. The media_type filter
    runs BEFORE mapInPandas so only image bytes cross the Arrow
    boundary — at 100 TB that's the difference between shipping the
    whole corpus into Python and a third of it."""
    media = mm.media_table(load_table(spark, sf_dir, "documents"))
    return mm.resize_images(media.where(F.col("media_type") == "image"), 224, 224)


@register(
    "video_frame_sample",
    tables=("documents",),
    oracle=f"""
        SELECT doc_id,
               CAST(f AS BIGINT) AS frame_idx,
               CAST(duration_ms * f // n_frames AS BIGINT) AS frame_ts_ms,
               md5(h || ':' || CAST(f AS VARCHAR)) AS frame_md5
        FROM (
            SELECT doc_id,
                   UNNEST(range(0, 1 + n % 24, 4)) AS f,
                   1 + n % 24 AS n_frames,
                   1000 + n % 9000 AS duration_ms,
                   md5(text) AS h
            FROM (SELECT doc_id, text, {_N} AS n FROM documents
                  WHERE doc_id % 3 = 2)
        )
    """,
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-4th-frame sampling from video payloads — the 1→N
    mapInPandas expansion, run after the media_type filter."""
    media = mm.media_table(load_table(spark, sf_dir, "documents"))
    return mm.sample_frames(media.where(F.col("media_type") == "video"), step=4)
