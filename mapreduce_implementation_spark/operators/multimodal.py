"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The reference engine has no media handling (its only input is a line
text file, /root/reference/Worker.cc:123-141); this is part of the
LLM-training-data extension set. The design principle: the *payload*
stays an opaque ``binary`` column end-to-end (never decoded JVM-side,
never collect()ed), and the *metadata* is typed columns so Catalyst can
prune/push down on them — at 100 TB you filter on metadata at the scan
and only ship the payload bytes of surviving rows into the Python
workers via Arrow.

Decode plumbing is REAL (schema, Arrow binary transfer, batch iteration,
1→N frame expansion); the codec itself is STUBBED: the container has no
PIL/librosa/av, so ``decode_media(..., decoder="real")`` raises
``NotImplementedError`` and the default ``"fake"`` decoder derives
deterministic dimensions from the payload byte length — same control
flow, same schema, oracle-checkable.

Scale notes (100 TB):
* all three operators are per-row ``mapInPandas`` — narrow, no shuffle;
  parallelism = input file splits. ``spark.sql.files.maxPartitionBytes``
  bounds the Arrow batch footprint (payloads ride inside the batch).
* frame sampling multiplies rows ~n_frames/step ×; it happens AFTER
  metadata filters so the expansion only pays for selected videos.
* never put the payload in a shuffle key or a groupBy — aggregate on
  metadata/fingerprint columns (md5 hex) instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

_CODEC = {"image": "png", "audio": "pcm_s16le", "video": "h264"}


def media_table(docs: DataFrame) -> DataFrame:
    """Build the media catalog from ``documents``: each doc's text bytes
    become an opaque binary ``payload`` (the testdata has no real media
    files; UTF-8 bytes are a stand-in with identical plumbing), plus
    typed metadata columns Catalyst can prune on.

    media_type is assigned deterministically by doc_id % 3 so the
    DuckDB oracle can replicate the catalog exactly.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    codec = (
        F.when(F.col("media_type") == "image", F.lit(_CODEC["image"]))
        .when(F.col("media_type") == "audio", F.lit(_CODEC["audio"]))
        .otherwise(F.lit(_CODEC["video"]))
    )
    return (
        docs.select(
            "doc_id",
            "source",
            payload.alias("payload"),
            media_type.alias("media_type"),
        )
        .withColumn("n_bytes", F.octet_length("payload").cast("long"))
        .withColumn("codec", codec)
        .withColumn("payload_md5", F.md5("payload"))
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", LongType()),
    ]
)


def _make_fake_decode():
    """Deterministic stand-in decode: header fields derived from the
    payload byte length (the bytes ARE materialized in Python — this is
    the identical Arrow transfer a real decoder would pay).

    Returned fn: (media_type, payload) → (width, height, n_frames,
    duration_ms, sample_rate).

    Factory returning a NESTED function on purpose: executor-side
    closures must be pickled BY VALUE (locals), not by module
    reference — the driver contract hands us an arbitrary
    SparkSession whose Python workers may not have this package on
    sys.path (they don't when the driver's cwd isn't the repo root).
    """

    def fake_decode(media_type: str, payload: bytes):
        n = len(payload)
        if media_type == "image":
            return 32 + n % 97, 32 + (n * 7) % 89, 1, 0, 0
        if media_type == "audio":
            return 0, 0, 0, 1000 + n % 9000, 8000 + (n % 5) * 8000
        # video
        return 32 + n % 97, 32 + (n * 7) % 89, 1 + n % 24, 1000 + n % 9000, 0

    return fake_decode


def _make_real_decode():
    def real_decode(media_type: str, payload: bytes):
        raise NotImplementedError(
            "real media decode needs PIL/librosa/av, which are not "
            "installed in this environment; use decoder='fake' — it "
            "exercises the same Spark plumbing (schema, Arrow batch "
            "transfer, per-row byte access) with deterministic outputs"
        )

    return real_decode


def decode_media(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payload headers → typed media dimensions, one output row
    per input row, via Arrow-batched ``mapInPandas``.

    Narrow (no shuffle); the payload column is pruned from everything
    downstream of this operator.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    decode = _make_fake_decode() if decoder == "fake" else _make_real_decode()

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            decoded = [
                decode(mt, bytes(pl))
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": [len(bytes(pl)) for pl in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "duration_ms": [d[3] for d in decoded],
                    "sample_rate": [d[4] for d in decoded],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        batches, DECODED_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("target_w", LongType()),
        StructField("target_h", LongType()),
        StructField("scale_x", DoubleType()),
        StructField("scale_y", DoubleType()),
        StructField("out_bytes", LongType()),
    ]
)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plan for image payloads: decodes dims (fake), computes the
    scale factors and the RGB output buffer size. A real implementation
    swaps the body for PIL ``Image.resize`` and emits the re-encoded
    payload; schema, batching and partitioning are already the real
    thing. Input should be pre-filtered to media_type='image' so the
    Arrow transfer only carries image bytes."""

    decode = _make_fake_decode()

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            dims = [decode("image", bytes(pl)) for pl in pdf["payload"]]
            w = pd.Series([d[0] for d in dims], dtype="int64")
            h = pd.Series([d[1] for d in dims], dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "width": w,
                    "height": h,
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale_x": target_w / w,
                    "scale_y": target_h / h,
                    "out_bytes": target_w * target_h * 3,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, step: int = 4) -> DataFrame:
    """Sample every ``step``-th frame from video payloads — the 1→N row
    expansion shape (a real build decodes frame ``i`` here and emits its
    pixels/JPEG bytes). frame_ts_ms spaces frames uniformly over the
    clip; frame_md5 fingerprints (payload, frame) deterministically.

    Expansion factor is n_frames/step per video — run AFTER metadata
    filters so only selected videos fan out."""
    import hashlib

    decode = _make_fake_decode()

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame_md5": [],
            }
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(pl)
                _, _, n_frames, duration_ms, _ = decode("video", payload)
                digest = hashlib.md5(payload).hexdigest()
                for i in range(0, n_frames, step):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(duration_ms * i // n_frames)
                    out["frame_md5"].append(
                        hashlib.md5(f"{digest}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)
