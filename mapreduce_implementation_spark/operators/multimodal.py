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

The codecs are REAL: PNG (zlib/struct, all five row filters), PCM WAV,
and an SVID framed-PNG video container — implemented from the public
specs in functions/codecs.py (the environment has no PIL/librosa/av,
but these formats don't need them). ``build_encoded_media`` writes real
containers from deterministic doc_id-keyed generators; the decode /
resize / frame-sample operators parse those bytes back, and the DuckDB
oracles predict every decoded field from the same generator formulas —
a green hash therefore proves the byte-level round trip, not just the
plumbing.

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
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ("image", "audio", "video")

# "svid" = the homegrown framed-PNG video container (functions/codecs.py)
# — labeled truthfully; real H.264 needs av/ffmpeg, absent in this env.
_CODEC = {"image": "png", "audio": "pcm_s16le", "video": "svid"}


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


def _ship_codecs_by_value() -> None:
    """Executor closures referencing the codecs module must pickle it BY
    VALUE: the driver contract hands us an arbitrary SparkSession whose
    Python workers may not have this package on sys.path (they don't
    when the driver's cwd isn't the repo root)."""
    from pyspark import cloudpickle

    from mapreduce_implementation_spark.functions import codecs

    cloudpickle.register_pickle_by_value(codecs)


def _generators():
    """Deterministic media generators, keyed ONLY by doc_id — the DuckDB
    oracles recompute every decoded field from these same formulas, so a
    green hash means the real encode → decode round trip reproduced
    them from actual container bytes.

    image: W=16+id%17, H=16+(3id)%13, row r bytes all (id+r)%256
    audio: rate=8000+(id%3)*8000, n=800+(id%5)*400,
           sample i = ((31id+17i)%65536)-32768
    video: frames=4+id%9 at 40ms, frame i pixels all (7id+13i)%256
    """

    def dims(doc_id: int) -> tuple[int, int]:
        return 16 + doc_id % 17, 16 + (3 * doc_id) % 13

    def image_rgb(doc_id: int) -> bytes:
        w, h = dims(doc_id)
        return b"".join(
            bytes([(doc_id + r) % 256]) * (w * 3) for r in range(h)
        )

    def audio_samples(doc_id: int) -> tuple[int, list[int]]:
        rate = 8000 + (doc_id % 3) * 8000
        n = 800 + (doc_id % 5) * 400
        return rate, [((31 * doc_id + 17 * i) % 65536) - 32768 for i in range(n)]

    from mapreduce_implementation_spark.functions.codecs import encode_png

    def video_frames(doc_id: int) -> list[bytes]:
        w, h = dims(doc_id)
        n_frames = 4 + doc_id % 9
        return [
            encode_png(w, h, bytes([(7 * doc_id + 13 * i) % 256]) * (w * h * 3))
            for i in range(n_frames)
        ]

    return dims, image_rgb, audio_samples, video_frames


ENCODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def build_encoded_media(docs: DataFrame) -> DataFrame:
    """REAL encoded payloads: PNG images, PCM WAV audio, SVID-framed PNG
    video — built per doc_id inside Arrow-batched mapInPandas (stdlib
    codecs, functions/codecs.py). One row per doc, binary payload."""
    _ship_codecs_by_value()
    # captured as closure cells so cloudpickle ships them (and the
    # registered codecs module) BY VALUE to the workers
    from mapreduce_implementation_spark.functions.codecs import (
        encode_png,
        encode_video,
        encode_wav,
    )

    dims, image_rgb, audio_samples, video_frames = _generators()

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {"doc_id": [], "media_type": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "image":
                    w, h = dims(doc_id)
                    payload = encode_png(w, h, image_rgb(doc_id))
                elif kind == "audio":
                    rate, samples = audio_samples(doc_id)
                    payload = encode_wav(rate, samples)
                else:
                    payload = encode_video(video_frames(doc_id), 40)
                out["doc_id"].append(doc_id)
                out["media_type"].append(kind)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(batches, ENCODED_SCHEMA)


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", LongType()),
        StructField("decoded_bytes", LongType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """REAL header+payload decode via Arrow-batched mapInPandas: parses
    the PNG/WAV/SVID containers byte-for-byte (functions/codecs.py) and
    reports the decoded dimensions and payload sizes. Narrow — no
    shuffle; the binary column never leaves the Python worker."""
    _ship_codecs_by_value()
    from mapreduce_implementation_spark.functions.codecs import (
        decode_png,
        decode_video,
        decode_wav,
    )

    schema_fields = [f.name for f in DECODED_SCHEMA.fields]
    tail_fields = schema_fields[2:]

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = {k: [] for k in schema_fields}
            for doc_id, mt, pl in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(pl)
                if mt == "image":
                    w, h, rgb = decode_png(payload)
                    vals = (w, h, 1, 0, 0, len(rgb))
                elif mt == "audio":
                    rate, samples = decode_wav(payload)
                    vals = (0, 0, 0, len(samples) * 1000 // rate, rate, len(samples) * 2)
                else:
                    frame_ms, frames = decode_video(payload)
                    w, h, rgb = decode_png(frames[0])
                    vals = (w, h, len(frames), len(frames) * frame_ms, 0,
                            len(frames) * len(rgb))
                rows["doc_id"].append(int(doc_id))
                rows["media_type"].append(mt)
                for f, v in zip(tail_fields, vals):
                    rows[f].append(v)
            yield pd.DataFrame(rows)

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
        StructField("pixel_sum", LongType()),
    ]
)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL image resize: decode the PNG, nearest-neighbor resample to
    (target_w, target_h), report the actual output buffer size and its
    pixel sum (the oracle predicts the sum from the generator formulas,
    so a green hash proves the resample read real pixels). Input should
    be pre-filtered to media_type='image' so the Arrow transfer only
    carries image bytes."""
    _ship_codecs_by_value()
    from mapreduce_implementation_spark.functions.codecs import decode_png

    resized_fields = [f.name for f in RESIZED_SCHEMA.fields]

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = {k: [] for k in resized_fields}
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode_png(bytes(pl))
                stride = w * 3
                resized = bytearray()
                for rr in range(target_h):
                    sr = rr * h // target_h
                    row = rgb[sr * stride : (sr + 1) * stride]
                    for rc in range(target_w):
                        sc = rc * w // target_w
                        resized += row[sc * 3 : sc * 3 + 3]
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["target_w"].append(target_w)
                rows["target_h"].append(target_h)
                rows["scale_x"].append(target_w / w)
                rows["scale_y"].append(target_h / h)
                rows["out_bytes"].append(len(resized))
                rows["pixel_sum"].append(sum(resized))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame_w", LongType()),
        StructField("frame_h", LongType()),
        StructField("pixel_sum", LongType()),
    ]
)


def sample_frames(media: DataFrame, step: int = 4) -> DataFrame:
    """REAL frame sampling: parse the SVID container, decode every
    ``step``-th PNG frame, emit its timestamp, dimensions and pixel sum
    (oracle-predicted from the generators). The 1→N row expansion shape —
    run AFTER metadata filters so only selected videos fan out."""
    _ship_codecs_by_value()
    from mapreduce_implementation_spark.functions.codecs import (
        decode_png,
        decode_video,
    )

    frame_fields = [f.name for f in FRAMES_SCHEMA.fields]

    def batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = {k: [] for k in frame_fields}
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                frame_ms, frames = decode_video(bytes(pl))
                for i in range(0, len(frames), step):
                    w, h, rgb = decode_png(frames[i])
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * frame_ms)
                    rows["frame_w"].append(w)
                    rows["frame_h"].append(h)
                    rows["pixel_sum"].append(sum(rgb))
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)
