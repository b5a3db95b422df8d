"""Streaming sources over the testdata layouts.

File-based streams (each new file = a micro-batch) so tests and demos
run hermetically; in production the same DataFrames come from Kafka —
every transformation downstream is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

# Legacy events encoding: parquet TIMESTAMP(NANOS) exposed as long via
# ``nanosAsLong``. Only for callers (hermetic tests) that stage nanos
# fixtures into an initially-empty stream dir, where the schema cannot
# be sniffed from files; production paths derive the schema from disk.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, input_dir: str, glob: str | None = None
) -> DataFrame:
    """Stream the documents layout, sniffing the schema from the files
    when any exist (same writer-drift armor as read_events_stream);
    DOCUMENTS_SCHEMA is only the empty-dir fallback for streams that
    start before their first file arrives."""
    from pyspark.errors import AnalysisException

    schema = DOCUMENTS_SCHEMA
    try:
        batch = spark.read
        if glob:
            batch = batch.option("pathGlobFilter", glob)
        schema = batch.parquet(input_dir).schema
    except AnalysisException:
        # missing path / nothing to infer yet — trust the declared
        # layout. Real IO failures (permissions, corrupt footers) are
        # NOT AnalysisException and propagate instead of silently
        # falling back to a schema that may misread the files later.
        pass
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(input_dir)


def read_events_stream(
    spark: SparkSession,
    input_dir: str,
    glob: str | None = None,
    schema: StructType | None = None,
) -> DataFrame:
    """Stream the events layout with a schema DERIVED from the files.

    A readStream needs an explicit schema, but hardcoding one silently
    corrupts data the moment the upstream writer changes timestamp
    encoding (µs-timestamp read as long → ~1970-epoch garbage, zero
    errors raised). So: one batch metadata read of the same path
    supplies the actual on-disk schema, and ``normalize_event_ts``
    converts ``ts`` per-encoding exactly as the batch catalog does.

    ``schema`` overrides the sniff — required when the stream starts on
    an empty directory (nothing to sniff yet); the caller then promises
    the files it will feed match it, INCLUDING that a LongType ``ts``
    really is epoch-nanos (EVENTS_RAW_SCHEMA's contract).
    """
    from pyspark.sql.types import LongType

    from mapreduce_implementation_spark.sources.catalog import (
        normalize_event_ts,
        parquet_long_ts_is_nanos,
    )

    # Required to read the legacy TIMESTAMP(NANOS) encoding at all;
    # no-op for µs encodings.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        batch = spark.read
        if glob:
            batch = batch.option("pathGlobFilter", glob)
        schema = batch.parquet(input_dir).schema
        # schema came from real files → the parquet footer can also
        # settle whether a LongType ts is genuinely nanos
        long_is_nanos = isinstance(
            schema["ts"].dataType, LongType
        ) and parquet_long_ts_is_nanos(input_dir)
    else:
        # explicit schema = the caller's encoding promise (empty-dir
        # streams have nothing to sniff)
        long_is_nanos = isinstance(schema["ts"].dataType, LongType)

    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return normalize_event_ts(
        reader.parquet(input_dir), long_is_nanos=long_is_nanos
    )
