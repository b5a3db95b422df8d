"""Streaming sources over the testdata layouts.

File-based streams (each new file = a micro-batch) so tests and demos
run hermetically; in production the same DataFrames come from Kafka —
every transformation downstream is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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

# events.ts is parquet TIMESTAMP(NANOS) → read as long (see
# sources/catalog.py) and convert with integer div.
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
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(input_dir)


def read_events_stream(
    spark: SparkSession, input_dir: str, glob: str | None = None
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.parquet(input_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
