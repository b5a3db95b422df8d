"""Keyed text source — the reference's InputSplit recast as a DataFrame.

Reference semantics (/root/reference/Worker.cc:123-141): the input is a
plain-text file; map input records are ``(line_no, line_text)`` with
1-based global line numbers, processed in chunks of ``chunk_size`` lines.

Spark mapping: chunking ≙ partitioning (Spark splits text files by byte
ranges; the scheduler handles locality — SURVEY.md §2b). The *observable*
piece is the keyed record, built here. Line numbers use
``zipWithIndex`` which is deterministic for a given file: partition order
× in-partition order equals file order.

At 100 TB you would not key lines at all (the key is dropped by the very
first Map in the reference too — /root/reference/Worker.cc:148-159); this
source exists for fidelity tests and small keyed corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

TEXT_SCHEMA = StructType(
    [
        StructField("line_no", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def read_text_keyed(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """Read a text file as DataFrame[line_no bigint, text string], 1-based.

    Uses an RDD ``zipWithIndex`` (one extra job to count per-partition
    sizes — acceptable: this source is a fidelity shim, not the 100 TB
    path; columnar corpora come pre-keyed in parquet).
    """
    rdd = spark.sparkContext.textFile(path, min_partitions or spark.sparkContext.defaultParallelism)
    keyed = rdd.zipWithIndex().map(lambda t: (t[1] + 1, t[0]))
    return spark.createDataFrame(keyed, schema=TEXT_SCHEMA)


def with_chunk_id(df: DataFrame, chunk_size: int) -> DataFrame:
    """Annotate keyed text with the reference's 1-based chunk id.

    Chunk k covers lines (k-1)*chunk_size+1 … k*chunk_size
    (/root/reference/Worker.cc:128-137).
    """
    return df.withColumn(
        "chunk_id", ((F.col("line_no") - F.lit(1)) / F.lit(chunk_size)).cast("long") + F.lit(1)
    )
