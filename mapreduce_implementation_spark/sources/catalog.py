"""Table catalog over the driver-generated parquet testdata.

The reference engine's only source is a chunked plain-text file
(/root/reference/Worker.cc:123-141). The rebuilt engine is columnar-first:
parquet scans get predicate pushdown, column pruning and partition
pruning from Catalyst for free — at 100 TB the scan is the dominant cost
and these prunings are the difference between reading terabytes and
reading gigabytes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (they
# grow sublinearly or are fixed-size in TPC-H-style generators).
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos as
    long and floor-convert to a microsecond timestamp — byte-identical
    to DuckDB's own ns→µs truncation. Integer ``div`` (not ``/``) is
    essential: epoch-nanos ≈ 1.7e18 exceeds double's 2^53 exact range.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Pin UTC so NTZ↔epoch conversions are deterministic even when the
    # caller's session (e.g. the verify driver's) didn't set a timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so spark.sql() can reach it."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
