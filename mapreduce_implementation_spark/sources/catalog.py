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


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (µs, UTC instant)
    regardless of how the writer encoded it.

    Real lakes mix encodings — a fixed assumption about one writer's
    choice is a day-one breakage for everyone else. Handled:

    * LONG — parquet TIMESTAMP(NANOS) read via ``nanosAsLong`` (Spark's
      vectorized reader rejects nanos outright). Floor-convert with
      integer ``div`` — epoch-nanos ≈ 1.7e18 exceeds double's 2^53
      exact range, so ``/`` would corrupt low digits.
    * TIMESTAMP_NTZ — µs parquet without UTC adjustment (DuckDB,
      pandas default). Cast to TIMESTAMP; the session pins UTC so the
      NTZ→LTZ reinterpretation is instant-preserving.
    * TIMESTAMP — already what we want.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, LongType):
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    if isinstance(dtype, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if isinstance(dtype, TimestampType):
        return df
    raise TypeError(f"unsupported {ts_col!r} encoding: {dtype}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` arrives in whatever encoding the upstream writer
    chose; ``normalize_event_ts`` branches on the ACTUAL parquet type
    so every encoding yields the same TIMESTAMP column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Pin UTC so NTZ↔epoch conversions are deterministic even when the
    # caller's session (e.g. the verify driver's) didn't set a timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # nanosAsLong only affects TIMESTAMP(NANOS) columns; harmless
        # for µs encodings, required to even read the nanos one.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so spark.sql() can reach it."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
