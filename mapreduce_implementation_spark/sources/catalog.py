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


def parquet_long_ts_is_nanos(path: str, ts_col: str = "ts") -> bool:
    """True iff the parquet footer types ``ts_col`` as timestamp[ns] —
    the encoding Spark's ``nanosAsLong`` flag surfaces as LongType.

    The footer's logical type is AUTHORITATIVE where magnitude
    heuristics are not: a 1970-era nanos value (1e15) is numerically
    identical to a 2001-era micros value. One driver-side footer read
    (pyarrow dataset schema — no data pages); False on plain int64 or
    any sniff failure, which routes the load through the per-row
    magnitude guard instead."""
    try:
        import pyarrow as pa
        import pyarrow.dataset as ds

        field = ds.dataset(path, format="parquet").schema.field(ts_col)
        return pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    except Exception:
        return False


def normalize_event_ts(
    df: DataFrame, ts_col: str = "ts", long_is_nanos: bool = False
) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (µs, UTC instant)
    regardless of how the writer encoded it.

    Real lakes mix encodings — a fixed assumption about one writer's
    choice is a day-one breakage for everyone else. Handled:

    * LONG — parquet TIMESTAMP(NANOS) read via ``nanosAsLong`` (Spark's
      vectorized reader rejects nanos outright). Floor-convert with
      integer ``div`` — epoch-nanos ≈ 1.7e18 exceeds double's 2^53
      exact range, so ``/`` would corrupt low digits. A LongType column
      is ambiguous by TYPE alone: a writer emitting plain BIGINT
      epoch-micros/millis/seconds looks identical, and dividing those
      by 1000 is silent garbage. ``long_is_nanos=True`` declares the
      encoding known (callers should derive it from the parquet footer
      — ``parquet_long_ts_is_nanos`` — or a fixture contract);
      otherwise the conversion carries a per-row magnitude guard
      (epoch-nanos for 1973–2128 live in [1e17, 5e18]) that raises
      with the offending value instead of guessing. One codegen
      comparison per row; no driver-side sampling job.
    * TIMESTAMP_NTZ — µs parquet without UTC adjustment (DuckDB,
      pandas default). Cast to TIMESTAMP; the session pins UTC so the
      NTZ→LTZ reinterpretation is instant-preserving.
    * TIMESTAMP — already what we want.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dtype = df.schema[ts_col].dataType
    if isinstance(dtype, LongType):
        src = F.col(ts_col)
        if not long_is_nanos:
            nanos_lo = 100_000_000_000_000_000
            nanos_hi = 5_000_000_000_000_000_000
            src = F.when(
                F.col(ts_col).isNull()
                | F.col(ts_col).between(nanos_lo, nanos_hi),
                F.col(ts_col),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"{ts_col} is LONG but outside the epoch-nanos "
                            "range [1e17, 5e18] — writer likely emitted "
                            "micros/millis/seconds; refusing to silently "
                            "divide. Pass long_is_nanos=True only if the "
                            "encoding is genuinely nanos. Offending value: "
                        ),
                        F.col(ts_col).cast("string"),
                    )
                )
            )
        return (
            df.withColumn("_ts_nanos_checked", src)
            .withColumn(
                ts_col,
                F.timestamp_micros(F.expr("_ts_nanos_checked div 1000")),
            )
            .drop("_ts_nanos_checked")
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
        df = spark.read.parquet(path)
        from pyspark.sql.types import LongType

        long_is_nanos = isinstance(
            df.schema["ts"].dataType, LongType
        ) and parquet_long_ts_is_nanos(path)
        return normalize_event_ts(df, long_is_nanos=long_is_nanos)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so spark.sql() can reach it."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
