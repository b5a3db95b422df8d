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
    """Load one testdata table as a DataFrame (lazy parquet scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so spark.sql() can reach it."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
