"""Bucketed (hash-clustered) tables — shuffle-FREE co-located fact
joins.

The partitioned-parquet layer (sources/materialize.py) prunes
DIRECTORIES at planning time; bucketing solves the other scale
problem: a fact⋈fact equi-join (orders⋈lineitem on orderkey,
signature⋈signature on doc_id, ...) normally shuffles BOTH sides on
every query. Writing each side once, hash-clustered into the same
number of buckets on the join key (Spark's ``bucketBy`` — the
catalog-backed analog of Hive bucketing), lets every later join read
bucket i against bucket i directly: the exchange disappears from the
plan, and with ``sortBy`` on the key the per-bucket sort goes too —
the join degenerates to a zipper merge over pre-sorted files.

At 100 TB this converts the recurring dominant cost (two corpus-wide
shuffles per join query) into a one-time write-side cost, exactly the
"pre-partition the corpus on its join key" guidance from the scale
brief. The trade: bucketed tables live in the session catalog (the
bucket metadata is catalog state, not directory layout), and the
bucket count is fixed at write time — size it so corpus/n_buckets
stays within one task's memory at the target SF (same arithmetic as
shuffle partition sizing).

The reference engine's analog is its fixed reducer-count partitioning
of intermediate files (/root/reference/Worker.cc:174-183): partition
once, every reducer reads its own slice — this module is that idea as
a reusable table layout instead of a per-job artifact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed catalog table (parquet, external at
    ``path``), replacing any existing table of that name.

    ``sort_cols`` defaults to ``bucket_cols`` — sorted buckets let a
    later same-key join skip its per-task sort as well as its
    exchange. Readers MUST go through ``spark.table(name)`` /
    :func:`read_bucketed_table`: a plain ``spark.read.parquet(path)``
    sees only files and silently loses the bucket metadata (and with
    it the shuffle elision)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(name)


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (catalog read)."""
    return spark.table(name)
