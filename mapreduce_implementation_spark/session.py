"""SparkSession factory with defaults tuned for both local tests and scale.

Local test profile: local[$SPARK_GRAFT_CPUS] (default 32), 32 shuffle
partitions. At cluster scale the same code runs unchanged — the defaults
here are all safe on a 1000-executor cluster:

* AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — the primary scale lever.
* Arrow on for any pandas-UDF path (vectorized Python transfer).
* Session timezone pinned to UTC so timestamp semantics are stable
  between Spark, parquet metadata, and the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "mapreduce-implementation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32) for the test
    environment; on a real cluster pass ``None`` and submit with
    ``spark-submit --master ...`` (an existing session is reused as-is).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Split small single-file scans across the cores: the default
        # 128 MiB split makes a ~50 MiB bench table a 1-task scan, which
        # serializes scan-stage expression work 32×. 8 MiB is a LOCAL
        # profile knob — on a real cluster the default is right (row
        # groups are plentiful and tiny splits would bloat scheduling),
        # so it's env-overridable.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # saveAsTable target (bucketed tables); keep it out of the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/mris-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
