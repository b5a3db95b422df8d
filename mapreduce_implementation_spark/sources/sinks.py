"""Sinks — the reference's per-reducer output files, Spark-first.

Reference Output stage (/root/reference/Worker.cc:267-274): one text
file per reduce task named ``<output_dir><job_name>-<reducerID+1>.out``
(1-based — SURVEY.md Q6), each line ``word count``, keys ascending
within the file (Q4).

Spark mapping: ``write.partitionBy("reducer_id")`` gives one directory
per reducer; because the frame is repartitioned BY reducer_id first,
every reducer's rows live in exactly one task → exactly one file per
directory, already sorted (sortWithinPartitions upstream). A final
driver-side rename (R files, R small) produces the reference layout.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    cluster: bool = False,
) -> None:
    """Hive-layout partitioned parquet dataset — the 100 TB table
    layout: a filter on a partition column prunes whole directories at
    planning time (PartitionFilters in the scan), so queries read the
    partitions they touch, not the table.

    Choose partition columns with bounded cardinality (date, type,
    tenant) — one directory per value per write; high-cardinality keys
    belong in bucketing or sort order, not partitioning.

    ``cluster=True`` hash-repartitions on the partition columns BEFORE
    the write, so each value's rows co-locate in one task and each
    leaf directory receives ~ONE file instead of one per (task, value)
    — a plain partitionBy write from T tasks over V values commits up
    to T·V small files, which is both this write's commit-overhead
    ceiling and the small-file debt compact_partitioned_dataset exists
    to pay later (round-13 A/B on the 800k IVF index build:
    BASELINE.md). The trade is one extra shuffle of the payload and
    one task per value — fine for bounded-cardinality, roughly
    balanced partition values (the IVF index's centroid lists); for
    skewed values keep the default and compact afterwards, or split
    large leaves with compact's ``files_per_partition``."""
    if cluster:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_reducer_files(
    result: DataFrame,
    output_dir: str,
    job_name: str,
    sep: str = " ",
    num_reducers: int | None = None,
) -> list[str]:
    """Write DataFrame[reducer_id, key, value] (already partitioned and
    sorted by operators.core.map_reduce) as reference-layout files.

    Pass ``num_reducers`` to also materialize EMPTY files for reducers
    that received no keys — the reference writes one file per reduce
    task unconditionally (/root/reference/Worker.cc:267-274).

    Returns the list of files written, in reducer order.
    """
    staging = os.path.join(output_dir, f"_{job_name}_staging")
    (
        result.withColumn("line", F.concat_ws(sep, F.col("key"), F.col("value")))
        .select("reducer_id", "line")
        .write.mode("overwrite")
        .partitionBy("reducer_id")
        .text(staging)
    )
    by_rid: dict[int, str] = {}
    for d in glob.glob(os.path.join(staging, "reducer_id=*")):
        rid = int(d.rsplit("=", 1)[1])
        parts = sorted(glob.glob(os.path.join(d, "part-*")))
        # one partition per reducer_id upstream → exactly one part file
        out_path = os.path.join(output_dir, f"{job_name}-{rid + 1}.out")
        with open(out_path, "wb") as out:
            for p in parts:
                with open(p, "rb") as src:
                    shutil.copyfileobj(src, out)
        by_rid[rid] = out_path
    if num_reducers is not None:
        for rid in range(num_reducers):
            if rid not in by_rid:
                out_path = os.path.join(output_dir, f"{job_name}-{rid + 1}.out")
                open(out_path, "wb").close()
                by_rid[rid] = out_path
    shutil.rmtree(staging)
    # numeric reducer order (lexicographic dir order would give 1,10,11,2…)
    return [by_rid[rid] for rid in sorted(by_rid)]


def paged_leaf_counts(
    spark, path: str, partition_cols: list[str]
) -> dict[tuple, int]:
    """Per-leaf data-file counts of a hive-partitioned dataset via a
    PAGED filesystem walk — ``FileSystem.listStatusIterator`` one
    directory at a time, so the driver holds one directory page plus
    one int per leaf, never the full file-path list (the old
    ``DataFrame.inputFiles()`` form returned every path: at a 100 TB
    sink with millions of files the maintenance job's own listing
    became a driver-memory/latency ceiling; many-leaf wall/residency
    A/B in BASELINE.md round 12). Hidden/_-prefixed files AND
    directories (_SUCCESS, _temporary, .spark-staging-*) are skipped —
    a concurrent writer's staging files are not data files."""
    from urllib.parse import unquote

    sc = spark.sparkContext
    jpath_cls = sc._jvm.org.apache.hadoop.fs.Path
    root = jpath_cls(path)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    counts: dict[tuple, int] = {}
    stack: list[tuple] = [(root, {})]
    while stack:
        d, parts = stack.pop()
        it = fs.listStatusIterator(d)
        nfiles = 0
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if st.isDirectory():
                if name.startswith(("_", ".")):
                    continue
                k, sep, v = name.partition("=")
                sub = dict(parts)
                if sep and k in partition_cols:
                    sub[k] = unquote(v)
                stack.append((st.getPath(), sub))
            elif not name.startswith(("_", ".")):
                nfiles += 1
        if nfiles and len(parts) == len(partition_cols) and not any(
            v == "__HIVE_DEFAULT_PARTITION__" for v in parts.values()
        ):
            key = tuple(parts[c] for c in partition_cols)
            counts[key] = counts.get(key, 0) + nfiles
    return counts


def distributed_leaf_counts(
    spark, path: str, partition_cols: list[str]
) -> dict[tuple, int]:
    """Per-leaf data-file counts via a LISTING JOB — the 100 TB form.

    The paged JVM walk (:func:`paged_leaf_counts`) is driver-memory
    bounded but WALL-bounded by py4j: every file costs ~3 Python↔JVM
    round trips, so a 10⁵-file sink takes minutes of pure driver chat
    (measured: ~19 s at 20k files, BASELINE.md round 12). Here the
    driver walks only the partition-DIRECTORY levels with pyarrow.fs
    (one directory's children in memory at a time, zero py4j), then
    ships the leaf paths to EXECUTORS, which count each leaf's
    non-hidden files with a vectorized ``pyarrow.fs`` listing — no
    py4j anywhere, wall parallelized across the cluster, and the
    driver receives exactly one (partition values, int) pair per
    leaf. ``pyarrow.fs.FileSystem.from_uri`` resolves local / HDFS /
    S3 uniformly, so the same code runs everywhere Spark reads.
    Hidden (``_``/``.``-prefixed) files and directories are skipped,
    matching the paged walk (parity pytest-gated).

    The driver NEVER materializes leaf paths (round-12 verdict item
    5: the previous form staged one (path, values) tuple per leaf
    before ``parallelize`` — the counts dict is ~10 MB at 10⁶
    leaves, but the staged path strings multiplied that constant
    ~50-100×). It walks partition-DIRECTORY levels only until the
    fan-out covers the cluster (≥ 4 × parallelism prefixes) and never
    past the second-to-last level; executors expand the remaining
    levels with chained flatMaps, one repartition balances the leaf
    population across tasks, and the driver receives exactly one
    (partition values, int) pair per non-empty leaf. Driver-retained
    bytes vs wall measured at 10⁵ leaves in scale_rehearsal.py."""
    from urllib.parse import unquote

    import pyarrow.fs as pafs

    fs, root = pafs.FileSystem.from_uri(path)
    sc = spark.sparkContext
    fanout_target = max(1, sc.defaultParallelism) * 4
    root_uri = path

    def expand(fs_, d: str, vals: tuple, col: str):
        for info in fs_.get_file_info(pafs.FileSelector(d)):
            name = info.base_name
            if info.type != pafs.FileType.Directory or name.startswith(
                ("_", ".")
            ):
                continue
            k, sep, v = name.partition("=")
            if sep and k == col and unquote(v) != (
                "__HIVE_DEFAULT_PARTITION__"
            ):
                yield (info.path, vals + (unquote(v),))

    # driver-side walk: stop as soon as the prefix set covers the
    # cluster, and never expand the final (leaf) level here
    level: list[tuple[str, tuple]] = [(root, ())]
    depth = 0
    while depth < len(partition_cols) - 1 and len(level) < fanout_target:
        level = [
            t
            for d, vals in level
            for t in expand(fs, d, vals, partition_cols[depth])
        ]
        depth += 1
        if not level:
            return {}
    remaining = list(partition_cols[depth:])

    def expand_level(col):
        def go(t):
            import pyarrow.fs as epafs

            efs, _ = epafs.FileSystem.from_uri(root_uri)
            d, vals = t
            return list(expand(efs, d, vals, col))

        return go

    def count_partition(it):
        import pyarrow.fs as epafs

        efs, _ = epafs.FileSystem.from_uri(root_uri)
        for leaf, vals in it:
            nf = 0
            for info in efs.get_file_info(epafs.FileSelector(leaf)):
                if info.type == epafs.FileType.File and not (
                    info.base_name.startswith(("_", "."))
                ):
                    nf += 1
            if nf:
                yield (vals, nf)

    n_tasks = max(1, min(len(level), fanout_target))
    rdd = sc.parallelize(level, n_tasks)
    for col in remaining:
        rdd = rdd.flatMap(expand_level(col))
    if remaining:
        # the leaf population only exists executor-side; one shuffle of
        # short path strings balances the per-leaf listing work across
        # the cluster regardless of how skewed the directory fan-out is
        rdd = rdd.repartition(fanout_target)
    return dict(rdd.mapPartitions(count_partition).collect())


def compact_partitioned_dataset(
    spark,
    path: str,
    partition_cols: list[str],
    *,
    max_files_per_partition: int = 1,
    files_per_partition: int = 1,
    split_col: str | None = None,
    listing: str = "distributed",
) -> dict:
    """Compact small files inside a hive-partitioned parquet dataset —
    the operational answer to what every ``batch_id``-partitioned
    ingest sink in this repo accumulates: one-file-per-task × many
    micro-batches = thousands of tiny files, and at 100 TB the scan
    planner pays per FILE (footer reads, task scheduling, open cost),
    not per byte.

    Shape (one bounded Spark job, no driver data):

    1. discover per-leaf file counts with a PAGED filesystem walk —
       ``FileSystem.listStatusIterator`` one directory at a time, so
       the driver holds one directory page plus one int per leaf,
       never the full file-path list (round-10 verdict item 5: the
       previous ``DataFrame.inputFiles()`` listing returned every
       file path to the driver — metadata-only, but at a 100 TB
       sink with millions of files the maintenance job's own listing
       became a driver-memory/latency ceiling). Partition values are
       parsed from the hive ``col=value`` directory names; no data
       is read;
    2. leaves with more than ``max_files_per_partition`` files are
       re-read with partition-pruning literal predicates (only those
       directories are scanned), hashed back together with
       ``repartition(partition_cols)`` so each leaf's rows land in one
       task, and rewritten with DYNAMIC partition overwrite — only the
       compacted leaves are replaced, each atomically at commit;
       untouched partitions are never read or written.

    ``files_per_partition > 1`` (with ``split_col`` naming a stable id
    column) spreads a big leaf over N files via a hash salt — use when
    one file per leaf would exceed a sane file size. Do not run
    concurrently with a writer into the same partitions (same contract
    as any dynamic-overwrite maintenance job); replayed ingest batches
    remain idempotent afterwards because their overwrite replaces the
    whole leaf either way. NULL-valued (``__HIVE_DEFAULT_PARTITION__``)
    leaves are left untouched. Returns
    ``{"partitions_compacted", "files_before", "files_after"}``."""
    if files_per_partition > 1 and split_col is None:
        raise ValueError("files_per_partition > 1 requires split_col")
    if files_per_partition < 1 or max_files_per_partition < 1:
        raise ValueError("file counts must be >= 1")
    # a run that spreads each leaf over files_per_partition files must
    # not re-target those leaves next run — floor the threshold so the
    # periodic job stays a no-op once compacted
    max_files_per_partition = max(max_files_per_partition, files_per_partition)

    if listing not in ("distributed", "paged"):
        raise ValueError(f"listing must be 'distributed' or 'paged', got {listing!r}")
    df = spark.read.parquet(path)
    if listing == "distributed":
        # pyarrow.fs.FileSystem.from_uri covers local/HDFS/S3 but not
        # every JVM Hadoop filesystem (custom schemes; HDFS needs
        # libhdfs): fall back to the paged JVM walk instead of failing
        # a maintenance job on a store only the JVM can list (ADVICE
        # r12). ValueError/OSError/ArrowException are how from_uri
        # surfaces an unresolvable scheme.
        def leaf_counts(spark, path, partition_cols):
            try:
                return distributed_leaf_counts(spark, path, partition_cols)
            except (ValueError, OSError, NotImplementedError) as e:
                import warnings

                warnings.warn(
                    f"distributed listing unavailable for {path!r} "
                    f"({e!r}); falling back to the paged JVM walk",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return paged_leaf_counts(spark, path, partition_cols)

    else:
        leaf_counts = paged_leaf_counts
    counts = leaf_counts(spark, path, partition_cols)
    targets = [
        k for k, n in counts.items() if n > max_files_per_partition
    ]
    if not targets:
        return {
            "partitions_compacted": 0,
            "files_before": sum(counts.values()),
            "files_after": sum(counts.values()),
        }
    # literal equality against the typed partition column — Spark
    # coerces the string literal to the column type, so the predicate
    # stays partition-pruning-eligible (no cast on the COLUMN side)
    pred = None
    for key in targets:
        leaf = None
        for c, v in zip(partition_cols, key):
            eq = F.col(c) == F.lit(v)
            leaf = eq if leaf is None else (leaf & eq)
        pred = leaf if pred is None else (pred | leaf)
    selected = df.where(pred)
    if files_per_partition > 1:
        salt = F.pmod(
            F.xxhash64(F.col(split_col)), F.lit(files_per_partition)
        )
        packed = selected.repartition(
            max(len(targets) * files_per_partition, 1),
            *partition_cols,
            salt,
        )
    else:
        packed = selected.repartition(
            max(len(targets), 1), *partition_cols
        )
    (
        packed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    # same leaf filter as files_before (NULL/non-conforming leaves
    # excluded from BOTH) so the two counts are diffable
    return {
        "partitions_compacted": len(targets),
        "files_before": sum(counts.values()),
        "files_after": sum(
            leaf_counts(spark, path, partition_cols).values()
        ),
    }
