"""Interchange formats beyond parquet: ORC, CSV, JSON — write and read
back with the schema PRESERVED, which is the part naive usage gets
wrong (text formats are typeless; schema inference silently turns
dates into strings and longs into doubles).

Scale notes: ORC is columnar like parquet (predicate pushdown, column
pruning — a peer archival format). CSV/JSON are row formats for
interchange with external producers/consumers: no pushdown beyond
partition pruning, ~3-10× the scan cost — fine as ingest/egress edges,
wrong as the lake format. All writers emit one file per partition, so
output parallelism follows the upstream partitioning unchanged.

The reference's only formats are plain text in and per-reducer text
out (/root/reference/Worker.cc:123-141,267-274), both covered by
sources/text_source.py and sources/sinks.py; this module is the
extension-layer interchange surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

FORMATS = ("parquet", "orc", "csv", "json")

# options that make Spark's CSV round-trip-safe for free text: quote
# everything hairy, escape quotes with doubled quotes (RFC 4180), keep
# multi-line fields parseable on read, and — critically — write NULL as
# an explicit marker so it stays distinguishable from the empty string
# (with Spark's defaults both serialize to nothing and read back as
# NULL, silently mutating text='' rows)
_CSV_OPTS = {
    "header": "true",
    "escape": '"',
    "multiLine": "true",
    "nullValue": "\\N",
}


def _check_csv_schema(schema: StructType) -> None:
    for f in schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            raise TypeError(
                f"CSV cannot represent nested column {f.name!r} "
                f"({f.dataType}); use json/orc/parquet for nested data"
            )


def write_table(
    df: DataFrame, path: str, fmt: str, mode: str = "overwrite"
) -> None:
    """Write ``df`` at ``path`` in ``fmt`` (one file per partition)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if fmt == "csv":
        _check_csv_schema(df.schema)
    w = df.write.mode(mode)
    if fmt == "csv":
        for k, v in _CSV_OPTS.items():
            w = w.option(k, v)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``.

    ``schema`` is REQUIRED for csv/json: text formats carry no types,
    and inference is both a second full scan and silently lossy (dates
    → strings, longs → doubles on overflow). Pass the producing
    DataFrame's ``.schema``. Optional for orc/parquet (self-describing;
    passing one pins the read against file-level drift)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    r = spark.read
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} carries no types — pass the schema explicitly "
                "(inference is a second scan and silently lossy)"
            )
        r = r.schema(schema)
        if fmt == "csv":
            for k, v in _CSV_OPTS.items():
                r = r.option(k, v)
    elif schema is not None:
        r = r.schema(schema)
    return r.format(fmt).load(path)
