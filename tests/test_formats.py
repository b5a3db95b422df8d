"""Round-trip fidelity of the interchange formats: every value and
every dtype must survive write→read for each (table, format) pair the
format can represent."""

from __future__ import annotations

import pytest

from mapreduce_implementation_spark.sources.catalog import load_table
from mapreduce_implementation_spark.sources.formats import (
    read_table,
    write_table,
)

SF = "/root/testdata/sf0.001"

CASES = [
    ("orders", "csv"),    # dates, doubles, longs, strings — flat
    ("orders", "json"),
    ("orders", "orc"),
    ("documents", "csv"),  # free text incl. quoting hazards
    ("embeddings", "json"),  # array<float> — nested, json/orc only
    ("embeddings", "orc"),
    ("events", "orc"),     # timestamp column
]


@pytest.mark.parametrize("table,fmt", CASES, ids=lambda p: str(p))
def test_round_trip_exact(spark, tmp_path, table, fmt):
    src = load_table(spark, SF, table)
    path = str(tmp_path / f"{table}_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # exact multiset equality both directions
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0


def test_csv_rejects_nested_columns(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(TypeError, match="nested"):
        write_table(emb, "/tmp/never-written", "csv")


def test_text_formats_require_schema(spark, tmp_path):
    src = load_table(spark, SF, "nation")
    for fmt in ("csv", "json"):
        p = str(tmp_path / fmt)
        write_table(src, p, fmt)
        with pytest.raises(ValueError, match="schema"):
            read_table(spark, p, fmt)


def test_unknown_format_rejected(spark):
    src = load_table(spark, SF, "nation")
    with pytest.raises(ValueError, match="unknown format"):
        write_table(src, "/tmp/never", "avro")


def test_csv_preserves_empty_string_vs_null(spark, tmp_path):
    """Spark's CSV defaults collapse '' and NULL into NULL on read;
    the nullValue/emptyValue options must keep them distinct."""
    src = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x")], "id long, text string"
    )
    path = str(tmp_path / "csv_nulls")
    write_table(src, path, "csv")
    back = read_table(spark, path, "csv", schema=src.schema)
    got = {r.id: r.text for r in back.collect()}
    assert got == {1: "", 2: None, 3: "x"}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A real lake accretes columns over time: files written before a
    column existed must read back with NULL backfill under mergeSchema,
    and the merged schema must be the union in a deterministic shape."""
    from pyspark.sql import functions as F

    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "evolving")
    v1.write.parquet(path + "/batch=1")
    v2.write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert {f.name for f in merged.schema} == {"doc_id", "text", "lang", "batch"}
    rows = {
        (r.doc_id, r.text, r.lang)
        for r in merged.select("doc_id", "text", "lang").collect()
    }
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", "en")}
    # pre-evolution files contribute NULLs that filters treat correctly
    assert merged.where(F.col("lang").isNull()).count() == 2
