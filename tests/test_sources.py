"""Source/sink format surface: JSONL and CSV roundtrips (Spark
built-ins are the engine's connectors; these tests pin the semantics we
rely on — schema fidelity, nested JSON props, header handling)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_with_nested_props(spark, tmp_path):
    events = (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            F.col("ts").cast("long").alias("ts_s"),
            "user_id",
            "event_type",
            "value",
            F.from_json(
                "props", MapType(StringType(), StringType())
            ).alias("props"),
        )
        .limit(200)
    )
    path = str(tmp_path / "events.jsonl")
    events.write.mode("overwrite").json(path)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_s", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", MapType(StringType(), StringType())),
        ]
    )
    back = spark.read.schema(schema).json(path)
    assert back.count() == events.count()
    a = {r.event_id: (r.ts_s, r.user_id, r.event_type, r.value, dict(r.props or {}))
         for r in events.collect()}
    b = {r.event_id: (r.ts_s, r.user_id, r.event_type, r.value, dict(r.props or {}))
         for r in back.collect()}
    assert a == b


def test_csv_roundtrip_with_header(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation.csv")
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    a = sorted((r.n_nationkey, r.n_name) for r in nation.collect())
    b = sorted((r.n_nationkey, r.n_name) for r in back.collect())
    assert a == b


def test_register_views_enables_plain_sql(spark):
    """The SQL surface: after register_views, any ANSI query runs via
    spark.sql against the catalog — the API a SQL-first user of the
    engine would reach for."""
    from mapreduce_implementation_spark.sources.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    out = spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_customers DESC, n_name LIMIT 3
        """
    ).collect()
    assert len(out) == 3 and all(r.n_customers >= 1 for r in out)
    # events view got the ns-timestamp workaround: ts must be usable
    mx = spark.sql("SELECT MAX(ts) AS m FROM events").collect()[0].m
    assert mx is not None
