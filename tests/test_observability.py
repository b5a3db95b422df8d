"""Zero-extra-pass telemetry (operators/observability)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.observability import (
    observe_corpus,
    observe_stream,
)

SF = "/root/testdata/sf0.001"


def test_batch_observation_matches_direct_aggregates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    observed, obs = observe_corpus(docs)
    assert "CollectMetrics" in observed._jdf.queryExecution().optimizedPlan().toString()
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get

    from mapreduce_implementation_spark.functions.textstats import (
        token_count,
    )

    want = docs.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_if(F.col("text").isNull()).alias("null_text"),
        F.count_if(F.length("text") == 0).alias("empty_text"),
        F.sum(F.coalesce(token_count("text"), F.lit(0))).alias(
            "total_tokens"
        ),
        F.min(F.length("text")).alias("min_len"),
        F.max(F.length("text")).alias("max_len"),
    ).collect()[0]
    for k in ("rows", "null_text", "empty_text", "total_tokens",
              "min_len", "max_len"):
        assert got[k] == want[k], (k, got[k], want[k])


def test_batch_observation_with_extra_metric(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    observed, obs = observe_corpus(
        docs,
        name="q",
        extra_metrics=[F.count_if(F.col("lang") == "en").alias("n_en")],
    )
    observed.write.format("noop").mode("overwrite").save()
    n_en = docs.where(F.col("lang") == "en").count()
    assert obs.get["n_en"] == n_en


def test_streaming_per_batch_metrics_sum_to_total(spark):
    from mapreduce_implementation_spark.streaming.fixtures import (
        stage_file_stream,
    )
    from mapreduce_implementation_spark.streaming.queries import (
        run_available_now,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    splits = [
        docs.where(F.col("doc_id") % 3 == i).select("doc_id", "text")
        for i in range(3)
    ]
    stream_dir = stage_file_stream(splits, prefix="obs_stream_")
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        out = observe_stream(stream.select("doc_id", "text"), name="ingest")
        q = run_available_now(out, "obs_sink", output_mode="append")
        per_batch = [
            p["observedMetrics"]["ingest"]
            for p in q.recentProgress
            if "ingest" in p.get("observedMetrics", {})
        ]
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
    assert per_batch, "no observed metrics in any batch progress"
    assert sum(m["rows"] for m in per_batch) == docs.count()
    assert all(m["null_text"] == 0 for m in per_batch)
