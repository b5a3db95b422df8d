"""Zero-extra-pass telemetry (operators/observability)."""

from __future__ import annotations

import shutil

import pytest
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


def test_cap_buckets_exemption_telemetry_planted_cohort(spark):
    """cap_buckets' capped_rows/capped_buckets metrics report EXACTLY
    the planted boilerplate cohort's banded mass (round-9 verdict
    item: the recall cost of every cap was invisible at runtime).
    Delivery is an eager materialization of the tiny oversized list —
    see the cap_buckets docstring for why lazy CollectMetrics under a
    broadcast subtree is unreliable under AQE."""
    from pyspark.sql import Observation

    from mapreduce_implementation_spark.operators import dedup as dd

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank today"
    )
    far = (
        "completely different content about spark engines and parquet "
        "files with nothing shared"
    )
    cohort_n, bands = 12, 4
    rows = [(i, base) for i in range(cohort_n)] + [(100, far)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    obs = Observation("cap")
    out = dd.minhash_near_dup_pairs(
        df, "doc_id", "text", k=16, bands=bands, rows=4, threshold=0.5,
        max_bucket=5, cap_observation=obs,
    )
    assert out.count() == 0  # the cohort square is dropped
    got = obs.get
    # identical docs agree on every band: `bands` oversized buckets,
    # each holding the full cohort's banded rows
    assert got["capped_buckets"] == bands
    assert got["capped_rows"] == cohort_n * bands


def _exempt_fixture(spark):
    import math

    def unit(angle_deg: float) -> list[float]:
        a = math.radians(angle_deg)
        return [math.cos(a), math.sin(a)]

    # 7-member cohort at 0 deg (oversized at max_cluster=4), a
    # mineable pair near 90 deg
    rows = {i: unit(0) for i in range(1, 8)}
    rows[20], rows[21] = unit(90), unit(90.5)
    vecs = spark.createDataFrame(
        [(i, v) for i, v in rows.items()],
        "vec_id int, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, unit(0)), (1, unit(90))],
        "centroid_id int, centroid_emb array<double>",
    )
    return vecs, cents


def test_semantic_dedup_exemption_telemetry(spark):
    """Under exempt_strategy="keep", exempted_rows/exempted_clusters
    report the mega-cluster mass the max_cluster guard retains
    unmined."""
    from pyspark.sql import Observation

    from mapreduce_implementation_spark.operators.semantic import (
        semantic_dedup,
    )

    vecs, cents = _exempt_fixture(spark)
    obs = Observation("exempt")
    out = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, max_cluster=4,
        exempt_strategy="keep", exemption_observation=obs,
    ).toPandas()
    # exempted cohort: every member kept; mineable cluster: one kept
    assert sorted(out[out["keep"] == 1]["vec_id"]) == [1, 2, 3, 4, 5, 6, 7, 20]
    got = obs.get
    assert got["exempted_clusters"] == 1
    assert got["exempted_rows"] == 7


def test_semantic_dedup_slice_telemetry(spark):
    """Under exempt_strategy="slice" (default) the oversized mass is
    MINED: telemetry reports it as sliced_*, exempted_* report 0, and
    the cohort actually collapses to its min id."""
    from pyspark.sql import Observation

    from mapreduce_implementation_spark.operators.semantic import (
        semantic_dedup,
    )

    vecs, cents = _exempt_fixture(spark)
    obs = Observation("slice")
    out = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, max_cluster=4,
        exemption_observation=obs,
    ).toPandas()
    assert sorted(out[out["keep"] == 1]["vec_id"]) == [1, 20]
    got = obs.get
    assert got["exempted_clusters"] == 0 and got["exempted_rows"] == 0
    assert got["sliced_clusters"] == 1 and got["sliced_rows"] == 7


def test_observation_with_uncapped_miner_raises(spark):
    """cap/exemption observations on an uncapped run would never
    attach (obs.get would hang/raise later) — refused at call time."""
    from pyspark.sql import Observation

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.operators.semantic import (
        semantic_dedup,
    )

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="finite max_bucket"):
        dd.minhash_near_dup_pairs(
            df, "doc_id", "text", max_bucket=None,
            cap_observation=Observation("x"),
        )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id int, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "centroid_id int, centroid_emb array<double>"
    )
    with pytest.raises(ValueError, match="finite max_cluster"):
        semantic_dedup(
            vecs, centroids=cents, max_cluster=None,
            exemption_observation=Observation("y"),
        )
