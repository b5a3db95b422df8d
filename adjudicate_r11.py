#!/usr/bin/env python
"""Round-11 adjudication (round-10 verdict item 4): decompose
dedup_clusters' residual over its round-8 value with the same
interleaved A/B protocol minhash got in round 10 — capped (production
DEFAULT_MAX_BUCKET=1000, window strategy inside the self-join) vs
uncapped pair mining, each feeding the SAME connected-components
stage, min-of-3 interleaved so host drift hits both arms equally, with
calibration rows bracketing the run."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_implementation_spark import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mris-adjudicate-r11")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.plans.dedup_queries import (
        BANDS, K, ROWS, _signature_table,
    )
    from mapreduce_implementation_spark.sources.catalog import load_table

    materialize(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))
    materialize(
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        .groupBy("n_regionkey").count()
    )

    def calib() -> list[float]:
        out = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(
                spark.range(0, 100_000_000, 1, 32).select(
                    F.sum((F.col("id") % 7) * 3 + 1).alias("s")
                )
            )
            out.append(round(time.perf_counter() - t0, 3))
        return out

    def clusters_variant(max_bucket):
        docs = load_table(spark, sf_dir, "documents")
        sigs = _signature_table(spark, sf_dir, docs)
        pairs = dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS,
            rows=ROWS, threshold=0.5, signatures=sigs,
            max_bucket=max_bucket,
        )
        return dd.connected_components(pairs, "doc_a", "doc_b")

    def pairs_only_variant(max_bucket):
        docs = load_table(spark, sf_dir, "documents")
        sigs = _signature_table(spark, sf_dir, docs)
        return dd.minhash_near_dup_pairs(
            docs, "doc_id", "text", shingle_n=3, k=K, bands=BANDS,
            rows=ROWS, threshold=0.5, signatures=sigs,
            max_bucket=max_bucket,
        )

    out: dict = {"sf_dir": sf_dir, "calibration_before": calib()}
    arms = {
        "clusters_capped_1000": lambda: clusters_variant(1000),
        "clusters_uncapped": lambda: clusters_variant(None),
        "pairs_capped_1000": lambda: pairs_only_variant(1000),
        "pairs_uncapped": lambda: pairs_only_variant(None),
    }
    runs: dict[str, list[float]] = {name: [] for name in arms}
    # one untimed warm pass of the first arm's plan shape (the bench
    # first-slot lesson), then 3 interleaved rounds
    materialize(arms["clusters_capped_1000"]())
    for _ in range(3):
        for name, build in arms.items():
            t0 = time.perf_counter()
            materialize(build())
            runs[name].append(round(time.perf_counter() - t0, 3))
    out["runs"] = runs
    out["min"] = {n: min(v) for n, v in runs.items()}
    # the decomposition: CC-stage cost per arm = clusters - pairs
    out["cc_stage_min_delta"] = {
        "capped": round(
            out["min"]["clusters_capped_1000"] - out["min"]["pairs_capped_1000"], 3
        ),
        "uncapped": round(
            out["min"]["clusters_uncapped"] - out["min"]["pairs_uncapped"], 3
        ),
    }
    out["calibration_after"] = calib()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
